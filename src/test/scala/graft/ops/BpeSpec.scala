package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.functions.BpeFunctions

class BpeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // Sennrich's worked example shape: {low ×5, lower ×2, newest ×6, widest ×3}
  private def corpus = Seq(
    ("low " * 5).trim, ("lower " * 2).trim,
    ("newest " * 6).trim, ("widest " * 3).trim).toDF("text")

  test("hand-computed merges on the Sennrich corpus") {
    val wc = Bpe.wordCounts(corpus, "text")
    // word counts first: the one corpus pass
    assert(wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
    val merges = Bpe.train(wc, numMerges = 4, minCount = 2)
    // pair counts, round 1: (e,s) 9, (s,t) 9, (t,</w>) 9, (w,e) 8(newest)+...
    // tie at 9 broken lexicographically: (e,s) < (s,t) < (t,</w>)
    assert(merges(0) == Bpe.Merge(0, "e", "s"))
    // round 2: (es,t) now 9, (t,</w>) 9 → 'es' < 't'
    assert(merges(1) == Bpe.Merge(1, "es", "t"))
    // round 3: (est,</w>) 9 is the unique max
    assert(merges(2) == Bpe.Merge(2, "est", "</w>"))
    // round 4: (l,o) 7 (low+lower) beats (n,e) 6, (w,i) 3, (w,e)...
    assert(merges(3) == Bpe.Merge(3, "l", "o"))
  }

  test("driver and distributed paths produce identical merges") {
    val wc = Bpe.wordCounts(corpus, "text")
    val driver = Bpe.train(wc, numMerges = 8, minCount = 1)
    val dist = Bpe.train(wc, numMerges = 8, minCount = 1, collectThreshold = 0)
    assert(driver == dist)
    // and on real data
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001).limit(60)
    val wc2 = Bpe.wordCounts(docs, "text")
    val d2 = Bpe.train(wc2, numMerges = 12, minCount = 2)
    val x2 = Bpe.train(wc2, numMerges = 12, minCount = 2, collectThreshold = 0)
    assert(d2 == x2 && d2.size == 12)
  }

  test("minCount floor stops training early") {
    val wc = Bpe.wordCounts(Seq("ab ab cd").toDF("text"), "text")
    // (a,b)+eow pairs occur 2x for 'ab'; 'cd' pairs occur once
    val merges = Bpe.train(wc, numMerges = 50, minCount = 2)
    assert(merges.nonEmpty && merges.size < 50)
    // with minCount=1 it keeps merging until words are single symbols
    val all = Bpe.train(wc, numMerges = 50, minCount = 1)
    assert(all.size > merges.size && all.size < 50)
  }

  test("encode replays training: training words segment to their final training state") {
    val wc = Bpe.wordCounts(corpus, "text")
    val merges = Bpe.train(wc, numMerges = 6, minCount = 1)
    val enc = corpus.select(col("text"),
      BpeFunctions.bpe_encode(col("text"), merges).as("toks")).collect()
    // after (e,s),(es,t),(est,</w>) merges: 'newest' ends in 'est</w>'
    val byText = enc.map(r => r.getString(0).split(" ").head -> r.getSeq[String](1)).toMap
    assert(byText("newest").containsSlice(Seq("est</w>")) ||
      byText("newest").exists(_.endsWith("</w>")))
    // token concatenation reconstructs each word + sentinel (lossless)
    enc.foreach { r =>
      val words = r.getString(0).split(" ")
      val rebuilt = r.getSeq[String](1).mkString("")
        .split(java.util.regex.Pattern.quote(Bpe.EndOfWord)).filter(_.nonEmpty)
      assert(rebuilt.toSeq == words.toSeq, s"lossless round-trip for '${r.getString(0)}'")
    }
    // encoding a training word reproduces the exact training segmentation:
    // re-derive the final training state on the driver
    var state = wc.collect().map { r =>
      (r.getString(0), r.getString(0).map(_.toString).toArray :+ Bpe.EndOfWord)
    }.toMap
    merges.foreach { m =>
      state = state.view.mapValues(Bpe.applyMerge(_, m.lhs, m.rhs)).toMap
    }
    val encWord = Seq("low", "lower", "newest", "widest").toDF("text")
      .select(col("text"), BpeFunctions.bpe_encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    state.foreach { case (w, syms) =>
      assert(encWord(w) == syms.toSeq, s"encode('$w') != training state")
    }
  }

  test("encode: multi-word docs, empty text, null, oov chars pass through") {
    val merges = Seq(Bpe.Merge(0, "a", "b"), Bpe.Merge(1, "ab", "</w>"))
    val df = Seq(Some("ab ab xyz"), Some(""), None).toDF("text")
    val got = df.select(BpeFunctions.bpe_encode(col("text"), merges).as("t")).collect()
    assert(got(0).getSeq[String](0) ==
      Seq("ab</w>", "ab</w>", "x", "y", "z", "</w>"))
    assert(got(1).getSeq[String](0).isEmpty)
    assert(got(2).isNullAt(0))
  }

  test("writeMerges/readMerges round-trips the trained model in order") {
    val docs = Seq("ab ab ab cd cd", "ab cd ab").toDF("text")
    val merges = Bpe.train(Bpe.wordCounts(docs, "text"), numMerges = 5, minCount = 1)
    val dir = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    Bpe.writeMerges(spark, merges, dir)
    val back = Bpe.readMerges(spark, dir)
    assert(back == merges)
    // encode from the artifact equals encode from the in-memory model
    val a = docs.select(BpeFunctions.bpe_encode(col("text"), merges)).collect().toSeq
    val b = docs.select(BpeFunctions.bpe_encode(col("text"), back)).collect().toSeq
    assert(a == b)
  }
}
