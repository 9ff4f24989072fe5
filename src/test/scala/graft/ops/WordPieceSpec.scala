package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.functions.WordPieceFunctions

class WordPieceSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("buildVocab: piece scores match hand-computed substring counts") {
    // corpus: "abc" x3, "bc" x2 -> e.g. piece 'bc' (word-initial in "bc",
    // internal '##bc' in "abc") scores split across the two forms
    val words = Seq(("abc", 3L), ("bc", 2L)).toDF("word", "n")
    val got = WordPiece.buildVocab(words, maxPieceLen = 3, maxVocab = 100, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("abc") == 3L)   // only word-initial full match
    assert(got("a") == 3L)
    assert(got("##bc") == 3L)  // internal in "abc" only
    assert(got("bc") == 2L)    // word-initial in "bc" only
    assert(got("##c") == 5L)   // internal in both words
    assert(got("b") == 2L)     // word-initial in "bc" only
  }

  test("buildVocab: minCount floor and maxVocab rank cut apply") {
    val words = Seq(("aa", 10L), ("b", 1L)).toDF("word", "n")
    val all = WordPiece.buildVocab(words, 2, maxVocab = 2, minCount = 2L)
      .collect().map(_.getString(0)).toSeq
    assert(all.length == 2)
    assert(!all.contains("b")) // below minCount
  }

  test("encode: greedy longest match with ## continuations (BERT shape)") {
    val vocab = Seq("un", "##aff", "##able", "##a", "##f", "##b", "##l", "##e", "u", "##n")
    val got = Seq("unaffable").toDF("text")
      .select(WordPieceFunctions.wordpiece_encode(col("text"), vocab, maxPieceLen = 6))
      .head().getSeq[String](0)
    assert(got == Seq("un", "##aff", "##able"))
  }

  test("encode: unmatchable position makes the WHOLE word [UNK]; empty/null safe") {
    val vocab = Seq("ab", "##c")
    val df = Seq(Some("abc abz"), Some(""), None).toDF("text")
    val got = df.select(
      WordPieceFunctions.wordpiece_encode(col("text"), vocab, 6).as("t")).collect()
    assert(got(0).getSeq[String](0) == Seq("ab", "##c", "[UNK]")) // abz: z unmatchable
    assert(got(1).getSeq[String](0).isEmpty)
    assert(got(2).isNullAt(0))
  }

  test("encode matches a driver-side greedy recomputation on the fixture vocab") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001).limit(50)
    val vocab = WordPiece.buildVocab(Bpe.wordCounts(docs, "text"),
      maxPieceLen = 6, maxVocab = 512, minCount = 2L)
      .collect().map(_.getString(0)).toSeq
    val vs = vocab.toSet
    def ref(text: String): Seq[String] =
      text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        val toks = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0; var ok = true
        while (ok && i < w.length) {
          val l = (math.min(6, w.length - i) to 1 by -1).find { ll =>
            val sub = w.substring(i, i + ll)
            vs.contains(if (i == 0) sub else "##" + sub)
          }
          l match {
            case Some(ll) =>
              toks += (if (i == 0) w.substring(i, i + ll) else "##" + w.substring(i, i + ll))
              i += ll
            case None => ok = false
          }
        }
        if (ok) toks.toSeq else Seq(WordPiece.Unk)
      }
    val rows = docs.select(col("doc_id"), col("text"),
        WordPieceFunctions.wordpiece_encode(col("text"), vocab, 6).as("toks"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](2) == ref(r.getString(1)), s"doc ${r.getLong(0)}")
    }
  }
}
