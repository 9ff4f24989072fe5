package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class UnigramSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def mapOf(ps: (String, Double)*): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    ps.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  test("viterbi picks the max-probability segmentation (hand-computed)") {
    // "abc": a+bc = -1 + -1.5 = -2.5 beats ab+c = -1.2 + -2 = -3.2 and
    // a+b+c = -1 -1.8 -2 = -4.8
    val m = mapOf("a" -> -1.0, "b" -> -1.8, "c" -> -2.0,
      "ab" -> -1.2, "bc" -> -1.5)
    assert(Unigram.viterbi("abc", m, 6).toSeq == Seq("a", "bc"))
  }

  test("viterbi ties prefer the longer final piece; uncoverable words return null") {
    // both segmentations score -2.0: a+b vs ab — the longer final piece wins
    val m = mapOf("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(Unigram.viterbi("ab", m, 6).toSeq == Seq("ab"))
    assert(Unigram.viterbi("ax", m, 6) == null) // 'x' not in the model
  }

  test("train: every trainable word re-segments with no UNK, deterministic across runs") {
    val words = Bpe.wordCounts(
      graft.etl.Tables.documents(spark, GraftSpark.Sf0001), "text")
    def run() = Unigram.train(words, maxPieceLen = 6, maxVocab = 512,
      emRounds = 2, seedSize = 4096, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    val a = run()
    assert(a == run(), "EM training must be deterministic")
    // single-char coverage: every character of every word is in the vocab
    val pieces = a.map(_._1).toSet
    val chars = words.collect().flatMap(_.getString(0).toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // model probabilities are a (sub-)distribution over used pieces
    val probMass = a.map(x => math.exp(x._3)).sum
    assert(probMass > 0.5 && probMass < 1.5, s"degenerate mass $probMass")
  }

  test("native unigram_encode equals a driver-side Viterbi recomputation") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val model = Unigram.train(Bpe.wordCounts(docs, "text"),
        maxPieceLen = 6, maxVocab = 512, emRounds = 2,
        seedSize = 4096, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toSeq
    val got = docs.limit(20)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.UnigramFunctions.unigram_encode(
          org.apache.spark.sql.functions.col("text"), model).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val m = mapOf(model: _*)
    val want = docs.limit(20).select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty).flatMap { w =>
        val seg = Unigram.viterbi(w, m, 6)
        if (seg == null) Array(Unigram.Unk) else seg
      }.toSeq
      r.getLong(0) -> toks
    }.toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("persisted model round-trips byte-identically") {
    val words = Bpe.wordCounts(
      graft.etl.Tables.documents(spark, GraftSpark.Sf0001), "text")
    val trained = Unigram.train(words, maxPieceLen = 6, maxVocab = 512,
      emRounds = 2, seedSize = 4096, minCount = 2L)
    val dir = java.nio.file.Files.createTempDirectory("unigram_spec").toString
    Unigram.writeModel(trained, dir)
    val back = Unigram.readModel(spark, dir)
    val want = trained.orderBy("piece_id").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toSeq
    assert(back == want)
  }
}
