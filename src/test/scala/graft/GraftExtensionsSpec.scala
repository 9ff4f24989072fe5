package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Tables
import graft.functions.VectorFunctions

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("graft_dot is callable from SQL and matches the Column API") {
    Tables.embeddings(spark, GraftSpark.Sf0001).limit(20).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql("SELECT graft_dot(embedding, embedding) AS d FROM emb_ext ORDER BY vec_id")
      .collect().map(_.getDouble(0))
    val viaApi = spark.table("emb_ext").orderBy("vec_id")
      .select(VectorFunctions.vec_dot(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_simhash64 / graft_shingle_hash / graft_minhash_sig from SQL") {
    val r = spark.sql(
      """SELECT graft_simhash64(split('a b c', ' ')) AS sh,
        |       graft_shingle_hash(split('a b c d', ' '), 2) AS sg,
        |       graft_minhash_sig(split('a b c', ' '), 4) AS mh""".stripMargin).head()
    assert(r.getSeq[Long](1).length == 3)
    assert(r.getSeq[Long](2).length == 4)
  }

  test("graft_lang_id / graft_stopword_count from SQL match the Column API") {
    val r = spark.sql(
      """SELECT graft_lang_id(split('the cat and the dog is here', ' ')) AS lang,
        |       graft_stopword_count(split('the cat and the dog', ' '),
        |                            array('the', 'and')) AS n""".stripMargin).head()
    assert(r.getString(0) == "en")
    assert(r.getInt(1) == 3)
  }

  test("graft_lsh_sig from SQL matches the Column API") {
    Tables.embeddings(spark, GraftSpark.Sf0001).limit(20).createOrReplaceTempView("emb_lsh")
    val viaSql = spark.sql("SELECT graft_lsh_sig(embedding, 8) AS s FROM emb_lsh ORDER BY vec_id")
      .collect().map(_.getLong(0))
    val viaApi = spark.table("emb_lsh").orderBy("vec_id")
      .select(VectorFunctions.lsh_signature(col("embedding"), 8))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_word_ngrams / graft_intersect_count_sorted from SQL match the Column APIs") {
    val r = spark.sql(
      """SELECT graft_word_ngrams(' a  b c ', 2) AS g,
        |       graft_intersect_count_sorted(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getInt(1) == 2)
  }

  test("SQL builder arity/foldability errors are proper AnalysisExceptions, not asserts") {
    import org.apache.spark.sql.AnalysisException
    // wrong arity: WRONG_NUM_ARGS has subclasses — the bare class name used
    // to trip the formatter's assertion and surface a raw AssertionError
    val arity = intercept[AnalysisException] {
      spark.sql("SELECT graft_word_ngrams('a b c')").head()
    }
    assert(arity.getCondition.startsWith("WRONG_NUM_ARGS"))
    assert(arity.getMessage.contains("graft_word_ngrams"))
    // non-literal n: must say which parameter, not throw ClassCastException
    Tables.documents(spark, GraftSpark.Sf0001).limit(5)
      .select(col("doc_id").cast("int").as("doc_id"), col("text"))
      .createOrReplaceTempView("doc_ext_v")
    val fold = intercept[AnalysisException] {
      spark.sql("SELECT graft_word_ngrams(text, doc_id) FROM doc_ext_v").head()
    }
    assert(fold.getCondition == "NON_FOLDABLE_ARGUMENT")
    // non-INT literal (2L)
    val typed = intercept[AnalysisException] {
      spark.sql("SELECT graft_word_ngrams('a b c', 2L)").head()
    }
    assert(typed.getCondition == "NON_FOLDABLE_ARGUMENT")
  }

  test("tokenizer encoders are callable from SQL with literal models") {
    // WordPiece: 'un' + '##done' segments; unseen word -> [UNK]
    val wp = spark.sql(
      "SELECT graft_wordpiece_encode('undone zzz', array('un', '##done', 'z'), 6) AS t")
      .head().getSeq[String](0)
    assert(wp == Seq("un", "##done", "[UNK]"))
    // Unigram: 'ab' (one piece, -2.0) beats a+b (-1.5-1.6); decimal
    // literals (DECIMAL-typed in SQL) are accepted as logprobs
    val ug = spark.sql(
      "SELECT graft_unigram_encode('ab ax', array('a', 'b', 'ab'), " +
        "array(-1.5, -1.6, -2.0), 6) AS t")
      .head().getSeq[String](0)
    assert(ug == Seq("ab", "[UNK]")) // 'x' uncoverable -> whole-word UNK
    // BPE: merges as rank-ordered 'lhs rhs' literals, matching the API
    val docs = Tables.documents(spark, GraftSpark.Sf0001).limit(10)
    val merges = graft.ops.Bpe.train(
      graft.ops.Bpe.wordCounts(docs, "text"), numMerges = 10, minCount = 2)
    val lits = merges.sortBy(_.rank)
      .map(m => s"'${m.lhs} ${m.rhs}'").mkString(", ")
    docs.createOrReplaceTempView("doc_bpe_v")
    val viaSql = spark.sql(
      s"SELECT graft_bpe_encode(text, array($lits)) AS t FROM doc_bpe_v ORDER BY doc_id")
      .collect().map(_.getSeq[String](0))
    val viaApi = docs.orderBy("doc_id")
      .select(graft.functions.BpeFunctions.bpe_encode(col("text"), merges))
      .collect().map(_.getSeq[String](0))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_mmr_select from SQL matches the Column API (DECIMAL lambda accepted)") {
    // candidates: 10 ≈ 11 (near-dup), 12 orthogonal — MMR keeps diversity
    val sql = spark.sql(
      "SELECT graft_mmr_select(array(" +
        "named_struct('id', 10L, 'sim', 0.90D, 'vec', array(1F, 0F, 0F)), " +
        "named_struct('id', 11L, 'sim', 0.89D, 'vec', array(0.99F, 0.01F, 0F)), " +
        "named_struct('id', 12L, 'sim', 0.50D, 'vec', array(0F, 1F, 0F))), 0.7, 3) AS s")
      .select(explode(col("s")).as("e")).select("e.id", "e.mmr")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql.map(_._1) == Seq(10L, 12L, 11L))
    import spark.implicits._
    val api = Seq(Tuple1(Seq((10L, 0.90, Array(1f, 0f, 0f)),
        (11L, 0.89, Array(0.99f, 0.01f, 0f)), (12L, 0.50, Array(0f, 1f, 0f)))))
      .toDF("cands")
      .select(explode(graft.functions.MmrFunctions.mmr_select(col("cands"), 0.7, 3)).as("e"))
      .select("e.id", "e.mmr")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == api)
  }
}
