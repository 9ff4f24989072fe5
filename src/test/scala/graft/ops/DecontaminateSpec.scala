package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("t")
    df.select(Decontaminate.wordNgrams(col("t"), n).as("g"))
      .head().getSeq[String](0)
  }

  test("wordNgrams: basic sliding window") {
    assert(grams("a b c d", 2) == Seq("a b", "b c", "c d"))
    assert(grams("a b c d", 4) == Seq("a b c d"))
  }

  test("wordNgrams: repeated/leading/trailing whitespace yields no empty tokens") {
    assert(grams("  a   b\tc ", 2) == Seq("a b", "b c"))
    assert(grams(" a  ", 1) == Seq("a"))
  }

  test("wordNgrams: empty and whitespace-only text yield no grams") {
    assert(grams("", 1).isEmpty)
    assert(grams("   ", 1).isEmpty)
    assert(grams("\t \n", 3).isEmpty)
  }

  test("wordNgrams: documents shorter than n yield no grams") {
    assert(grams("a b", 3).isEmpty)
  }

  test("native WordNgrams agrees with the interpreted HOF on fixture docs (cross-check oracle)") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    for (n <- Seq(1, 3, 8)) {
      val diff = docs.select(
          Decontaminate.wordNgrams(col("text"), n).as("native"),
          Decontaminate.wordNgramsHof(col("text"), n).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.isEmpty, s"native/HOF n-gram mismatch at n=$n")
    }
    // whitespace-heavy synthetic edge cases through both paths
    val edge = Seq("", " ", "  a  ", "a\tb\nc", " \t x  y \r\n z ").toDF("text")
    for (n <- Seq(1, 2, 3, 4)) {
      val rows = edge.select(
          Decontaminate.wordNgrams(col("text"), n).as("native"),
          Decontaminate.wordNgramsHof(col("text"), n).as("hof"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    }
  }

  test("contaminationHits counts distinct shared grams per corpus doc") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick" + "quick brown"
      (2L, "a completely different document here"),
      (3L, "quick brown then the quick again")  // shares both grams too
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown cat")).toDF("doc_id", "text")
    val hits = Decontaminate.contaminationHits(corpus, bench, "doc_id", "text", 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((1L, 2L), (3L, 2L)))
  }

  test("decontaminate removes exactly the contaminated ids") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val bench = docs.filter(col("doc_id") % 25 === 0)
    val contaminated = Decontaminate
      .contaminationHits(docs, bench, "doc_id", "text", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.decontaminate(docs, bench, "doc_id", "text", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- contaminated)
    // the bench docs themselves are in the corpus, so they must be removed
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchIds.forall(contaminated.contains))
  }

  test("bench gram set is broadcast (no corpus-side shuffle for the probe)") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val bench = docs.filter(col("doc_id") % 25 === 0)
    val plan = Decontaminate.contaminationHits(docs, bench, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("contaminationGrams rows roll up exactly to contaminationHits counts") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val bench = docs.filter(col("doc_id") % 25 === 0)
    val grams = Decontaminate.contaminationGrams(docs, bench, "doc_id", "text", 8)
    val rolled = grams.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = Decontaminate.contaminationHits(docs, bench, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rolled == hits && hits.nonEmpty)
    // gram rows are distinct per (doc, gram)
    assert(grams.count() == grams.distinct().count())
  }

  test("semanticContamination flags exact copies, keeps the argmax bench id") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // exact copy of bench 100 AND bench 101
      (2L, Array(0.0f, 1.0f)),   // orthogonal to both → clean
      (3L, Array(0.96f, 0.28f))  // cos vs (1,0) ≈ 0.96 → contaminated
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Array(1.0f, 0.0f)),
      (101L, Array(1.0f, 0.0f))).toDF("bench_id", "embedding")
    val got = Decontaminate.semanticContamination(
        corpus, "vec_id", "embedding", bench, "bench_id", "embedding", 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 3L))
    // cosine tie between bench 100/101 → lowest bench id wins
    assert(got(1L) == (100L, 1.0))
    assert(got(3L)._1 == 100L && got(3L)._2 >= 0.95 && got(3L)._2 < 1.0)
  }

  test("bloomDecontaminate is bit-identical to exact decontaminate on fixture docs") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val exact = Decontaminate.decontaminate(docs, bench, "doc_id", "text", n = 5)
    val bloom = Decontaminate.bloomDecontaminate(docs, bench, "doc_id", "text", n = 5)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
    // sanity: the bench members ARE their own exact copies → removed
    val kept = bloom.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.exists(_ % 20 == 0))
    assert(kept.nonEmpty)
  }

  test("bloomDecontaminate: exact confirm survives an adversarially high fpp") {
    // fpp near 1 makes almost every corpus gram a Bloom candidate — the
    // exact confirm join must still produce the exact result
    val docs = Tables.documents(spark, GraftSpark.Sf0001).limit(100)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Decontaminate.decontaminate(docs, bench, "doc_id", "text", n = 3)
    val bloom = Decontaminate.bloomDecontaminate(docs, bench, "doc_id", "text", n = 3, fpp = 0.9)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
  }

  test("bloomDecontaminate: empty bench set returns the corpus unchanged") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val out = Decontaminate.bloomDecontaminate(
      docs, docs.filter(col("doc_id") < 0), "doc_id", "text", n = 8)
    assert(out.count() == docs.count())
  }

  test("semanticContamination broadcasts the bench side (corpus never shuffled wide)") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val bench = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + lit(1000000L)).as("bench_id"), col("embedding"))
    val q = Decontaminate.semanticContamination(
      emb, "vec_id", "embedding", bench, "bench_id", "embedding", 0.95)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    // every bench member is its own exact copy in the corpus → all flagged
    val flagged = q.select("vec_id").collect().map(_.getLong(0)).toSet
    val members = emb.filter(col("vec_id") % 25 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(members.subsetOf(flagged))
  }
}
