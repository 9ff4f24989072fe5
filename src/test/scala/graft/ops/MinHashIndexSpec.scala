package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class MinHashIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def docs = Tables.documents(spark, GraftSpark.Sf0001)

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"), r.getAs[Double]("jaccard"))

  test("build -> write -> read -> query equals build -> query exactly") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + lit(5000000L))
    val built = MinHashIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash_idx").toString
    MinHashIndex.write(built, dir)
    val loaded = MinHashIndex.read(spark, dir)

    assert((loaded.shingleK, loaded.bands, loaded.rowsPerBand) ==
      (built.shingleK, built.bands, built.rowsPerBand))
    // bucket and set tables round-trip exactly
    assert(loaded.buckets.orderBy("id", "band").collect().map(_.toSeq).toSeq ==
      built.buckets.orderBy("id", "band").collect().map(_.toSeq).toSeq)
    assert(loaded.sets.count() == built.sets.count())

    val t = 0.3 // low threshold so the fixture yields pairs
    val a = MinHashIndex.query(built, batch, "doc_id", "text", threshold = t)
      .collect().map(key).toSet
    val b = MinHashIndex.query(loaded, batch, "doc_id", "text", threshold = t)
      .collect().map(key).toSet
    assert(a == b)
  }

  test("write/read round-trips over a file:// Hadoop URI (object-store API seam)") {
    // exercises the Hadoop FileSystem path of IndexSidecar + the parquet
    // legs through an explicit scheme'd URI — the same resolution an
    // s3a:// path takes, minus the store
    val corpus = docs.filter(col("doc_id") < 25)
    val built = MinHashIndex.build(corpus, "doc_id", "text")
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_minhash_uri").toString
    MinHashIndex.write(built, dir)
    val loaded = MinHashIndex.read(spark, dir)
    assert((loaded.shingleK, loaded.bands, loaded.rowsPerBand) ==
      (built.shingleK, built.bands, built.rowsPerBand))
    assert(loaded.buckets.count() == built.buckets.count())
    assert(loaded.sets.count() == built.sets.count())
  }

  test("sidecar intField rejects malformed values with the path named") {
    val e = intercept[IllegalArgumentException] {
      IndexSidecar.intField("""{"bands":x}""", "bands", "/some/idx")
    }
    assert(e.getMessage.contains("bands") && e.getMessage.contains("/some/idx"))
    // negative values parse with their sign (not silently truncated)
    assert(IndexSidecar.intField("""{"k":-5}""", "k", "/p") == -5)
  }

  test("query matches minhashLshIncremental (same definition) and finds injected dups") {
    val corpus = docs.filter(col("doc_id") < 40)
    val batch = docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + lit(5000000L))
    val viaIndex = MinHashIndex
      .query(MinHashIndex.build(corpus, "doc_id", "text"), batch, "doc_id", "text")
      .collect().map(key).toSet
    val direct = Dedup.minhashLshIncremental(corpus, batch, "doc_id", "text")
      .collect().map(key).toSet
    assert(viaIndex == direct)
    // each injected exact dup is found against its corpus original
    (0L until 10L).foreach { i =>
      assert(viaIndex.contains((i + 5000000L, i, 1.0)))
    }
  }

  test("queryCapped: generous cap equals query; tight cap bounds verified " +
      "candidates per doc; loss-audit arithmetic holds") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + lit(5000000L))
    val idx = MinHashIndex.build(corpus, "doc_id", "text")
    val t = 0.3
    val full = MinHashIndex.query(idx, batch, "doc_id", "text", threshold = t)
      .collect().map(key).toSet
    assert(full.nonEmpty)
    assert(MinHashIndex.queryCapped(idx, batch, "doc_id", "text",
      maxCandidatesPerDoc = 100000, threshold = t)
      .collect().map(key).toSet == full)
    val capped = MinHashIndex.queryCapped(idx, batch, "doc_id", "text",
        maxCandidatesPerDoc = 1, threshold = t)
      .collect().map(key).toSet
    assert(capped.subsetOf(full))
    assert(capped.groupBy(_._1).forall(_._2.size <= 1))
    val a = MinHashIndex.cappedLossAudit(idx, batch, "doc_id", "text",
      maxCandidatesPerDoc = 1, threshold = t).head()
    assert(a.getLong(0) == full.size && a.getLong(1) == capped.size)
    assert(a.getLong(2) == full.size - capped.size)
    intercept[IllegalArgumentException](
      MinHashIndex.queryCapped(idx, batch, "doc_id", "text", 0))
  }

  test("queryBudgeted: generous posting budget equals query; tight budget " +
      "serves a subset; audit arithmetic holds") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + lit(5000000L))
    val idx = MinHashIndex.build(corpus, "doc_id", "text")
    val t = 0.3
    val full = MinHashIndex.query(idx, batch, "doc_id", "text", threshold = t)
      .collect().map(key).toSet
    assert(full.nonEmpty)
    // budgets at/above the corpus size cannot drop anything
    assert(MinHashIndex.queryBudgeted(idx, batch, "doc_id", "text",
      maxPostingsPerBucket = 100000, maxCandidatesPerDoc = 100000,
      threshold = t).collect().map(key).toSet == full)
    // a tight posting budget serves a SUBSET with the verify cap still
    // bounding pairs per batch doc
    val budgeted = MinHashIndex.queryBudgeted(idx, batch, "doc_id", "text",
        maxPostingsPerBucket = 1, maxCandidatesPerDoc = 2, threshold = t)
      .collect().map(key).toSet
    assert(budgeted.subsetOf(full))
    assert(budgeted.groupBy(_._1).forall(_._2.size <= 2))
    val a = MinHashIndex.probeBudgetLossAudit(idx, batch, "doc_id", "text",
      maxPostingsPerBucket = 1, maxCandidatesPerDoc = 2, threshold = t).head()
    assert(a.getLong(0) == full.size && a.getLong(1) == budgeted.size)
    assert(a.getLong(2) == full.size - budgeted.size)
    intercept[IllegalArgumentException](
      MinHashIndex.queryBudgeted(idx, batch, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](
      MinHashIndex.queryBudgeted(idx, batch, "doc_id", "text", 1, 0))
  }

  test("erase equals a retained-corpus rebuild; erased docs never match again") {
    import spark.implicits._
    val docs = graft.etl.Tables.documents(spark, graft.GraftSpark.Sf0001)
    val victims = docs.filter(col("doc_id") % 10 === 3)
    val erased = MinHashIndex.erase(
      MinHashIndex.build(docs, "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2),
      victims.select(col("doc_id")))
    val rebuilt = MinHashIndex.build(docs.filter(col("doc_id") % 10 =!= 3),
      "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2)
    assert(erased.buckets.exceptAll(rebuilt.buckets).isEmpty &&
      rebuilt.buckets.exceptAll(erased.buckets).isEmpty)
    assert(erased.sets.exceptAll(rebuilt.sets).isEmpty &&
      rebuilt.sets.exceptAll(erased.sets).isEmpty)
    // a re-crawl batch that clones ONLY victims finds zero matches
    val batch = victims.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val hits = MinHashIndex.query(erased, batch, "doc_id", "text", threshold = 0.8)
      .join(victims.select(col("doc_id").as("corpus_id")), Seq("corpus_id"), "left_semi")
    assert(hits.isEmpty, "an erased doc matched from the index")
    intercept[IllegalArgumentException] {
      MinHashIndex.erase(rebuilt, victims.select("doc_id", "text"))
    }
  }

  test("append encodes with frozen parameters; appended docs are then queryable") {
    val corpus = docs.filter(col("doc_id") < 30)
    val day1 = docs.filter(col("doc_id") >= 30 && col("doc_id") < 40)
    val idx = MinHashIndex.append(
      MinHashIndex.build(corpus, "doc_id", "text"), day1, "doc_id", "text")
    assert(idx.sets.count() == 40)
    // a copy of a day-1 doc now matches through the index
    val probe = day1.filter(col("doc_id") === 35)
      .withColumn("doc_id", lit(5000035L))
    val hits = MinHashIndex.query(idx, probe, "doc_id", "text")
      .collect().map(key)
    assert(hits.exists(h => h._1 == 5000035L && h._2 == 35L && h._3 == 1.0))
  }
}
