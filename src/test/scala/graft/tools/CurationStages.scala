package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.Tables
import graft.ops.{Dedup, TextAnalysis}

/** Dev helper: per-stage timing of `e2e_curation_pipeline` (the r16
  * two-decade probe's steepest non-brute slope) — each stage forced with
  * the bench's noop sink so the cost attribution is additive.
  * `Test/runMain graft.tools.CurationStages [sfDir]`.
  */
object CurationStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[stage] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val docs = Tables.documents(spark, sfDir)
    def corpus = docs.unionByName(
      docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
    def kept = TextAnalysis.qualityFilter(corpus, "text",
        minTokens = 20, maxRepetition = 0.02, minQuality = 0.85)
      .filter(col("reject_reason") === "kept").drop("reject_reason")
    time("corpus_union")(corpus)
    time("expr_token_count")(corpus.select(
      TextAnalysis.tokenCount(col("text")).as("x")))
    time("expr_repetition")(corpus.select(
      TextAnalysis.repetitionRatio(col("text"), 3).as("x")))
    time("expr_quality_score")(corpus.select(
      TextAnalysis.qualityScore(col("text")).as("x")))
    time("quality_kept")(kept)
    val bench = docs.filter(col("doc_id") % 25 === 0)
    time("bench_grams")(bench.select(
      explode(array_distinct(graft.ops.Decontaminate.wordNgrams(col("text"), 8)))
        .as("gram")).distinct())
    time("decontaminate")(graft.ops.Decontaminate.decontaminate(
      kept, bench, "doc_id", "text", n = 8))
    time("full_plus_dedup") {
      val clean = graft.ops.Decontaminate.decontaminate(
        kept, bench, "doc_id", "text", n = 8)
      Dedup.exact(clean, keys = Seq("text"), keepBy = "doc_id")
        .select("doc_id", "lang", "source", "n_chars")
    }
    spark.stop()
  }
}
