package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dissection harness for the current hot query (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()

    def time(name: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = graft.etl.Tables.documents(spark, dir).filter(col("doc_id") < 500)

    time("scan_only") {
      docs.write.format("noop").mode("overwrite").save()
    }
    time("shingle_sets") {
      docs.select(col("doc_id"),
        array_distinct(graft.ops.Dedup.shingleHashes(col("text"), 3)).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pairs_no_jaccard") {
      val withSets = docs.select(col("doc_id").as("id"),
        array_distinct(graft.ops.Dedup.shingleHashes(col("text"), 3)).as("shingle_set"))
      val a = withSets.select(col("id").as("id_a"), col("shingle_set").as("set_a"))
      val b = withSets.select(col("id").as("id_b"), col("shingle_set").as("set_b"))
      a.repartition(col("id_a")).join(broadcast(b), col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    time("full_ngram_jaccard") {
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("full_no_orderby") {
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
