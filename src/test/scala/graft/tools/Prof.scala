package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.Tables
import graft.ops.Dedup

/** Dev profiling harness (test scope only): times minhash sub-stages. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val dups = docs.filter(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + lit(1000000L))
    val df = docs.unionByName(dups)

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val withSets = df.select(col("doc_id").as("id"),
      array_distinct(Dedup.shingleHashes(col("text"), 3)).as("shingle_set"))
    time("shingle_hash") { withSets.select(sum(size(col("shingle_set")))).head(); 0L }
    val withSig = withSets.withColumn("sig", Dedup.minhashSignature(col("shingle_set"), 16))
    time("shingle+sig") { withSig.select(count(element_at(col("sig"), 1))).head(); 0L }
    val full = Dedup.minhashLsh(df, "doc_id", "text", 3, 8, 2, 0.8)
    time("full_lsh_1") { full.count() }
    time("full_lsh_2") { full.count() }
    spark.stop()
  }
}
