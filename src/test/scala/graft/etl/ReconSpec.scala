package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class ReconSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("controlTotals: matching, short, doubled and missing buckets all surface") {
    val src = Seq(
      ("b1", 10L), ("b1", 20L),       // matches
      ("b2", 5L), ("b2", 6L),         // target short one row
      ("b3", 7L)                      // bucket absent from target
    ).toDF("b", "v")
    val tgt = Seq(
      ("b1", 10L), ("b1", 20L),
      ("b2", 5L),
      ("b4", 9L)                      // bucket absent from source
    ).toDF("b", "v")
    val got = Recon.controlTotals(src, tgt, col("b"), Seq("v" -> col("v")))
      .orderBy("bucket").collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_src"),
        r.getAs[Long]("n_tgt"), r.getAs[Long]("v_src"), r.getAs[Long]("v_tgt"),
        r.getAs[Boolean]("match")))
    assert(got.toSeq == Seq(
      ("b1", 2L, 2L, 30L, 30L, true),
      ("b2", 2L, 1L, 11L, 5L, false),
      ("b3", 1L, 0L, 7L, 0L, false),
      ("b4", 0L, 1L, 0L, 9L, false)))
  }

  test("controlTotals: equal counts but drifted control sum still mismatches") {
    // same row count, one value corrupted in flight — counts alone would
    // pass; the control sum is what catches it
    val src = Seq(("b", 10L), ("b", 20L)).toDF("b", "v")
    val tgt = Seq(("b", 10L), ("b", 21L)).toDF("b", "v")
    val r = Recon.controlTotals(src, tgt, col("b"), Seq("v" -> col("v")))
      .collect().head
    assert(r.getAs[Long]("n_src") == r.getAs[Long]("n_tgt"))
    assert(!r.getAs[Boolean]("match"))
  }

  test("controlTotals: NULL buckets on both sides land on ONE comparable row") {
    val src = Seq((Option.empty[String], 5L), (None, 6L), (Some("b"), 1L))
      .toDF("b", "v")
    val tgt = Seq((Option.empty[String], 5L), (None, 6L), (Some("b"), 1L))
      .toDF("b", "v")
    val got = Recon.controlTotals(src, tgt, col("b"), Seq("v" -> col("v")))
      .collect().map(r => (Option(r.getAs[String]("bucket")),
        r.getAs[Long]("n_src"), r.getAs[Long]("n_tgt"), r.getAs[Boolean]("match")))
    assert(got.toSet == Set(
      (None, 2L, 2L, true),
      (Some("b"), 1L, 1L, true)))
  }

  test("controlTotals requires at least one measure") {
    val df = Seq(("b", 1L)).toDF("b", "v")
    intercept[IllegalArgumentException] {
      Recon.controlTotals(df, df, col("b"), Seq.empty)
    }
  }
}
