package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class AsOfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("asOfJoin picks the latest right row at or before each left time") {
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (2L, 5L, "p3")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 9L, "d")).toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t").orderBy("name")
      .select("name", "r_v").collect().map(r => (r.getString(0), r.getString(1)))
    // p1@10 matches b (t=10, inclusive); p2@25 matches c; p3@5 has no match (d@9 later)
    assert(out.toSeq == Seq(("p1", "b"), ("p2", "c")))
  }

  test("asOfJoin inner=false keeps unmatched left rows with nulls") {
    val left = Seq((1L, 1L, "early")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, "late")).toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", inner = false).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("r_v")))
  }

  test("asOfJoin tolerance voids matches older than the window") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, "ancient")).toDF("k", "t", "v")
    val strict = AsOf.asOfJoin(left, right, Seq("k"), "t", "t",
      tolerance = Some(lit(50L)))
    assert(strict.isEmpty) // gap 90 > 50 → no match survives (inner)
    val loose = AsOf.asOfJoin(left, right, Seq("k"), "t", "t",
      tolerance = Some(lit(95L)))
    assert(loose.count() == 1)
  }

  test("rangeJoin bounds matches to the lookback window") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 50L, "old"), (1L, 90L, "in"), (1L, 100L, "edge"), (1L, 101L, "future"))
      .toDF("k", "t", "v")
    val out = AsOf.rangeJoin(left, right, Seq("k"), "t", "t", lookback = lit(15L))
      .select("r_v").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("edge", "in"))
  }
}
