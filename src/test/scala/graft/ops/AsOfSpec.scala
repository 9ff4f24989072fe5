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

  test("direction=forward picks the earliest right at or after; inclusive at equality") {
    val left = Seq((1L, 100L, "a"), (1L, 150L, "b"), (1L, 300L, "c")).toDF("k", "t", "name")
    val right = Seq((1L, 50L, "past"), (1L, 150L, "eq"), (1L, 200L, "next")).toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t",
      direction = "forward", inner = false)
      .select("name", "r_v").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("a" -> Some("eq"), "b" -> Some("eq"), "c" -> None))
  }

  test("direction=nearest picks the smaller gap; exact ties resolve backward") {
    val left = Seq((1L, 100L, "tie"), (1L, 110L, "fwd"), (1L, 95L, "bwd")).toDF("k", "t", "name")
    val right = Seq((1L, 90L, "early"), (1L, 110L, "late")).toDF("k", "t", "v")
    // tie @100: gap 10 both ways -> backward ("early");
    // fwd @110: exact match "late"; bwd @95: gap 5 back vs 15 fwd
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", direction = "nearest")
      .select("name", "r_v").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("tie" -> "early", "fwd" -> "late", "bwd" -> "early"))
  }

  test("nearest with tolerance voids matches outside the two-sided window") {
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 60L, "far")).toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t",
      direction = "nearest", inner = false, tolerance = Some(lit(20L)))
      .select("r_v").head()
    assert(out.isNullAt(0))
  }

  test("forward ties at the same right time break to the largest right row") {
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "name")
    val right = Seq((1L, 150L, "r1"), (1L, 150L, "r2")).toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", direction = "forward")
      .select("r_v").head().getString(0)
    assert(out == "r2") // largest (k, t, v) struct wins, as documented
  }
}
