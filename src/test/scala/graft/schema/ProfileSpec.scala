package graft.schema

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class ProfileSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 1.5), (2L, Some("b"), 2.5), (3L, None, 2.5), (4L, Some("a"), 0.0))
    .toDF("id", "s", "v")

  test("profile computes rows/nulls/distinct/min/max per column in one pass") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("v") == ((4L, 0L, 3L, "0.0", "2.5")))
  }

  test("profile restricts to requested columns and supports approx distinct") {
    val p = Profile.profile(df, Seq("s"), approx = true).collect()
    assert(p.length == 1 && p(0).getString(0) == "s")
    assert(p(0).getLong(3) == 2L) // HLL exact at this cardinality
  }

  test("profile on a fixture table matches direct aggregates") {
    val orders = graft.etl.Tables.orders(spark, GraftSpark.Sf0001)
    val p = Profile.profile(orders, Seq("o_orderkey")).head()
    assert(p.getLong(1) == orders.count())
    assert(p.getLong(2) == 0L)
    assert(p.getLong(3) == orders.select(countDistinct("o_orderkey")).head().getLong(0))
  }
}
