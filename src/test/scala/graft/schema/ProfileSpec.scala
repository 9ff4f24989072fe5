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

  test("quantileProfile: hand-computed interpolated quartiles, one scan") {
    import spark.implicits._
    // 1..5: p25 interpolates to 2, p50 = 3, p75 = 4, p95 = 4.8
    val vals = (1 to 5).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val q = Profile.quantileProfile(vals, Seq("v")).head()
    assert((q.getDouble(1), q.getDouble(2), q.getDouble(3), q.getDouble(4)) ==
      ((2.0, 3.0, 4.0, 4.8)))
    val plan = Profile.quantileProfile(vals, Seq("id", "v"))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ".r.findAllIn(plan).size == 1, s"one scan only:\n$plan")
    intercept[IllegalArgumentException](Profile.quantileProfile(vals, Nil))
  }

  test("quantileProfile approx leg stays within tolerance of exact on the fixture") {
    val li = graft.etl.Tables.lineitem(spark, GraftSpark.Sf0001)
    val cols = Seq("l_quantity", "l_extendedprice")
    def m(approx: Boolean) = Profile.quantileProfile(li, cols, approx).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val (e, a) = (m(false), m(true))
    e.foreach { case (c, qs) =>
      qs.zip(a(c)).foreach { case (x, y) =>
        assert(math.abs(y - x) <= math.max(0.01 * math.abs(x), 0.5), s"$c $x vs $y")
      }
    }
  }
  test("quantileProfileAudit: exact quantiles match quantileProfile; every audit boolean true") {
    val li = graft.etl.Tables.lineitem(spark, GraftSpark.Sf0001)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val audited = Profile.quantileProfileAudit(li, cols).collect()
      .map(r => r.getString(0) -> ((Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)), r.getBoolean(5)))).toMap
    val exact = Profile.quantileProfile(li, cols).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    cols.foreach { c =>
      assert(audited(c)._1 == exact(c), s"$c exact quantiles drifted")
      assert(audited(c)._2, s"$c sketch estimate escaped the rank-tolerance band")
    }
    intercept[IllegalArgumentException](Profile.quantileProfileAudit(li, cols, rankTol = 0.5))
    intercept[IllegalArgumentException](Profile.quantileProfileAudit(li, Nil))
  }
}
