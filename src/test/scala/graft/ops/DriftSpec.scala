package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class DriftSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  // group a: ref = 1..10 → quantile_cont edges at .2/.4/.6/.8 of the
  // sorted 10 values (index p·9): 2.8, 4.6, 6.4, 8.2 → ref bins hold
  // exactly 2 each; cur = ref + 2 shifts mass up one bin at each edge.
  // group b: identical periods → psi 0. group c: NOVEL (cur only).
  private def crafted = {
    import spark.implicits._
    val a = (1 to 10).map(i => ("a", "ref", i.toDouble)) ++
      (3 to 12).map(i => ("a", "cur", i.toDouble))
    val b = (1 to 10).flatMap(i => Seq(("b", "ref", i.toDouble), ("b", "cur", i.toDouble)))
    val c = Seq(("c", "cur", 5.0), ("c", "cur", 6.0), ("c", "cur", 7.0))
    (a ++ b ++ c).toDF("g", "per", "v")
  }

  test("psi matches the hand-computed value on the crafted shift") {
    val got = Drift.psi(crafted, "g", "v", "per").collect()
      .map(r => r.getString(0) -> r).toMap
    // bins (nr, nc): (2,0) (2,2) (2,2) (2,2) (2,4); tr = tc = 10
    //   bin1: (0.2 − 1e-6)·ln(0.2/1e-6) = 0.199999·ln(200000)
    //   bin5: (0.2 − 0.4)·ln(0.5)       = 0.2·ln 2
    val expected = 0.199999 * math.log(200000.0) + 0.2 * math.log(2.0)
    val a = got("a")
    assert(a.getDouble(1) == math.round(expected * 1e4) / 1e4, s"psi a = ${a.getDouble(1)}")
    assert(a.getLong(2) == 10 && a.getLong(3) == 10 && a.getBoolean(4))
    val b = got("b")
    assert(b.getDouble(1) == 0.0 && !b.getBoolean(4))
  }

  test("a novel group (no reference slice) surfaces flagged, not dropped") {
    val got = Drift.psi(crafted, "g", "v", "per").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b", "c"), "cur-only group must not vanish")
    val c = got("c")
    assert(c.isNullAt(1) && c.getLong(2) == 0L && c.getLong(3) == 3L && c.getBoolean(4))
  }

  test("approx-percentile leg stays within tolerance of exact on the events fixture") {
    val ev = Tables.events(spark, GraftSpark.Sf0001).withColumn("per",
      when(col("ts") < lit("2024-01-15").cast("timestamp"), lit("ref"))
        .otherwise(lit("cur")))
    def run(exact: Boolean) =
      Drift.psi(ev, "event_type", "value", "per", exact = exact).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (e, a) = (run(exact = true), run(exact = false))
    assert(e.keySet == a.keySet && e.nonEmpty)
    e.foreach { case (g, psi) =>
      assert(math.abs(a(g) - psi) <= 0.05, s"$g exact=$psi approx=${a(g)}")
    }
  }

  test("categorical psi: vanished and appeared categories both score") {
    import spark.implicits._
    // g1: ref {x,x,y,y}, cur {x,x,z,z} — y vanished, z appeared; shares
    // .5 vs eps each way → psi = 2 · 0.499999·ln(500000). g2 novel.
    val df = Seq(
      ("g1", "ref", "x"), ("g1", "ref", "x"), ("g1", "ref", "y"), ("g1", "ref", "y"),
      ("g1", "cur", "x"), ("g1", "cur", "x"), ("g1", "cur", "z"), ("g1", "cur", "z"),
      ("g2", "cur", "x")).toDF("g", "per", "cat")
    val got = Drift.psiCategorical(df, "g", "cat", "per").collect()
      .map(r => r.getString(0) -> r).toMap
    val expected = 2 * 0.499999 * math.log(500000.0)
    assert(got("g1").getDouble(1) == math.round(expected * 1e4) / 1e4)
    assert(got("g1").getBoolean(4))
    assert(got("g2").isNullAt(1) && got("g2").getLong(2) == 0L &&
      got("g2").getLong(3) == 1L && got("g2").getBoolean(4))
  }

  test("parameter guards") {
    intercept[IllegalArgumentException](Drift.psi(crafted, "g", "v", "per", nBins = 1))
    intercept[IllegalArgumentException](Drift.psi(crafted, "g", "v", "per", eps = 0.7))
    intercept[IllegalArgumentException](Drift.psiCategorical(crafted, "g", "v", "per", eps = 0.0))
  }
}
