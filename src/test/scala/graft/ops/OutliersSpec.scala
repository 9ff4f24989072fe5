package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class OutliersSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def crafted = {
    import spark.implicits._
    // group "a": values 1..9 plus one wild 1000 → med 5.5, deviations
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} → MAD 2.5; only the
    // wild row exceeds 3·MAD = 7.5. group "b": tight cluster, no outlier.
    val a = (1 to 9).map(i => (i.toLong, "a", i.toDouble)) :+ (10L, "a", 1000.0)
    val b = (11 to 15).map(i => (i.toLong, "b", 50.0 + (i % 3)))
    (a ++ b).toDF("id", "g", "v")
  }

  test("madModel matches hand-computed median and MAD per group") {
    val m = Outliers.madModel(crafted, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("a") == ((5.5, 2.5)))
    // b: values {50,51,52,50,51} → med 51; |dev| {1,0,1,1,0} → MAD 1
    assert(m("b") == ((51.0, 1.0)))
  }

  test("madOutliers flags exactly the wild row under the 3-MAD rule") {
    val got = Outliers.madOutliers(crafted, "id", "g", "v").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L))
    val r = got.head
    assert(r.getDouble(3) == 5.5 && r.getDouble(4) == 2.5 && r.getDouble(5) == 994.5)
  }

  test("a mean/stddev z-score would move its own threshold; MAD does not") {
    // the wild row inflates stddev so much that 3-sigma barely flags it,
    // while every clean row sits well inside 3-MAD — the reason for MAD
    val stats = crafted.filter(col("g") === "a")
      .agg(avg("v").as("mu"), stddev_pop("v").as("sd")).head()
    val (mu, sd) = (stats.getDouble(0), stats.getDouble(1))
    assert(math.abs(1000.0 - mu) / sd < 3.2, "wild point dominates its own sigma")
    val flagged = Outliers.madOutliers(crafted, "id", "g", "v")
      .filter(col("g") === "a").count()
    assert(flagged == 1)
  }

  test("approx path stays within tolerance of exact on the events fixture") {
    val ev = Tables.events(spark, GraftSpark.Sf0001)
    val exact = Outliers.madModel(ev, "event_type", "value", exact = true)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Outliers.madModel(ev, "event_type", "value", exact = false)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (g, (med, mad)) =>
      assert(math.abs(approx(g)._1 - med) <= math.max(0.05 * math.abs(med), 0.5), s"$g med")
      assert(math.abs(approx(g)._2 - mad) <= math.max(0.05 * math.abs(mad), 0.5), s"$g mad")
    }
  }

  test("winsorize approx path: sketch band within tolerance of exact on the events fixture") {
    val ev = Tables.events(spark, GraftSpark.Sf0001)
    def bands(exact: Boolean) =
      Outliers.winsorize(ev, "event_type", "value", exact = exact)
        .select("event_type", "q_lo", "q_hi").distinct()
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (e, a) = (bands(exact = true), bands(exact = false))
    assert(e.keySet == a.keySet && e.nonEmpty)
    e.foreach { case (g, (lo, hi)) =>
      val span = hi - lo
      assert(math.abs(a(g)._1 - lo) <= 0.05 * span, s"$g q_lo exact=$lo approx=${a(g)._1}")
      assert(math.abs(a(g)._2 - hi) <= 0.05 * span, s"$g q_hi exact=$hi approx=${a(g)._2}")
    }
    // the clamped means the two paths produce must agree closely — the
    // statistic downstream consumers actually read
    def wMean(exact: Boolean) =
      Outliers.winsorize(ev, "event_type", "value", exact = exact)
        .groupBy("event_type").agg(avg("value_w").as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (em, am) = (wMean(exact = true), wMean(exact = false))
    em.foreach { case (g, m) =>
      assert(math.abs(am(g) - m) <= math.max(0.02 * math.abs(m), 0.5), s"$g mean")
    }
  }

  test("winsorize clamps into the hand-computed quantile band, keeps N, tames the tail") {
    import spark.implicits._
    // 1..9 plus one wild 1000 in group a; q(0.05)/q(0.95) interpolate over
    // the 10 sorted values: lo = 1 + 0.45*(2-1) = 1.45, hi = 9 + 0.55*(1000-9)
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 1000.0)).toDF("g", "v")
    val out = Outliers.winsorize(df, "g", "v", 0.05, 0.95)
      .select("v", "v_w", "q_lo", "q_hi").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 10, "winsorize must not drop rows")
    val (lo, hi) = (out.head._3, out.head._4)
    assert(lo == 1.45 && hi == 554.05, s"band ($lo, $hi)")
    out.foreach { case (v, w, _, _) =>
      assert(w == math.max(lo, math.min(hi, math.round(v * 1e4) / 1e4)), s"v=$v w=$w")
    }
    // the winsorized mean sits far below the raw mean (tail tamed)
    val rawMean = out.map(_._1).sum / 10
    val wMean = out.map(_._2).sum / 10
    assert(wMean < rawMean && wMean < 100, s"raw $rawMean winsorized $wMean")
    intercept[IllegalArgumentException](Outliers.winsorize(df, "g", "v", 0.9, 0.1))
  }
}
