package graft.ops

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("resampleDailyFfill: dense spine, last-of-day wins, gaps forward-filled") {
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 10.0),
      (1L, ts("2024-01-01 20:00:00"), 11.0),  // later same day -> wins
      (1L, ts("2024-01-04 09:00:00"), 40.0),  // 2-day gap before
      (2L, ts("2024-01-02 12:00:00"), 99.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleDailyFfill(ev, "user_id", "ts", "value")
      .orderBy("user_id", "day").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Date]("day").toString,
        r.getAs[Double]("value_ffill"), r.getAs[Boolean]("is_observed")))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 11.0, true),
      (1L, "2024-01-02", 11.0, false),  // filled
      (1L, "2024-01-03", 11.0, false),  // filled
      (1L, "2024-01-04", 40.0, true),
      (2L, "2024-01-02", 99.0, true)))  // single-day key: spine is one row
  }

  test("resampleDailyFfill: equal-timestamp ties resolve to the larger value, deterministically") {
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 3.0),
      (1L, ts("2024-01-01 08:00:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleDailyFfill(ev, "user_id", "ts", "value").collect()
    assert(out.length == 1 && out(0).getAs[Double]("value_ffill") == 7.0)
  }
}
