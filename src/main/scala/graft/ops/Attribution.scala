package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Revenue attribution over an event stream: each conversion distributes
  * its value across the subject's preceding touches inside a lookback
  * window, under one of the standard models (last-touch, linear,
  * time-decay, position-based — the Shapley-lite family every marketing /
  * growth warehouse ships). The reference has no analytics beyond
  * extract-load (SURVEY.md §0); this is north-star surface beside the
  * events family.
  *
  * Scale design: ONE user-keyed range join (AsOf.rangeJoin — equi-join on
  * the subject key plus a time-range filter, sort-merge class, never a
  * per-conversion rescan of the stream), then per-conversion normalizers
  * from windows PARTITIONED BY the conversion id — group count grows with
  * conversions, each frame is touches-per-conversion-sized (lookback-
  * bounded). Unmatched conversions fall to a `direct` channel via one
  * keys-only anti-join. The pair frame is localCheckpoint'ed: it feeds
  * every credit leg and the anti-join.
  */
object Attribution {

  /** Per-(conversion, touch) credit rows under all requested models at
    * once — callers aggregate to taste (see [[report]]).
    *
    * @param conversions frame with `idCol` (unique conversion id),
    *                    `keyCol`, `timeCol`, `valueCol`
    * @param touches     frame with `keyCol`, `timeCol`, `channelCol`
    * @param lookback    window interval (e.g. `expr("INTERVAL 7 DAYS")`)
    * @param halfLife    time-decay half-life in MICROSECONDS (default
    *                    3.5 days = 3.024e11 μs)
    * @param uShape      position-based end weight: first and last touch
    *                    each take `uShape`, the middle splits the rest
    *                    (default 0.4 — the classic 40/20/40)
    * @return one row per retained (conversion, touch) pair plus one
    *         `direct` row per untouched conversion: (idCol, channel,
    *         credit_last, credit_linear, credit_decay, credit_position)
    */
  def credits(
      conversions: DataFrame,
      touches: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      valueCol: String,
      channelCol: String,
      lookback: Column,
      halfLife: Double = 3.024e11,
      uShape: Double = 0.4): DataFrame = {
    require(halfLife > 0, s"halfLife must be positive: $halfLife")
    require(uShape > 0 && uShape <= 0.5, s"uShape must be in (0, 0.5]: $uShape")
    val pairs = AsOf.rangeJoin(
        conversions.select(col(idCol), col(keyCol), col(timeCol), col(valueCol)),
        touches.select(col(keyCol), col(timeCol), col(channelCol)),
        Seq(keyCol), timeCol, timeCol, lookback)
      .localCheckpoint() // feeds every credit leg AND the direct anti-join
    val w = Window.partitionBy(idCol)
    // deterministic within-conversion touch order for last/position:
    // time, then channel (engines must agree on equal-time ties)
    val ord = Window.partitionBy(idCol)
      .orderBy(col(s"r_$timeCol"), col(s"r_$channelCol"))
    val scored = pairs
      .withColumn("__age_us",
        unix_micros(col(timeCol)) - unix_micros(col(s"r_$timeCol")))
      .withColumn("__wd", pow(lit(0.5), col("__age_us") / lit(halfLife)))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__wsum", sum("__wd").over(w))
      .withColumn("__pos", row_number().over(ord))
      .withColumn("__wpos",
        when(col("__n") === 1, lit(1.0))
          .when(col("__n") === 2, lit(0.5))
          .when(col("__pos") === 1 || col("__pos") === col("__n"), lit(uShape))
          .otherwise(lit(1.0 - 2 * uShape) / (col("__n") - lit(2))))
      .select(col(idCol), col(s"r_$channelCol").as("channel"),
        (col(valueCol) * when(col("__pos") === col("__n"), 1.0).otherwise(0.0))
          .as("credit_last"),
        (col(valueCol) / col("__n")).as("credit_linear"),
        (col(valueCol) * col("__wd") / col("__wsum")).as("credit_decay"),
        (col(valueCol) * col("__wpos")).as("credit_position"))
    val direct = conversions
      .join(pairs.select(idCol), Seq(idCol), "left_anti")
      .select(col(idCol), lit("direct").as("channel"),
        col(valueCol).cast("double").as("credit_last"),
        col(valueCol).cast("double").as("credit_linear"),
        col(valueCol).cast("double").as("credit_decay"),
        col(valueCol).cast("double").as("credit_position"))
    scored.unionByName(direct)
  }

  /** Per-channel roll-up of [[credits]]: credit row count plus the four
    * models' attributed value, 4-dp rounded (the comparison read-out a
    * marketing report shows side by side).
    */
  def report(creditRows: DataFrame): DataFrame =
    creditRows.groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        round(sum("credit_last"), 4).as("last_value"),
        round(sum("credit_linear"), 4).as("linear_value"),
        round(sum("credit_decay"), 4).as("decay_value"),
        round(sum("credit_position"), 4).as("position_value"))
}
