package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / median-absolute-deviation
  * (Hampel's 3-MAD rule, the standard robust replacement for z-scores —
  * one wild value cannot drag its own threshold the way it drags a
  * mean/stddev). The numeric-telemetry analogue of the text quality
  * rails: flag events/metrics whose value sits far outside the typical
  * spread of their own group.
  *
  * Two passes over the input (median, then MAD of deviations), each a
  * per-group aggregate with the group-level model joined back broadcast
  * (group-count-sized, not data-sized). The decision compares
  * 4-dp-ROUNDED deviation against the 4-dp-rounded 3·MAD threshold, so
  * the flag set is reproducible cross-engine to the decimal.
  *
  * Scale note: `exact = true` uses Spark's exact `percentile` — per-group
  * value multisets in aggregation state, right for oracle-checked tests
  * and bounded group counts. At 100 TB-scale group sizes switch
  * `exact = false`: `approx_percentile` with 1e-4-grade accuracy keeps
  * O(1) sketch state per group (same shape as the declared sketch-profile
  * query); the spec pins the approx path within tolerance of exact.
  *
  * Reference anchor: extends SURVEY.md §7.5 north-star surface; robust
  * statistics per Hampel (1974), public practice.
  */
object Outliers {

  /** Exact (interpolating, oracle-parity) vs sketch (O(1)-state) median. */
  private def medianAgg(v: Column, exact: Boolean): Column =
    if (exact) call_function("percentile", v, lit(0.5))
    else percentile_approx(v, lit(0.5), lit(10000))

  /** Per-group (group, med, mad) model — the whole trained state, one row
    * per group.
    */
  def madModel(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      exact: Boolean = true): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(medianAgg(col(valueCol), exact).as("med"))
    df.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        medianAgg(abs(col(valueCol) - col("med")), exact).as("mad"),
        first(col("med")).as("med"))
      .select(col(groupCol), col("med"), col("mad"))
  }

  /** Rows whose |value − med| exceeds `k`·MAD within their group:
    * (idCol, groupCol, valueCol, med, mad, dev) — med/mad/dev rounded
    * 4 dp; the comparison itself is on the rounded values.
    */
  def madOutliers(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String,
      k: Double = 3.0,
      exact: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val model = madModel(df, groupCol, valueCol, exact)
    df.join(broadcast(model), Seq(groupCol))
      .withColumn("dev", round(abs(col(valueCol) - col("med")), 4))
      .filter(col("dev") > round(lit(k) * col("mad"), 4))
      .select(col(idCol), col(groupCol), col(valueCol),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        col("dev"))
  }

  /** Winsorization (Tukey/Dixon, public practice): clamp each row's value
    * into its group's [pLo, pHi] quantile band — the heavy-tail taming
    * that makes mean-based statistics usable on telemetry and reward
    * scores without DROPPING rows (trimming changes N; winsorizing keeps
    * it). Adds `<valueCol>_w` (the clamped value) and the band columns.
    *
    * Scale: one per-group quantile aggregate (the [[madModel]] shape —
    * `exact = false` switches to O(1)-state approx_percentile for
    * corpus-sized groups), broadcast back into a map-side clamp — one
    * shuffle, no window. Quantiles interpolate linearly (Spark
    * `percentile` ≡ DuckDB `quantile_cont`), so the band — and the
    * 4-dp-rounded clamped values — are oracle-exact.
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95,
      exact: Boolean = true): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1: $pLo, $pHi")
    def q(p: Double) =
      if (exact) call_function("percentile", col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    val band = df.groupBy(col(groupCol))
      .agg(q(pLo).as("q_lo"), q(pHi).as("q_hi"))
    df.join(broadcast(band), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        round(greatest(col("q_lo"), least(col("q_hi"), col(valueCol))), 4))
      .withColumn("q_lo", round(col("q_lo"), 4))
      .withColumn("q_hi", round(col("q_hi"), 4))
  }
}
