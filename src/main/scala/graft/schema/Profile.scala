package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data profiling: row count, null count, distinct count,
  * min/max — the data-quality audit an ETL pipeline runs before/after a
  * load (companion to [[Introspect]]'s schema-side audit; the reference has
  * no data-side counterpart).
  *
  * Scale shape: ONE aggregation pass over the table produces every metric
  * (per-column aggregates in a single `agg`), then the one result row
  * explodes into per-column rows — no per-column scans, no driver loop.
  * Exact `count_distinct` rewrites into Catalyst's expand (one shuffle
  * leg per distinct column); at 100 TB pass `approx = true` to profile
  * with `approx_count_distinct` (HLL++, single leg, ~2% error) instead.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil, approx: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    // Two aggregation passes, deliberately SPLIT: min/max over string
    // columns have immutable agg buffers, which forces the whole aggregate
    // into SortAggregate — combined with the count_distinct Expand that
    // meant a full sort of rows × (cols+1). Separated, the basic pass is
    // one keyless single-pass aggregate (no sort needed) and the distinct
    // pass is counts-only, which stays in HashAggregate through the
    // Expand. The two one-row results cross-join for free.
    val basicMetrics = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val basic = df.agg(count(lit(1)).as("__n"), basicMetrics: _*)
    val distincts = df.agg(
      (if (approx) approx_count_distinct(col(cols.head)) else count_distinct(col(cols.head)))
        .as(s"__nd_${cols.head}"),
      cols.tail.map(c =>
        (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"__nd_$c")): _*)
    val one = basic.crossJoin(distincts)
    val perCol = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_val"),
      col(s"__mx_$c").as("max_val"))): _*)
    one.select(explode(perCol).as("p")).select("p.*")
  }

  /** Numeric-column quantile profile — the distribution companion of
    * [[profile]] (min/max say nothing about shape; a skew-aware loader
    * wants the quartiles and the p95 tail). ONE aggregation pass computes
    * every column's (p25, p50, p75, p95) — exact interpolating
    * `percentile` by default (DuckDB `quantile_cont` parity → full SQL
    * oracle); `approx = true` switches to `approx_percentile` sketches
    * for 100 TB inputs (the [[graft.ops.Outliers]] convention), with the
    * parity bound asserted in ProfileSpec.
    */
  def quantileProfile(
      df: DataFrame,
      columns: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "quantileProfile needs at least one numeric column")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    // ONE array-probe aggregate per column: a scalar `percentile` call
    // buffers the whole column PER PROBE (4 cols × 4 probes = 16
    // column-sized buffers through the final merge task — measured 7.9 s
    // at sf0.1); the array form evaluates every probe off one buffer
    val pArr = array(ps.map(lit): _*)
    def q(c: String) =
      if (approx) percentile_approx(col(c), pArr, lit(10000))
      else call_function("percentile", col(c), pArr)
    val metrics = columns.map(c => q(c).as(s"__q_$c"))
    val one = df.agg(metrics.head, metrics.tail: _*)
    val perCol = array(columns.map(c => struct(
      lit(c).as("col_name") +:
        ps.indices.map(i =>
          round(element_at(col(s"__q_$c"), i + 1).cast("double"), 4)
            .as(Seq("p25", "p50", "p75", "p95")(i))): _*)): _*)
    one.select(explode(perCol).as("p")).select("p.*")
  }

  /** The 100 TB approx leg of [[quantileProfile]], DECLARED with its
    * error audit in the same pass. `approx_percentile`'s merged sketch
    * is compression-ORDER-sensitive — the raw estimates are not
    * run-stable and can't be pinned — but its Greenwald–Khanna rank
    * guarantee IS deterministic: with accuracy `2/rankTol` the returned
    * value's rank is within `rankTol/2` of the probe. So the declared
    * row carries the EXACT quantiles (full `quantile_cont` SQL oracle)
    * plus ONE stable boolean per column: every sketch estimate lies
    * between the exact quantiles at `p ± rankTol` (inclusive — on
    * duplicate-heavy columns the band can collapse to a single value,
    * which the rank guarantee still hits). At 100 TB the caller profiles
    * with the approx column alone; this audited form is the declared
    * evidence the swap is safe (the `corpus_profile_sketch_error`
    * pattern, in-row).
    */
  def quantileProfileAudit(
      df: DataFrame,
      columns: Seq[String],
      rankTol: Double = 0.01): DataFrame = {
    require(columns.nonEmpty, "quantileProfileAudit needs at least one numeric column")
    require(rankTol > 0 && rankTol <= 0.05, s"rankTol out of range (0, 0.05]: $rankTol")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    // sketch twice as tight as the audit band: rank slack for the
    // interpolation at the band edges
    val accuracy = math.ceil(2.0 / rankTol).toInt
    // TWO array-probe aggregates per column (one exact buffer over
    // [lo, p, hi]×probes, one sketch over the probes) — the scalar form
    // would buffer the column 16× per column (see [[quantileProfile]])
    val exactProbes = ps.flatMap(p =>
      Seq(math.max(0.0, p - rankTol), p, math.min(1.0, p + rankTol)))
    val metrics = columns.flatMap { c =>
      Seq(
        call_function("percentile", col(c),
          array(exactProbes.map(lit): _*)).as(s"__e_$c"),
        percentile_approx(col(c), array(ps.map(lit): _*), lit(accuracy))
          .as(s"__a_$c"))
    }
    val one = df.agg(metrics.head, metrics.tail: _*)
    def e(c: String, idx: Int) =
      element_at(col(s"__e_$c"), idx).cast("double")
    val perCol = array(columns.map(c => struct(
      (lit(c).as("col_name") +:
        ps.indices.map(i =>
          round(e(c, 3 * i + 2), 4).as(Seq("p25", "p50", "p75", "p95")(i)))) :+
        ps.indices.map(i =>
            element_at(col(s"__a_$c"), i + 1).cast("double")
              .between(e(c, 3 * i + 1), e(c, 3 * i + 3)))
          .reduce(_ && _).as("approx_within_rank_tol"): _*)): _*)
    one.select(explode(perCol).as("p")).select("p.*")
  }
}
