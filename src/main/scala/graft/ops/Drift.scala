package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two periods of a feature column —
  * the monitoring gate a continuously-refreshed training corpus needs
  * (public practice: the Population Stability Index from credit-risk
  * scorecard monitoring, Siddiqi 2006; the same Σ(p−q)·ln(p/q) form is
  * the symmetrized KL term used for covariate-shift checks). The
  * reference has no monitoring at all (SURVEY.md §5 — zero tests, zero
  * checks); this is the data-quality extension of its windowed loads.
  *
  * Scale shape: bin edges come from per-group REFERENCE quantiles (one
  * aggregate over the reference slice → a #groups×(bins−1) model frame,
  * broadcast); bin assignment is a map-side comparison chain; the only
  * other shuffle is one (group, bin) count aggregate. The final PSI
  * roll-up runs over the #groups×bins count frame — window fan-out is
  * bounded by `nBins`, never by data. `exact = false` switches the
  * quantile aggregate to `approx_percentile` (the [[Outliers]]
  * convention): O(1) sketch state per group for corpus-sized groups,
  * with DriftSpec pinning the approx-vs-exact PSI gap on the events
  * fixture.
  */
object Drift {

  /** Per-group PSI between the `periodCol == "ref"` and `== "cur"` slices
    * of `valueCol`. Bins are the reference slice's `nBins` equal-frequency
    * buckets (quantile edges at i/nBins — with `exact = true` Spark
    * `percentile` interpolates exactly like DuckDB `quantile_cont`, so
    * the DuckDB oracle replays bit-for-bit; `exact = false` is the
    * 100 TB sketch leg); values above/below the reference range land in
    * the edge bins, so a shifted current period shows up instead of
    * disappearing. Empty current bins clamp to `eps` (the standard PSI
    * convention — ln(p/0) is the signal "this bin vanished", bounded,
    * not infinite).
    *
    * Groups with CURRENT rows but NO reference slice — brand-new groups,
    * themselves a strong drift signal — are NOT dropped: they surface as
    * rows with `psi = NULL`, `n_ref = 0`, and `drifted = true` (a novel
    * group always needs attention; a silent inner join would hide
    * exactly the population the monitor exists to catch).
    *
    * Output per group: `psi` (4 dp), row counts of both slices, and
    * `drifted` under the classic 0.2 action threshold.
    */
  def psi(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      periodCol: String,
      nBins: Int = 5,
      eps: Double = 1e-6,
      exact: Boolean = true): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    require(eps > 0 && eps < 0.5, s"eps must be in (0, 0.5): $eps")
    def quantile(p: Double): Column =
      if (exact) call_function("percentile", col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    val edgeCols: Seq[Column] = (1 until nBins).map { i =>
      quantile(i.toDouble / nBins).as(s"__e$i")
    }
    val edges = df.filter(col(periodCol) === "ref")
      .groupBy(col(groupCol))
      .agg(edgeCols.head, edgeCols.tail: _*)
    val bin = (1 until nBins).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(valueCol) > col(s"__e$i"), 1).otherwise(0)
    }
    val counts = df.join(broadcast(edges), Seq(groupCol))
      .withColumn("__bin", bin)
      .groupBy(col(groupCol), col("__bin"))
      .agg(sum(when(col(periodCol) === "ref", 1L).otherwise(0L)).as("__nr"),
        sum(when(col(periodCol) === "cur", 1L).otherwise(0L)).as("__nc"))
    val scored = psiRollup(counts, groupCol, eps)
    // novel groups: current-period rows whose group has no reference
    // slice (hence no edges row) — surfaced, never silently dropped
    val novel = df.filter(col(periodCol) === "cur")
      .join(broadcast(edges.select(col(groupCol))), Seq(groupCol), "left_anti")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_cur"))
      .select(col(groupCol), lit(null).cast("double").as("psi"),
        lit(0L).as("n_ref"), col("n_cur"), lit(true).as("drifted"))
    scored.unionByName(novel)
  }

  /** Per-group PSI over a CATEGORICAL column — the more common production
    * drift check (language mix, source mix, label mix): bins are the
    * category values themselves (no quantiles, no ordering assumption),
    * observed in EITHER period, so a category that appears or vanishes
    * between periods contributes its eps-clamped ln-ratio instead of
    * being invisible. Same novel-group rule as [[psi]]: a group with
    * current rows but no reference slice surfaces with `psi = NULL`,
    * `drifted = true`.
    *
    * Scale: ONE (group, category) count aggregate over the input — no
    * model frame at all; the roll-up window spans a group's category
    * list, never its rows. Fully SQL-expressible → full DuckDB oracle.
    */
  def psiCategorical(
      df: DataFrame,
      groupCol: String,
      catCol: String,
      periodCol: String,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 0.5, s"eps must be in (0, 0.5): $eps")
    val counts = df
      .groupBy(col(groupCol), col(catCol).as("__bin"))
      .agg(sum(when(col(periodCol) === "ref", 1L).otherwise(0L)).as("__nr"),
        sum(when(col(periodCol) === "cur", 1L).otherwise(0L)).as("__nc"))
    // a group is novel iff it has no reference rows AT ALL
    val grpTot = counts.groupBy(col(groupCol))
      .agg(sum(col("__nr")).as("__gtr"))
    val withTot = counts.join(broadcast(grpTot), Seq(groupCol))
    val scored = psiRollup(withTot.filter(col("__gtr") > 0).drop("__gtr"),
      groupCol, eps)
    val novel = withTot.filter(col("__gtr") === 0)
      .groupBy(col(groupCol))
      .agg(sum(col("__nc")).as("n_cur"))
      .select(col(groupCol), lit(null).cast("double").as("psi"),
        lit(0L).as("n_ref"), col("n_cur"), lit(true).as("drifted"))
    scored.unionByName(novel)
  }

  /** Shared PSI roll-up over a (group, __bin, __nr, __nc) count frame:
    * per-group share normalization (window over ≤ #bins rows), eps
    * clamps, Σ(p−q)·ln(p/q) rounded 4 dp, and the 0.2 action flag.
    */
  private def psiRollup(
      counts: DataFrame,
      groupCol: String,
      eps: Double): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    counts
      .withColumn("__tr", sum(col("__nr")).over(w))
      .withColumn("__tc", sum(col("__nc")).over(w))
      .withColumn("__p", greatest(col("__nr") / col("__tr"), lit(eps)))
      .withColumn("__q", greatest(col("__nc") / col("__tc"), lit(eps)))
      .groupBy(col(groupCol))
      .agg(
        round(sum((col("__p") - col("__q")) * log(col("__p") / col("__q"))), 4)
          .as("psi"),
        sum(col("__nr")).as("n_ref"),
        sum(col("__nc")).as("n_cur"))
      .withColumn("drifted", col("psi") > 0.2d)
  }
}
