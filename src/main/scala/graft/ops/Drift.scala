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
  * bounded by `nBins`, never by data.
  */
object Drift {

  /** Per-group PSI between the `periodCol == "ref"` and `== "cur"` slices
    * of `valueCol`. Bins are the reference slice's `nBins` equal-frequency
    * buckets (quantile edges at i/nBins — Spark `percentile` interpolates
    * exactly like DuckDB `quantile_cont`, so oracles replay bit-for-bit);
    * values above/below the reference range land in the edge bins, so a
    * shifted current period shows up instead of disappearing. Empty
    * current bins clamp to `eps` (the standard PSI convention — ln(p/0)
    * is the signal "this bin vanished", bounded, not infinite).
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
      eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    require(eps > 0 && eps < 0.5, s"eps must be in (0, 0.5): $eps")
    val edgeCols: Seq[Column] = (1 until nBins).map { i =>
      call_function("percentile", col(valueCol), lit(i.toDouble / nBins))
        .as(s"__e$i")
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
    val w = Window.partitionBy(col(groupCol))
    val shares = counts
      .withColumn("__tr", sum(col("__nr")).over(w))
      .withColumn("__tc", sum(col("__nc")).over(w))
      .withColumn("__p", greatest(col("__nr") / col("__tr"), lit(eps)))
      .withColumn("__q", greatest(col("__nc") / col("__tc"), lit(eps)))
    shares
      .groupBy(col(groupCol))
      .agg(
        round(sum((col("__p") - col("__q")) * log(col("__p") / col("__q"))), 4)
          .as("psi"),
        sum(col("__nr")).as("n_ref"),
        sum(col("__nc")).as("n_cur"))
      .withColumn("drifted", col("psi") > 0.2d)
  }
}
