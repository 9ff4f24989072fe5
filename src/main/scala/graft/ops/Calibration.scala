package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-calibration audit — the reliability diagram + Expected
  * Calibration Error of any [0,1] confidence score against binary
  * outcomes (public method: Naeini et al. 2015 "Obtaining Well
  * Calibrated Probabilities Using Bayesian Binning"; the standard ECE
  * form with equal-width bins). A data pipeline that gates on model
  * confidences (quality classifier, language-ID, relevance scores) needs
  * to know whether "0.9 confident" MEANS 90% correct before thresholding
  * at scale — an over-confident filter silently biases the corpus.
  *
  *   ECE = Σ_bins (n_b / N) · |acc_b − conf_b|
  *
  * Scale shape: ONE count/avg aggregate keyed by the bin index (map-side
  * partial; ≤ nBins groups), then a bins-sized roll-up; the ECE scalar
  * rides back as a broadcast one-row aggregate. Nothing beyond the
  * nBins-row frame ever leaves the aggregation. Fully SQL-expressible →
  * full DuckDB oracle.
  */
object Calibration {

  /** Per-bin reliability table: (bin 1..nBins, n, conf, acc, gap, ece) —
    * `conf` = mean score in the bin, `acc` = empirical positive rate,
    * `gap` = |acc − conf| (all 4 dp), `ece` = the N-weighted mean gap
    * (identical on every row; the scalar a promotion gate thresholds).
    * Scores clamp into [0, 1] for binning (score 1.0 lands in the top
    * bin); `labelCol` must be 0/1-valued.
    */
  def reliability(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val b = df.select(col(scoreCol).cast("double").as("__s"),
      col(labelCol).cast("double").as("__y"))
    val bin = greatest(least(floor(col("__s") * nBins), lit(nBins - 1L)), lit(0L)) + 1
    val bins = b.select(bin.as("bin"), col("__s"), col("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg(col("__s")).as("__conf"),
        avg(col("__y")).as("__acc"))
    val ece = bins.agg(
      round(sum(col("n") * abs(col("__acc") - col("__conf"))) / sum(col("n")), 4)
        .as("ece"))
    bins.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"),
        round(col("__conf"), 4).as("conf"),
        round(col("__acc"), 4).as("acc"),
        round(abs(col("__acc") - col("__conf")), 4).as("gap"),
        col("ece"))
  }
}
