package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier, trained and served as pure
  * relational algebra — the cheapest useful "model-based quality/domain
  * classifier" stage of an LLM data pipeline (fastText-style corpus
  * labeling in public practice: CCNet's LM filter, Llama-style quality
  * classifiers). NB is the one classifier whose training IS a groupBy:
  * closed-form counts, no gradient loop, so the full pipeline — train on
  * a labeled slice, score the corpus — stays declarative, deterministic
  * and DuckDB-checkable.
  *
  * Model (Laplace α=1): logP(t|l) = ln(c(t,l)+1) − ln(T_l + V), prior
  * ln(N_l/N). Scoring uses the rearranged form
  * score(d,l) = prior_l + Σ_occ ln(c(t,l)+1) − n_vocab(d)·ln(T_l+V)
  * so only EXISTING (label, token) count rows ever join the corpus — no
  * label×vocab dense grid is materialized. Tokens outside the training
  * vocabulary are skipped (the standard multinomial-NB convention),
  * which keeps scores comparable across labels.
  *
  * Scale shape: the model is vocabulary-bounded (Heaps' law — millions of
  * rows at 100 TB, not corpus-sized) → broadcast into the exploded corpus
  * scan; scoring is ONE (doc, label) hash aggregate plus a docs×|labels|
  * frame, each label-count-bounded. No collect anywhere.
  *
  * Reference anchor: extends SURVEY.md §7.5 north-star surface (the
  * reference templates have no model stage at all).
  */
object NaiveBayes {

  /** Per-(label, token) training counts with the smoothed conditional:
    * (label, token, n, log_cond). `minCount` prunes the reported tail
    * (the conditional stays exact — pruning is presentation-only here;
    * [[score]] takes the unpruned counts).
    */
  def model(train: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val cnt = tokenCounts(train, labelCol, textCol)
    cnt.join(labelStats(train, labelCol, textCol), Seq("label"))
      .select(col("label"), col("token"), col("n"),
        (log(col("n").cast("double") + lit(1.0)) - col("log_denom")).as("log_cond"))
  }

  /** (label, token, n) occurrence counts over the training slice — the
    * whole trained state. One explode + one hash aggregate.
    */
  private[ops] def tokenCounts(
      train: DataFrame, labelCol: String, textCol: String): DataFrame =
    train
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("label", "token")
      .agg(count(lit(1)).as("n"))

  /** (label, log_prior, log_denom): |labels| rows, broadcast at score
    * time. Vocabulary size and doc totals are 1-row aggregates crossed
    * in — no driver-side count, the whole model stays a lazy plan.
    */
  private[ops] def labelStats(
      train: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val cnt = tokenCounts(train, labelCol, textCol)
    val vocab = cnt.select("token").distinct()
      .agg(count(lit(1)).cast("double").as("__v"))
    val nDocs = train.agg(count(lit(1)).cast("double").as("__n"))
    cnt.groupBy("label").agg(sum(col("n")).cast("double").as("__t"))
      .join(
        train.groupBy(col(labelCol).as("label"))
          .agg(count(lit(1)).cast("double").as("__nd")),
        Seq("label"))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nDocs))
      .select(col("label"),
        log(col("__nd") / col("__n")).as("log_prior"),
        log(col("__t") + col("__v")).as("log_denom"))
  }

  /** Scores `docs` against the model trained on `train` and keeps the
    * argmax label per doc: (idCol, pred_label, score). Ranking compares
    * the 4-dp-ROUNDED score (FP sum-order noise absorbed), ties broken
    * by label — deterministic cross-engine.
    *
    * The smoothed log-likelihood folds per token:
    * score(d,l) = prior_l + Σ_{occ: t∈V} (ln(c(t,l)+1) − ln(T_l+V)), so
    * each vocabulary token carries a PRE-AGGREGATED per-label contribution
    * array (vocab × |labels| rows — still vocabulary-bounded). The scored
    * corpus is then touched exactly ONCE: one broadcast join on token,
    * one explode over |labels| entries, one (doc, label) hash aggregate.
    * The earlier two-leg form (separate in-vocab count + hit sum) read
    * the corpus scan twice because each leg shuffled differently.
    */
  def predict(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: DataFrame,
      labelCol: String,
      trainTextCol: String): DataFrame = {
    val cnt = tokenCounts(train, labelCol, trainTextCol)
    val stats = labelStats(train, labelCol, trainTextCol)
    // dense-in-label contribution per vocabulary token: missing (l, t)
    // count rows contribute ln(0+1) − log_denom = −log_denom
    val dense = cnt.select("token").distinct()
      .crossJoin(broadcast(stats.select("label", "log_denom")))
      .join(cnt, Seq("label", "token"), "left")
      .withColumn("__contrib",
        log(coalesce(col("n"), lit(0L)).cast("double") + lit(1.0)) - col("log_denom"))
    val tokContribs = dense.groupBy("token")
      .agg(collect_list(struct(col("label"), col("__contrib"))).as("__cs"))
    val toks = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val sums = toks
      .join(broadcast(tokContribs), Seq("token"))
      .select(col("id"), explode(col("__cs")).as("__c"))
      .groupBy(col("id"), col("__c.label").as("label"))
      .agg(sum(col("__c.__contrib")).as("__sum"))
    val frame = docs.select(col(idCol).as("id"))
      .crossJoin(broadcast(stats))
      .join(sums, Seq("id", "label"), "left")
      .withColumn("score", round(
        col("log_prior") + coalesce(col("__sum"), lit(0.0)), 4))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("label").asc)
    frame.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("id").as(idCol), col("label").as("pred_label"), col("score"))
  }
}
