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
    val toks = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    // occurrences of in-vocabulary tokens, per doc (the Σ's denominator leg)
    val nVocab = toks
      .join(broadcast(cnt.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("id").agg(count(lit(1)).cast("double").as("__nv"))
    // Σ_occ ln(c(t,l)+1) per (doc, label) — only existing model rows join
    val hits = toks
      .join(broadcast(cnt.withColumn("__lnc",
        log(col("n").cast("double") + lit(1.0)))
        .select("token", "label", "__lnc")), Seq("token"))
      .groupBy("id", "label").agg(sum(col("__lnc")).as("__hit"))
    val frame = docs.select(col(idCol).as("id"))
      .crossJoin(broadcast(stats))
      .join(hits, Seq("id", "label"), "left")
      .join(nVocab, Seq("id"), "left")
      .withColumn("score", round(
        col("log_prior") + coalesce(col("__hit"), lit(0.0)) -
          coalesce(col("__nv"), lit(0.0)) * col("log_denom"), 4))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("label").asc)
    frame.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("id").as(idCol), col("label").as("pred_label"), col("score"))
  }
}
