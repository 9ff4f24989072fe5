package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline retrieval-quality evaluation — the gate a RAG / search
  * pipeline runs before promoting a new index or fusion config: given a
  * ranked RUN (query, doc, rank) and graded relevance judgments QRELS
  * (query, doc, grade ≥ 1), score each query with the standard public
  * metrics (TREC practice; Järvelin & Kekäläinen 2002 for nDCG):
  *
  *   recall@k = |run∩rel| / |rel|           (coverage of the judged set)
  *   MRR      = 1 / rank of the first relevant hit (0 if none)
  *   nDCG@k   = DCG@k / IDCG@k,  DCG = Σ (2^grade − 1) / log2(rank + 1)
  *
  * IDCG ranks the query's judged grades best-first, capped at k — so a
  * query with fewer than k judged docs can still reach 1.0.
  *
  * Scale shape: the run is top-k-bounded PER QUERY by construction (it
  * came out of a retrieval leg) and qrels are judgment-sized, so every
  * join here is candidate-list × judgment-list on the query key — one
  * key shuffle of k-row groups, never a corpus. Metrics round 4 dp
  * (repo determinism convention); fully SQL-expressible → full DuckDB
  * oracle.
  */
object RetrievalEval {

  /** Per-query metrics: (qCol, n_rel, n_hit, recall_at_k, mrr, ndcg_at_k).
    * `run` must carry (qCol, docCol, rank) with dense 1-based ranks —
    * the shape every retrieval leg in this repo emits; rows with
    * rank > k are ignored. `qrels` carries (qCol, docCol, gradeCol > 0);
    * unjudged run docs score grade 0 (standard pooling convention).
    * Queries present in the run but with NO judged docs are dropped —
    * a metric over zero judgments is undefined, not zero.
    */
  def evaluate(
      run: DataFrame,
      qrels: DataFrame,
      qCol: String,
      docCol: String,
      gradeCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val r = run.select(col(qCol), col(docCol), col("rank").cast("bigint").as("rank"))
      .filter(col("rank") <= k)
    val j = qrels.select(col(qCol), col(docCol),
        col(gradeCol).cast("double").as("__g"))
      .filter(col("__g") > 0)
    // per-query judgment stats: size and the ideal DCG over the k best
    // grades (a bounded collect_list per query — judgment lists are
    // assessor-sized by construction, the same bound TREC pooling has)
    val ideal = j.groupBy(col(qCol))
      .agg(count(lit(1)).as("n_rel"), collect_list(col("__g")).as("__gs"))
      .select(col(qCol), col("n_rel"),
        aggregate(
          zip_with(
            slice(array_sort(col("__gs"), (a, b) => when(a > b, -1).when(a < b, 1).otherwise(0)), 1, k),
            sequence(lit(1), least(size(col("__gs")), lit(k))),
            (g, pos) => (pow(lit(2.0), g) - 1.0) / log2(pos.cast("double") + 1.0)),
          lit(0.0), (acc, x) => acc + x).as("__idcg"))
    val scored = r.join(j, Seq(qCol, docCol), "left")
      .withColumn("__rel", when(col("__g").isNotNull, 1L).otherwise(0L))
      .groupBy(col(qCol))
      .agg(
        sum(col("__rel")).as("n_hit"),
        min(when(col("__rel") === 1, col("rank"))).as("__first"),
        sum(when(col("__g").isNotNull,
            (pow(lit(2.0), col("__g")) - 1.0) /
              log2(col("rank").cast("double") + 1.0))
          .otherwise(lit(0.0))).as("__dcg"))
    ideal.join(scored, Seq(qCol), "left")
      .select(col(qCol),
        col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_rel"), 4)
          .as(s"recall_at_$k"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 4).as("mrr"),
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 4)
          .as(s"ndcg_at_$k"))
  }
}
