package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009; the standard hybrid-RAG combiner; public
  * method): merge the ranked candidate lists of heterogeneous retrieval
  * legs (BM25 keyword, embedding cosine, …) into one ranking by
  *
  *   rrf(q, d) = Σ_legs 1 / (c + rank_leg(q, d))
  *
  * with a document absent from a leg contributing nothing. Fusion is
  * RANK-based, so the legs' incomparable score scales (BM25 sums vs
  * cosine) never need calibration — the reason RRF is the default
  * combiner in practice.
  */
object Retrieval {

  /** Fuse retrieval legs, each a (qCol, docCol, rank) frame whose ranks
    * are dense 1-based per query (the shape [[TextAnalysis.bm25TopK]]
    * and [[Similarity.bruteForceTopK]] et al. already emit). Returns the
    * top `k` fused docs per query as (qCol, rank, docCol, rrf, n_legs) —
    * `n_legs` = how many legs proposed the doc, the agreement signal a
    * RAG pipeline logs. The fused score rounds to 6 dp BEFORE the
    * re-rank (the repo-wide determinism convention); ties break on doc
    * id ascending.
    *
    * Scale: every leg is already top-k-bounded PER QUERY, so the fused
    * frame is ≤ |legs|·k rows per query — the (q, doc) groupBy and the
    * per-query re-rank window operate on candidate lists, never a
    * corpus. No corpus re-scan, no score recomputation.
    */
  def rrfFuse(
      legs: Seq[DataFrame],
      qCol: String,
      docCol: String,
      k: Int,
      c: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(k >= 1, s"k must be >= 1: $k")
    require(c >= 0, s"c must be >= 0: $c")
    val contrib = legs
      .map(_.select(col(qCol), col(docCol), col("rank").cast("double").as("__r")))
      .reduce(_ unionByName _)
    val fused = contrib
      .groupBy(qCol, docCol)
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("__r"))), 6).as("rrf"),
        count(lit(1)).as("n_legs"))
    val w = Window.partitionBy(qCol).orderBy(col("rrf").desc, col(docCol).asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qCol), col("rank").cast("bigint").as("rank"),
        col(docCol), col("rrf"), col("n_legs"))
  }
}
