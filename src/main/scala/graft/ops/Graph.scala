package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality over an edge table — the web-graph quality signal
  * of large crawl-curation pipelines (PageRank-family scores are a standard
  * document-quality / spam feature for pretraining corpora; Page, Brin,
  * Motwani, Winograd, "The PageRank Citation Ranking", 1999).
  *
  * The reference has no graph surface (SURVEY.md §2 — relational ETL only);
  * this extends the north-star LLM-pipeline operators like the dedup
  * connected-components resolver ([[Dedup.connectedComponents]]), with which
  * it shares the iterate-join-aggregate shape.
  */
object Graph {

  /** Power-iteration PageRank over an edge list.
    *
    * `pr_{t+1}(v) = (1-d)/N + d * Σ_{u→v} pr_t(u) / outdeg(u)`
    *
    * Scale shape: the edge table is joined per round on `src` against the
    * node-sized rank frame, then aggregated on `dst` — two key shuffles of
    * (id, double) pairs per round, never wider. Degrees are attached to the
    * edges ONCE up front and the widened edge frame is persisted, so each
    * round reuses the same materialized, already-partitioned edges (a
    * 100 TB edge table shuffles once, not `iterations` times). N and the
    * teleport term ride a broadcast one-row aggregate — no driver collect.
    * Ranks are persisted per round and the previous round unpersisted,
    * truncating the iterative lineage exactly like
    * [[Dedup.connectedComponents]].
    *
    * With `undirected = true` every edge is mirrored, so no vertex is
    * dangling. For directed graphs, vertices with no out-edges (sinks)
    * get the standard dangling-mass redistribution: their rank mass is
    * spread uniformly (`+ d · danglingMass / N` inside the damping term),
    * so the result is a proper probability distribution (Σ rank = 1) in
    * both modes. The per-round dangling mass is a one-row aggregate over
    * the (static, precomputed) sink set, broadcast back into the update —
    * no driver collect; when the sink set is empty (always true
    * undirected) the term is skipped entirely and the round plan is
    * unchanged.
    *
    * Returns (id, rank) for every vertex incident to an edge — sources
    * AND sinks (a pure-sink vertex appears with its teleport+inflow
    * rank).
    */
  def pagerank(
      edges0: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 10,
      damping: Double = 0.85,
      undirected: Boolean = true): DataFrame = {
    val fwd = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val dir = if (undirected)
      fwd.unionByName(edges0.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    else fwd
    val edges = dir.distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("d"))
    // the deg join's output partitioning is hash(src); persisting it means
    // every round's rank join reuses this layout — the edge table is
    // shuffled ONCE for the whole power iteration, and at this node/edge
    // ratio AQE broadcasts the (node-sized) rank side into it
    val edgesDeg = edges.join(deg, Seq("src")).persist()
    // nodes = src ∪ dst: a pure-sink vertex (dst only) must still get a
    // rank row and count in N — building from src alone silently dropped
    // sinks on directed graphs
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct().persist()
    // the static sink set (no out-edges); its per-round mass redistributes
    val dangling = nodes
      .join(edges.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .persist()
    val hasDangling = !dangling.isEmpty
    // one scalar to the driver (same bounded-collect family as the
    // codebook training): folding N in as a literal keeps the teleport
    // term out of the per-round plan — a broadcast-aggregate form re-ran
    // a one-row job every round
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n

    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("d")).as("contrib"))
      val update =
        if (hasDangling) {
          // one-row dangling-mass aggregate, broadcast into the update —
          // stays inside the round's single job, never a driver value
          val dm = ranks.join(dangling, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
          nodes.join(contrib, Seq("id"), "left")
            .crossJoin(broadcast(dm))
            .select(col("id"),
              (lit(teleport) + lit(damping) *
                (coalesce(col("contrib"), lit(0.0)) + col("__dm") / lit(n))).as("rank"))
        } else {
          nodes.join(contrib, Seq("id"), "left")
            .select(col("id"),
              (lit(teleport) +
                lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        }
      // localCheckpoint (eager) TRUNCATES the plan to a materialized leaf:
      // with plain persist() each round's logical plan still embedded every
      // prior round, and Catalyst re-analysis grew superlinearly — measured
      // 0.8 s → 21 s per round by round 10 on the sf0.1 graph; truncated,
      // rounds stay flat. (localCheckpoint trades re-computability on
      // executor loss for speed — on a production cluster pass a reliable
      // checkpoint dir via spark.sparkContext.setCheckpointDir + .checkpoint
      // for long chains; the round cost shape is identical.)
      ranks = update.localCheckpoint()
      i += 1
    }
    edgesDeg.unpersist()
    nodes.unpersist()
    dangling.unpersist()
    ranks
  }
}
