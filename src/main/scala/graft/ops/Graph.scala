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

  // per-round checkpoint blocks are freed once the successor round is
  // materialized (see Checkpoints.free — Dataset.unpersist is a no-op on
  // checkpointed frames, and retaining every round peaked the ×100 probe
  // at 62–68 GB heap)
  private def freeLocalCheckpoint(df: DataFrame): Unit = Checkpoints.free(df)

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
      undirected: Boolean = true): DataFrame =
    pagerankFrom(edges0, None, srcCol, dstCol, iterations, damping, undirected)

  /** Incremental PageRank maintenance — the [[graft.etl.Loads.mergeAggregate]]
    * idea applied to the graph family: instead of recomputing the merged
    * graph from the uniform vector, WARM-START the power iteration from
    * the PREVIOUS run's rank vector (`prevRanks`: (id, rank)). Power
    * iteration converges geometrically at rate `damping` from ANY
    * probability vector, so starting ‖r_prev − r*‖ close (a small edge
    * delta moves the fixpoint little) needs a small number of rounds
    * where a cold start needs ~log(ε)/log(damping) — the daily-crawl
    * maintenance pattern (publicly analyzed as "aggregation/restart"
    * incremental PageRank, e.g. Langville & Meyer 2006 ch. 10).
    *
    * The warm vector adapts to the merged graph before iterating:
    * vertices NEW in the merged edge set (absent from `prevRanks`) enter
    * at the uniform 1/N; vertices that left the graph drop; the vector
    * renormalizes to Σ = 1 (one bounded scalar aggregate, the same
    * driver-literal family as the N count). Rounds are IDENTICAL to
    * [[pagerank]] — same two key shuffles, same dangling handling, same
    * per-round localCheckpoint — so the maintained result is the same
    * deterministic arithmetic an unrolled SQL replay computes.
    */
  def pagerankWarmStart(
      edges0: DataFrame,
      prevRanks: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 3,
      damping: Double = 0.85,
      undirected: Boolean = true): DataFrame =
    pagerankFrom(edges0, Some(prevRanks), srcCol, dstCol, iterations, damping,
      undirected)

  private def pagerankFrom(
      edges0: DataFrame,
      warmStart: Option[DataFrame],
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double,
      undirected: Boolean): DataFrame = {
    val fwd = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val dir = if (undirected)
      fwd.unionByName(edges0.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    else fwd
    // pin the distinct edge set through the SETUP phase: edgesDeg, nodes
    // and (directed) dangling each materialize in their own action, and
    // without the persist every action re-ran the upstream join + the
    // mirror-union + the distinct shuffle from the raw tables (profiled:
    // the 11 MB edge shuffle re-built 2-3x per pagerank call at sf0.1);
    // released below once the per-round frames are materialized
    val edges = dir.distinct().persist()
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
    // undirected mirroring makes every vertex a source BY CONSTRUCTION —
    // skip the sink probe (a left-anti + isEmpty job per call) entirely
    // instead of paying it to learn what the mirror already guarantees
    val dangling =
      if (undirected) null
      else nodes
        .join(edges.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
        .persist()
    // count (not isEmpty) so the dangling cache is FULLY materialized off
    // the pinned edge set — a limit-1 probe caches only the partitions it
    // touched, and the per-round dm aggregate would recompute the rest
    // from the raw tables once `edges` is released below
    val hasDangling = !undirected && dangling.count() > 0
    // one scalar to the driver (same bounded-collect family as the
    // codebook training): folding N in as a literal keeps the teleport
    // term out of the per-round plan — a broadcast-aggregate form re-ran
    // a one-row job every round
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    // materialize the per-round edge frame off the cache (one cheap count
    // against pinned inputs), then release the raw edge set — every setup
    // frame now holds its own blocks
    edgesDeg.count()
    edges.unpersist()

    var ranks = warmStart match {
      case None =>
        nodes.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint()
      case Some(prev) =>
        // complete (new vertices at 1/N), restrict (departed drop via the
        // node join), renormalize to a probability vector — the scalar
        // total is one bounded driver value, like the N count above
        val seeded = nodes
          .join(prev.select(col("id"), col("rank").as("__pr")), Seq("id"), "left")
          .select(col("id"), coalesce(col("__pr"), lit(1.0 / n)).as("rank"))
          .localCheckpoint()
        val tot = seeded.agg(sum(col("rank"))).head().getDouble(0)
        val normalized = seeded
          .select(col("id"), (col("rank") / lit(tot)).as("rank"))
          .localCheckpoint()
        freeLocalCheckpoint(seeded)
        normalized
    }
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
      // for long chains; the round cost shape is identical.) The PREVIOUS
      // round's blocks are freed once the new round is materialized —
      // rounds retain one live vector, not `iterations` of them.
      val next = update.localCheckpoint()
      freeLocalCheckpoint(ranks)
      ranks = next
      i += 1
    }
    edgesDeg.unpersist()
    nodes.unpersist()
    if (dangling != null) dangling.unpersist()
    ranks
  }

  /** Personalized PageRank (Haveliwala 2002, "Topic-Sensitive PageRank";
    * public method): the [[pagerank]] power iteration with the teleport —
    * and the dangling-mass redistribution — restarting into a SEED SET
    * instead of the uniform distribution:
    *
    * `pr_{t+1}(v) = (1-d)·s(v) + d·(Σ_{u→v} pr_t(u)/outdeg(u) + dm·s(v))`
    *
    * where `s(v) = 1/|S|` for seed vertices and 0 otherwise, and
    * `pr_0 = s`. The result is the stationary relevance of every vertex
    * RELATIVE to the seeds (Σ rank = 1) — the "documents related to this
    * trusted set" signal crawl-curation pipelines use for seed-expanded
    * quality scoring.
    *
    * Scale shape identical to [[pagerank]]: the seed weight attaches to
    * the node frame ONCE (left join against the seed ids, no driver
    * list); each round is the same two key shuffles + one-row dangling
    * aggregate; lineage truncated per round with localCheckpoint.
    * Vertices unreachable from the seeds converge to rank 0 — they are
    * kept in the output (a pruned output would hide the reachability
    * boundary the caller usually wants to see).
    */
  def personalizedPagerank(
      edges0: DataFrame,
      seeds: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      seedIdCol: String = "id",
      iterations: Int = 10,
      damping: Double = 0.85,
      undirected: Boolean = false): DataFrame = {
    val fwd = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val dir = if (undirected)
      fwd.unionByName(edges0.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    else fwd
    // pinned through setup like [[pagerankFrom]]: edgesDeg / nodes /
    // dangling each materialize in their own action and would otherwise
    // re-run the upstream join + distinct per action; released below
    val edges = dir.distinct().persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("d"))
    val edgesDeg = edges.join(deg, Seq("src")).persist()
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct().persist()
    val dangling = nodes
      .join(edges.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .persist()
    // count (not isEmpty): fully materialize the dangling cache — see
    // [[pagerankFrom]]
    val hasDangling = dangling.count() > 0
    // seed weights attach to the node frame once; seeds outside the graph
    // carry no edges and are ignored (they could only ever hold teleport
    // mass, which would break Σ rank = 1 over the GRAPH's vertices)
    val seedIds = seeds.select(col(seedIdCol).as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi").persist()
    val k = seedIds.count().toDouble
    require(k > 0, "personalizedPagerank needs at least one seed vertex present in the graph")
    val nodesW = nodes
      .join(seedIds.withColumn("__isSeed", lit(true)), Seq("id"), "left")
      .select(col("id"),
        when(col("__isSeed"), lit(1.0 / k)).otherwise(lit(0.0)).as("sv"))
      .persist()
    // materialize the per-round edge frame off the cache, then release
    // the raw edge set (see [[pagerankFrom]])
    edgesDeg.count()
    edges.unpersist()

    var ranks = nodesW.select(col("id"), col("sv").as("rank")).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("d")).as("contrib"))
      val update =
        if (hasDangling) {
          val dm = ranks.join(dangling, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
          nodesW.join(contrib, Seq("id"), "left")
            .crossJoin(broadcast(dm))
            .select(col("id"), col("sv"),
              (lit(1.0 - damping) * col("sv") + lit(damping) *
                (coalesce(col("contrib"), lit(0.0)) + col("__dm") * col("sv"))).as("rank"))
        } else {
          nodesW.join(contrib, Seq("id"), "left")
            .select(col("id"), col("sv"),
              (lit(1.0 - damping) * col("sv") +
                lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        }
      val next = update.select("id", "rank").localCheckpoint()
      freeLocalCheckpoint(ranks)
      ranks = next
      i += 1
    }
    edgesDeg.unpersist()
    nodes.unpersist()
    dangling.unpersist()
    seedIds.unpersist()
    nodesW.unpersist()
    ranks
  }

  /** Global triangle count by degree-ordered orientation (the
    * compact-forward / Chiba–Nishizeki counting order; public method —
    * Schank & Wagner 2005 analyze exactly this variant). Each undirected
    * edge orients from its lower-(degree, id) endpoint to the higher one;
    * every triangle then has exactly ONE vertex with two out-edges into
    * it, so counting oriented wedges closed by an oriented edge counts
    * each triangle exactly once.
    *
    * Scale: the orientation caps every vertex's out-degree at O(√|E|)
    * (a vertex keeps only neighbors of equal-or-larger degree), so the
    * wedge frame — the only quadratic term — is Σ outdeg², the minimum
    * any join-based counter achieves; the closing check is a semi-join
    * of wedges against the oriented edge table on its (src, dst) key.
    * High-degree hubs, the power-law killer for the naive 3-way join,
    * contribute only IN-edges and generate no wedges.
    *
    * Returns one row: (n_vertices, n_edges, n_triangles).
    */
  /** Canonical undirected edges, per-vertex degrees, and the persisted
    * degree-ordered orientation — the shared machinery of
    * [[triangleCount]] and [[clusteringCoefficients]]. Caller unpersists
    * the returned orientation.
    */
  private def orientedEdges(
      edges0: DataFrame,
      srcCol: String,
      dstCol: String): (DataFrame, DataFrame, DataFrame) = {
    // canon and deg are pinned too: the callers' closing aggregates
    // (n_vertices / n_edges counts, the lcc deg join) each materialize in
    // their own action and would re-run the canonicalization shuffle from
    // the raw tables per action; callers unpersist all three
    val canon = edges0
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().persist()
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg")).persist()
    // orient a→b iff (deg(a), a) < (deg(b), b); carry the head's (deg, id)
    // so the wedge join below can order its two heads without re-joining
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("vdg"))
      .persist()
    (canon, deg, oriented)
  }

  /** Closed oriented wedges (u, w1, w2) — one row per triangle, each
    * triangle appearing exactly once (at its unique two-out-edge
    * vertex u).
    */
  private def closedWedges(oriented: DataFrame): DataFrame = {
    val e1 = oriented.select(col("u"), col("v").as("w1"), col("vdg").as("wd1"))
    val e2 = oriented.select(col("u"), col("v").as("w2"), col("vdg").as("wd2"))
    e1.join(e2, Seq("u"))
      .filter(col("wd1") < col("wd2") ||
        (col("wd1") === col("wd2") && col("w1") < col("w2")))
      .join(oriented.select(col("u").as("w1"), col("v").as("w2")),
        Seq("w1", "w2"), "left_semi")
      .select("u", "w1", "w2")
  }

  def triangleCount(
      edges0: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val (canon, deg, oriented) = orientedEdges(edges0, srcCol, dstCol)
    val out = closedWedges(oriented).agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_vertices"))))
      .crossJoin(broadcast(canon.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_vertices"), col("n_edges"), col("n_triangles"))
    val res = out.localCheckpoint() // materialize before unpersisting the orientation
    oriented.unpersist()
    canon.unpersist()
    deg.unpersist()
    res
  }

  /** Per-vertex triangle participation and LOCAL CLUSTERING COEFFICIENT
    * (Watts & Strogatz 1998, "Collective dynamics of small-world
    * networks"; public method): `lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))`
    * — the fraction of a vertex's neighbor pairs that are themselves
    * connected, the standard cohesion signal (spam-farm detection,
    * community quality) a link-graph curation pass scores.
    *
    * Same oriented wedge frame as [[triangleCount]] — each closed wedge
    * credits its THREE corners through one map-side explode, so the
    * per-vertex extension adds one explode + one count shuffle, never a
    * second quadratic term. Vertices in no triangle report 0; degree-1
    * vertices have no neighbor pair and report 0 by convention.
    *
    * Returns (id, deg, triangles, lcc), lcc rounded to 6 dp.
    */
  def clusteringCoefficients(
      edges0: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val (canon, deg, oriented) = orientedEdges(edges0, srcCol, dstCol)
    val tri = closedWedges(oriented)
      .select(explode(array(col("u"), col("w1"), col("w2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val out = deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("dg").as("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("deg") >= 2,
          round(lit(2.0) * col("triangles") / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)))
    val res = out.localCheckpoint()
    oriented.unpersist()
    canon.unpersist()
    deg.unpersist()
    res
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert & Kumara 2007), made fully deterministic: every vertex starts
    * labeled with its own id; each round it adopts the label most frequent
    * among its neighbors PLUS ITSELF (the self-vote is the standard
    * oscillation damper for bipartite structure under synchronous
    * updates), ties broken by the SMALLEST label. Fixed `iterations`
    * rounds — no convergence test, so the result is a pure function of
    * (edges, iterations) and a plain (if 5×-nested) SQL oracle can replay
    * it round for round.
    *
    * Edges are made undirected + distinct internally (simple graph —
    * neighbor votes are per neighbor, not per parallel edge). Per round:
    * one labels-to-edges join keyed by vertex, one (id, label) count
    * aggregate, one per-vertex argmax via a single `max(struct)` — no
    * window, no driver involvement; `localCheckpoint` per round keeps the
    * lineage flat (the iterative-loop convention of this file).
    *
    * Returns (id, label) — vertices sharing a label are one community.
    */
  def labelPropagation(
      edges0: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val und = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges0.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    for (_ <- 1 to iterations) {
      val votes = und.join(labels, und("src") === labels("id"))
        .select(und("dst").as("id"), col("label"))
        .unionByName(labels.select(col("id"), col("label")))
        .groupBy("id", "label").agg(count(lit(1)).as("cnt"))
      val next = votes
        // min over (-cnt, label): highest count, then smallest label —
        // one aggregate, no per-vertex window. Negating the COUNT (not
        // the label) keeps the tie-break valid for any orderable vertex
        // id type: negating a string label would cast to double and
        // null every label after round 1
        .groupBy("id")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("lb"))).as("m"))
        .select(col("id"), col("m.lb").as("label"))
        .localCheckpoint()
      // Dataset.unpersist() is a no-op on a checkpointed frame — free the
      // round's blocks through the RDD (see freeLocalCheckpoint)
      freeLocalCheckpoint(labels)
      labels = next
    }
    freeLocalCheckpoint(und)
    labels
  }

  /** Degree distribution of the undirected graph: (degree, n_vertices),
    * plus each bucket's share — the first diagnostic run on any graph
    * before choosing partitioning (a heavy right tail ⇒ salt the hub
    * joins; [[pagerank]]'s dangling handling ⇒ degree-0 never occurs
    * here since isolated vertices have no edge row). Uses the same
    * undirected-distinct edge semantics as [[labelPropagation]].
    *
    * Scale: two aggregates — per-vertex degree (vertex-keyed shuffle),
    * then the histogram (degree-keyed; rows = distinct degrees, which
    * grows like the max degree, never like the data). The share divides
    * by a broadcast 1-row total.
    */
  def degreeHistogram(
      edges0: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges0.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_vertices"))
    hist.crossJoin(broadcast(hist.agg(sum("n_vertices").as("__tot"))))
      .select(col("degree"), col("n_vertices"),
        round(col("n_vertices") / col("__tot").cast("double"), 6).as("share"))
  }
}
