package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.PinnedOracles
import graft.etl.{FileLoads, Loads, Sanitize, Tables, Windows}
import graft.ops.{Bpe, Dedup, Multimodal, Pca, Similarity, TextAnalysis}
import graft.schema.Ddl
import graft.queries.Fixtures._
import graft.queries.OracleCtes._

/** graph analytics over the events interaction graph: PageRank family,
  * triangles, communities, degree profiles.
  *
  * One registry slice of [[graft.SparkEntry]] (split r14 — the single
  * 6.6k-line file was the bottleneck): `queries` feeds the driver's
  * Verify/Bench maps, `oracles` the DuckDB compare. Keys and bodies are
  * unchanged from the pre-split registry.
  */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Link-graph centrality (north-star: web-graph quality signal for
    // crawl curation). The customer↔supplier trade graph stands in for a
    // host-link graph; 10 power-iteration rounds at damping 0.85. Each
    // round is two key shuffles over (id, double) pairs; the edge table
    // shuffles once up front (degree attach + persist), not per round.
    "graph_pagerank" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      // long vertex ids (customer = 2k, supplier = 2k+1): the graph is
      // bipartite so the parity encoding is collision-free, and long keys
      // shuffle/compare far cheaper than concatenated strings
      val e = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.ops.Graph.pagerank(e, iterations = 10, damping = 0.85)
        .select(col("id"), round(col("rank"), 8).as("rank"))
        .orderBy("id")
    }),


    // Incremental PageRank maintenance (the L8 merge-aggregate idea on
    // the graph family): ranks computed on the 90% base graph (orders
    // with o_orderkey % 10 != 0) WARM-START 3 power rounds on the full
    // merged edge set — new vertices enter at 1/N, the vector
    // renormalizes, rounds are the identical two-key-shuffle arithmetic
    // — instead of a cold 10-round recompute. Full DuckDB oracle
    // (base-3 + warm-3 unrolled CTEs); the convergence advantage over a
    // cold start is first-principles-asserted in GraphSpec.
    "graph_pagerank_incremental" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val all = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"),
          (col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val base = all.filter(col("o_orderkey") % 10 =!= 0).select("src", "dst")
      val prev = graft.ops.Graph.pagerank(base, iterations = 3, damping = 0.85)
      graft.ops.Graph.pagerankWarmStart(all.select("src", "dst"), prev,
          iterations = 3, damping = 0.85)
        .select(col("id"), round(col("rank"), 8).as("rank"))
        .orderBy("id")
    }),


    // DIRECTED PageRank with dangling-mass redistribution: customer →
    // supplier edges make every supplier a pure sink, so each round its
    // mass re-spreads uniformly (+ d·dm/N) — Σ rank stays exactly 1 (a
    // proper distribution, asserted in GraphSpec). The oracle replays the
    // 5-round fixpoint as an unrolled CTE including the dangling term.
    "graph_pagerank_directed" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val e = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.ops.Graph.pagerank(e, iterations = 5, damping = 0.85,
          undirected = false)
        .select(col("id"), round(col("rank"), 8).as("rank"))
        .orderBy("id")
    }),


    // Personalized PageRank (Haveliwala 2002): teleport AND dangling mass
    // restart into the seed customers (ids < 50, i.e. custkey < 25) —
    // stationary relevance RELATIVE to a trusted set, the seed-expansion
    // quality signal for crawl curation. Σ rank = 1 (GraphSpec); rounds
    // share graph_pagerank's two-key-shuffle shape; the oracle replays
    // the 5-round fixpoint as an unrolled CTE with the seed vector.
    "graph_ppr" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val e = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val seeds = Tables.customer(s, dir)
        .filter(col("c_custkey") < 25)
        .select((col("c_custkey") * 2).as("id"))
      graft.ops.Graph.personalizedPagerank(e, seeds, iterations = 5,
          damping = 0.85, undirected = false)
        .select(col("id"), round(col("rank"), 8).as("rank"))
        .orderBy("id")
    }),


    // Global triangle count over the supplier co-order graph (suppliers
    // sharing a high-quantity order), by degree-ordered orientation
    // (Schank & Wagner 2005 compact-forward): each edge orients toward
    // the higher-(degree, id) endpoint, capping every out-degree at
    // O(√|E|) — the wedge join survives power-law hubs, which generate
    // only in-edges. Full DuckDB oracle replays the same orientation.
    "graph_triangles" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val e = pairs.as("x").join(pairs.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.ops.Graph.triangleCount(e)
    }),


    // Per-supplier local clustering coefficient over the same co-order
    // graph (Watts–Strogatz): each closed wedge credits its three
    // corners via one explode — the per-vertex extension of
    // graph_triangles with no second quadratic term. Full SQL oracle.
    "graph_clustering_coeff" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val e = pairs.as("x").join(pairs.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.ops.Graph.clusteringCoefficients(e)
        .orderBy("id")
    }),


    // Community detection over the customer–supplier graph: 5 rounds of
    // deterministic synchronous label propagation (self-vote damps the
    // bipartite oscillation, min-label ties — Graph.labelPropagation),
    // reported as community sizes. Fixed round count makes the fixpoint
    // a pure function of the edges, so the oracle replays all 5 rounds
    // as nested SQL (the graph_pagerank unrolled-loop precedent).
    "graph_communities" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val e = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.ops.Graph.labelPropagation(e, iterations = 5)
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("community")
    }),


    // Degree histogram of the customer–supplier graph (ops/Graph
    // .degreeHistogram) — the hub/tail diagnostic behind salting
    // decisions; histogram rows grow like the max degree, never the data.
    "graph_degree_histogram" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val e = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.ops.Graph.degreeHistogram(e).orderBy("degree")
    }),
  )

  val oracles: Map[String, String] = Map(

    "graph_pagerank" -> {
      val head =
        "WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, " +
          "l_suppkey * 2 + 1 AS dst " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
        "nodes AS (SELECT DISTINCT src AS id FROM edges), " +
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), " +
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src), " +
        "pr0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes, nn)"
      val loop = (1 to 10).map(i =>
        s"pr$i AS (SELECT nd.id, 0.15 / nn.n + 0.85 * coalesce(c.s, 0) AS r " +
          "FROM nodes nd CROSS JOIN nn LEFT JOIN " +
          "(SELECT e.dst, sum(p.r / dg.d) AS s " +
          s"FROM edges e JOIN pr${i - 1} p ON p.id = e.src " +
          "JOIN deg dg ON dg.src = e.src GROUP BY e.dst) c ON c.dst = nd.id)")
        .mkString(", ", ", ", "")
      head + loop + " SELECT id, round(r, 8) AS rank FROM pr10 ORDER BY id"
    },


    // 5 LPA rounds unrolled: per round, one neighbor-vote join + the
    // self-vote UNION ALL, then the (cnt DESC, label ASC) argmax
    "graph_communities" -> {
      val head =
        "WITH be AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "edges AS (SELECT src, dst FROM be UNION ALL SELECT dst, src FROM be), " +
        "r0 AS (SELECT id, id AS label FROM (SELECT DISTINCT src AS id FROM edges) t)"
      val rounds = (1 to 5).map { i =>
        val p = s"r${i - 1}"
        s"c$i AS (SELECT id, label, CAST(sum(c) AS BIGINT) AS cnt FROM (" +
          s"SELECT e.dst AS id, l.label, count(*) AS c FROM edges e " +
          s"JOIN $p l ON e.src = l.id GROUP BY 1, 2 " +
          s"UNION ALL SELECT id, label, 1 FROM $p) u GROUP BY 1, 2), " +
          s"r$i AS (SELECT id, label FROM (SELECT id, label, " +
          "row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn " +
          s"FROM c$i) w WHERE rn = 1)"
      }.mkString(", ", ", ", "")
      head + rounds + " SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members " +
        "FROM r5 GROUP BY 1 ORDER BY community"
    },


    // base-graph 3-round ranks (orders % 10 <> 0), then the warm
    // start: completion at 1/N for new vertices, renormalization, and 3
    // identical rounds on the merged graph — unrolled exactly like
    // graph_pagerank's replay
    "graph_pagerank_incremental" -> {
      val head =
        "WITH b0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_orderkey % 10 <> 0), " +
        "eb AS (SELECT src, dst FROM b0 UNION SELECT dst, src FROM b0), " +
        "nb AS (SELECT DISTINCT src AS id FROM eb), " +
        "nnb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nb), " +
        "degb AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM eb GROUP BY src), " +
        "pb0 AS (SELECT id, 1.0 / nnb.n AS r FROM nb, nnb)"
      val baseLoop = (1 to 3).map(i =>
        s"pb$i AS (SELECT nd.id, 0.15 / nnb.n + 0.85 * coalesce(c.s, 0) AS r " +
          "FROM nb nd CROSS JOIN nnb LEFT JOIN " +
          "(SELECT e.dst, sum(p.r / dg.d) AS s " +
          s"FROM eb e JOIN pb${i - 1} p ON p.id = e.src " +
          "JOIN degb dg ON dg.src = e.src GROUP BY e.dst) c ON c.dst = nd.id)")
        .mkString(", ", ", ", "")
      val merge =
        ", m0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "em AS (SELECT src, dst FROM m0 UNION SELECT dst, src FROM m0), " +
        "nm AS (SELECT DISTINCT src AS id FROM em), " +
        "nnm AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nm), " +
        "degm AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM em GROUP BY src), " +
        "seed AS (SELECT nm.id, coalesce(p.r, 1.0 / nnm.n) AS r " +
          "FROM nm CROSS JOIN nnm LEFT JOIN pb3 p ON p.id = nm.id), " +
        "tot AS (SELECT sum(r) AS t FROM seed), " +
        "pw0 AS (SELECT id, r / tot.t AS r FROM seed, tot)"
      val warmLoop = (1 to 3).map(i =>
        s"pw$i AS (SELECT nd.id, 0.15 / nnm.n + 0.85 * coalesce(c.s, 0) AS r " +
          "FROM nm nd CROSS JOIN nnm LEFT JOIN " +
          "(SELECT e.dst, sum(p.r / dg.d) AS s " +
          s"FROM em e JOIN pw${i - 1} p ON p.id = e.src " +
          "JOIN degm dg ON dg.src = e.src GROUP BY e.dst) c ON c.dst = nd.id)")
        .mkString(", ", ", ", "")
      head + baseLoop + merge + warmLoop +
        " SELECT id, round(r, 8) AS rank FROM pw3 ORDER BY id"
    },


    // directed + dangling redistribution: same unrolled-CTE replay, with
    // edges NOT mirrored, nodes = src ∪ dst, and each round adding the
    // previous round's sink mass (dm) uniformly inside the damping term
    "graph_pagerank_directed" -> {
      val head =
        "WITH edges AS (SELECT DISTINCT o_custkey * 2 AS src, " +
          "l_suppkey * 2 + 1 AS dst " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges), " +
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), " +
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src), " +
        "sinks AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM edges)), " +
        "pr0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes, nn)"
      val loop = (1 to 5).map(i =>
        s"dm$i AS (SELECT coalesce(sum(p.r), 0) AS m FROM pr${i - 1} p " +
          "JOIN sinks s ON s.id = p.id), " +
        s"pr$i AS (SELECT nd.id, 0.15 / nn.n + 0.85 * (coalesce(c.s, 0) + dm$i.m / nn.n) AS r " +
          s"FROM nodes nd CROSS JOIN nn CROSS JOIN dm$i LEFT JOIN " +
          "(SELECT e.dst, sum(p.r / dg.d) AS s " +
          s"FROM edges e JOIN pr${i - 1} p ON p.id = e.src " +
          "JOIN deg dg ON dg.src = e.src GROUP BY e.dst) c ON c.dst = nd.id)")
        .mkString(", ", ", ", "")
      head + loop + " SELECT id, round(r, 8) AS rank FROM pr5 ORDER BY id"
    },


    // personalized teleport: the uniform 0.15/n term becomes 0.15·s(v)
    // and the dangling mass re-enters through s(v), not 1/n
    "graph_ppr" -> {
      val head =
        "WITH edges AS (SELECT DISTINCT o_custkey * 2 AS src, " +
          "l_suppkey * 2 + 1 AS dst " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges), " +
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src), " +
        "sinks AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM edges)), " +
        "sk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM nodes WHERE id % 2 = 0 AND id < 50), " +
        "sn AS (SELECT nd.id, CASE WHEN nd.id % 2 = 0 AND nd.id < 50 " +
          "THEN 1.0 / sk.k ELSE 0.0 END AS sv FROM nodes nd CROSS JOIN sk), " +
        "pr0 AS (SELECT id, sv AS r FROM sn)"
      val loop = (1 to 5).map(i =>
        s"dm$i AS (SELECT coalesce(sum(p.r), 0) AS m FROM pr${i - 1} p " +
          "JOIN sinks s ON s.id = p.id), " +
        s"pr$i AS (SELECT sn.id, 0.15 * sn.sv + 0.85 * (coalesce(c.s, 0) + dm$i.m * sn.sv) AS r " +
          s"FROM sn CROSS JOIN dm$i LEFT JOIN " +
          "(SELECT e.dst, sum(p.r / dg.d) AS s " +
          s"FROM edges e JOIN pr${i - 1} p ON p.id = e.src " +
          "JOIN deg dg ON dg.src = e.src GROUP BY e.dst) c ON c.dst = sn.id)")
        .mkString(", ", ", ", "")
      head + loop + " SELECT id, round(r, 8) AS rank FROM pr5 ORDER BY id"
    },


    // identical degree-ordered orientation on both sides: the wedge and
    // its closing edge key on the same (deg, id) total order
    "graph_triangles" ->
      ("WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45), " +
        "e AS (SELECT DISTINCT p1.l_suppkey AS a, p2.l_suppkey AS b FROM pairs p1 " +
        "JOIN pairs p2 ON p1.l_orderkey = p2.l_orderkey AND p1.l_suppkey < p2.l_suppkey), " +
        "deg AS (SELECT id, count(*) AS dg FROM " +
        "(SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY id), " +
        "o AS (SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b) THEN e.a ELSE e.b END AS u, " +
        "CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b) THEN e.b ELSE e.a END AS v, " +
        "CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b) THEN db.dg ELSE da.dg END AS vdg " +
        "FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b), " +
        "w AS (SELECT o1.v AS w1, o2.v AS w2 FROM o o1 JOIN o o2 " +
        "ON o1.u = o2.u AND (o1.vdg < o2.vdg OR (o1.vdg = o2.vdg AND o1.v < o2.v))), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w " +
        "WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.w1 AND o.v = w.w2)) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges, n_triangles FROM t"),


    // the per-vertex extension: corner-explode the closed wedges, then
    // lcc = 2·tri / (deg·(deg−1)) with the deg<2 → 0 convention
    "graph_clustering_coeff" ->
      ("WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45), " +
        "e AS (SELECT DISTINCT p1.l_suppkey AS a, p2.l_suppkey AS b FROM pairs p1 " +
        "JOIN pairs p2 ON p1.l_orderkey = p2.l_orderkey AND p1.l_suppkey < p2.l_suppkey), " +
        "deg AS (SELECT id, count(*) AS dg FROM " +
        "(SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY id), " +
        "o AS (SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b) THEN e.a ELSE e.b END AS u, " +
        "CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b) THEN e.b ELSE e.a END AS v, " +
        "CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND e.a < e.b) THEN db.dg ELSE da.dg END AS vdg " +
        "FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b), " +
        "w AS (SELECT o1.u, o1.v AS w1, o2.v AS w2 FROM o o1 JOIN o o2 " +
        "ON o1.u = o2.u AND (o1.vdg < o2.vdg OR (o1.vdg = o2.vdg AND o1.v < o2.v))), " +
        "wc AS (SELECT u, w1, w2 FROM w " +
        "WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.w1 AND o.v = w.w2)), " +
        "c AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM " +
        "(SELECT u AS id FROM wc UNION ALL SELECT w1 FROM wc UNION ALL SELECT w2 FROM wc) " +
        "GROUP BY id) " +
        "SELECT d.id, CAST(d.dg AS BIGINT) AS deg, coalesce(c.triangles, 0) AS triangles, " +
        "CASE WHEN d.dg >= 2 THEN round(2.0 * coalesce(c.triangles, 0) / (d.dg * (d.dg - 1)), 6) " +
        "ELSE 0.0 END AS lcc " +
        "FROM deg d LEFT JOIN c USING (id) ORDER BY d.id"),


    // same undirected-distinct edge set as the graph_pagerank oracle
    "graph_degree_histogram" ->
      ("WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "ed AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree FROM ed GROUP BY 1), " +
        "h AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices FROM deg GROUP BY 1) " +
        "SELECT degree, n_vertices, " +
        "round(n_vertices / CAST(sum(n_vertices) OVER () AS DOUBLE), 6) AS share " +
        "FROM h ORDER BY degree"),
  )
}
