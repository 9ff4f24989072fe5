package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("iterative rounds FREE superseded checkpoint blocks (bounded live RDDs)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val edges = (0L until 200L).map(i => (i, (i * 7 + 1) % 200)).toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    val pr = Graph.pagerank(edges, iterations = 10)
    pr.write.format("noop").mode("overwrite").save()
    // 10 rounds must NOT retain 10 materialized vectors: everything but
    // the returned frame's own blocks (and the freed-but-not-yet-GC'd
    // entries Spark removes asynchronously) is unpersisted. Without the
    // Checkpoints.free calls this was `iterations + 1` new RDD ids.
    // Compared as an ID-SET diff, not raw sizes: unpersist(blocking =
    // false) is asynchronous, so another suite's PRIOR blocks vanishing
    // mid-window must not offset this test's growth. (RDDs newly
    // persisted by a CONCURRENT suite would still inflate the diff, but
    // this build runs forked suites sequentially — testForkedParallel is
    // off — so the ≤2 slack covers only our own async cleanup.)
    val grew = sc.getPersistentRDDs.keySet.diff(before).size
    assert(grew <= 2,
      s"live persistent RDDs grew by $grew (checkpoint leak)")
    // the returned frame still serves (its own blocks were NOT freed)
    assert(pr.count() == 200)
    graft.ops.Checkpoints.free(pr)
  }
  import spark.implicits._

  /** Driver-side reference power iteration over an adjacency map. */
  private def referencePr(
      edges: Seq[(String, String)],
      iters: Int,
      d: Double): Map[String, Double] = {
    val adj = (edges ++ edges.map(_.swap)).distinct
    val out = adj.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = out.keySet
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val contrib = adj.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / out(u).size }.sum).toMap
      pr = nodes.map(v => v -> ((1 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  private val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), // 4-cycle
    ("a", "c"), // chord: a and c get higher rank
    ("e", "a")) // pendant vertex

  test("matches a driver-side reference power iteration exactly") {
    val got = Graph.pagerank(edges.toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = referencePr(edges, 10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, id) }
  }

  test("undirected rank mass is conserved at 1 and hubs outrank pendants") {
    val got = Graph.pagerank(edges.toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(got("a") > got("e")) // degree-4 hub vs degree-1 pendant
    assert(got("c") > got("e"))
  }

  test("pagerankWarmStart: 3 warm rounds beat 3 cold rounds and land near the fixpoint") {
    // base graph = the crafted ring+chord+pendant; delta = two new edges
    // touching a NEW vertex f — the daily-crawl maintenance shape
    val merged = edges ++ Seq(("f", "a"), ("f", "c"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val prev = Graph.pagerank(edges.toDF("src", "dst"), iterations = 20)
    val warm = asMap(Graph.pagerankWarmStart(merged.toDF("src", "dst"), prev,
      iterations = 3))
    val cold3 = asMap(Graph.pagerank(merged.toDF("src", "dst"), iterations = 3))
    val fix = asMap(Graph.pagerank(merged.toDF("src", "dst"), iterations = 60))
    assert(warm.keySet == fix.keySet, "new vertex f must appear in the warm result")
    // warm start must be a probability vector and strictly closer to the
    // fixpoint than a cold start given the SAME number of rounds — the
    // whole point of maintaining instead of recomputing
    assert(math.abs(warm.values.sum - 1.0) < 1e-9)
    def dist(m: Map[String, Double]) = m.map { case (k, v) => math.abs(v - fix(k)) }.max
    assert(dist(warm) < dist(cold3),
      s"warm ${dist(warm)} not below cold ${dist(cold3)}")
    // the delta here is 1 new vertex on a 6-node graph (a ~17% graph
    // change); even so 3 warm rounds land within 2% absolute while a
    // cold start is ~3× further out
    assert(dist(warm) < 0.02, s"warm start too far from fixpoint: ${dist(warm)}")
    assert(dist(cold3) > 2 * dist(warm),
      s"cold ${dist(cold3)} should trail warm ${dist(warm)} clearly")
  }

  test("pagerankWarmStart: departed vertices drop, renormalization restores Σ = 1") {
    // prev carries a vertex z that no longer exists in the merged graph
    // plus inflated mass; the warm vector must renormalize over the
    // CURRENT node set only
    val prev = Seq(("a", 0.5), ("b", 0.5), ("z", 3.0)).toDF("id", "rank")
    val got = Graph.pagerankWarmStart(
        Seq(("a", "b"), ("b", "c")).toDF("src", "dst"), prev, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b", "c"), "z must not survive the merge")
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("duplicate and reversed input edges collapse (distinct semantics)") {
    val dup = edges ++ edges ++ edges.map(_.swap)
    val a = Graph.pagerank(dup.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Graph.pagerank(edges.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.foreach { case (id, r) => assert(math.abs(r - b(id)) < 1e-12, id) }
  }

  /** Driver-side reference for the DIRECTED form with dangling-mass
    * redistribution: sinks' mass re-spreads uniformly inside the damping
    * term each round.
    */
  private def referencePrDirected(
      edges: Seq[(String, String)],
      iters: Int,
      d: Double): Map[String, Double] = {
    val adj = edges.distinct
    val out = adj.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.flatMap(e => Seq(e._1, e._2)).toSet
    val sinks = nodes -- out.keySet
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val dm = sinks.toSeq.map(pr).sum
      val contrib = adj.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / out(u).size }.sum).toMap
      pr = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    pr
  }

  test("directed with sinks: sinks get rank rows, mass is conserved, reference matches") {
    // b and e are pure sinks (dst only): star a→{b,e}, chain c→d→e
    val dedges = Seq(("a", "b"), ("a", "e"), ("c", "d"), ("d", "e"))
    val got = Graph.pagerank(dedges.toDF("src", "dst"),
        iterations = 10, undirected = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b", "c", "d", "e"), "sinks must appear")
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      s"directed mass not conserved: ${got.values.sum}")
    val want = referencePrDirected(dedges, 10, 0.85)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, id) }
    // the double-fed sink outranks the singly-fed one
    assert(got("e") > got("b"))
  }

  /** Driver-side reference PPR: teleport and dangling mass restart into
    * the seed distribution.
    */
  private def referencePpr(
      edges: Seq[(String, String)],
      seeds: Set[String],
      iters: Int,
      d: Double): Map[String, Double] = {
    val adj = edges.distinct
    val out = adj.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.flatMap(e => Seq(e._1, e._2)).toSet
    val inGraphSeeds = seeds.intersect(nodes)
    val sv = nodes.map(v =>
      v -> (if (inGraphSeeds(v)) 1.0 / inGraphSeeds.size else 0.0)).toMap
    var pr = sv
    (0 until iters).foreach { _ =>
      val dm = nodes.filter(v => !out.contains(v)).iterator.map(pr).sum
      val contrib = adj.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / out(u).size }.sum).toMap
      pr = nodes.map(v =>
        v -> ((1 - d) * sv(v) + d * (contrib.getOrElse(v, 0.0) + dm * sv(v)))).toMap
    }
    pr
  }

  test("personalized pagerank: mass conserved, seeds dominate, reference matches, " +
      "unreachable vertices converge to 0") {
    // a,b seed component (a→b→a); c→d→e chain REACHED only from c (not a
    // seed); f→a feeds the seeds but is unreachable from them
    val dedges = Seq(("a", "b"), ("b", "a"), ("c", "d"), ("d", "e"), ("f", "a"))
    val got = Graph.personalizedPagerank(dedges.toDF("src", "dst"),
        Seq("a", "zzz-not-in-graph").toDF("id"), iterations = 12, undirected = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b", "c", "d", "e", "f"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass ${got.values.sum}")
    val want = referencePpr(dedges, Set("a", "zzz-not-in-graph"), 12, 0.85)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, id) }
    assert(got("a") > got("b") && got("b") > 0.0)
    // not reachable from the seed set → zero personalized rank
    Seq("c", "d", "e", "f").foreach(v => assert(got(v) == 0.0, s"$v should be 0"))
  }

  test("personalizedPagerank rejects an all-out-of-graph seed set") {
    intercept[IllegalArgumentException] {
      Graph.personalizedPagerank(Seq(("a", "b")).toDF("src", "dst"),
        Seq("nope").toDF("id"), iterations = 2)
    }
  }

  test("triangleCount matches brute force on a hand graph and ignores direction/duplicates") {
    // K4 on {a,b,c,d} (4 triangles) + pendant e + disconnected edge f-g;
    // fed with duplicates and mixed directions
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "c"), ("a", "e"), ("f", "g"))
    val out = Graph.triangleCount(e.toDF("src", "dst")).collect().head
    assert(out.getLong(0) == 7, s"vertices ${out.getLong(0)}") // a b c d e f g
    assert(out.getLong(1) == 8, s"edges ${out.getLong(1)}")    // K4=6 + ae + fg
    assert(out.getLong(2) == 4, s"triangles ${out.getLong(2)}")
    // triangle-free bipartite graph counts zero
    val bip = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    assert(Graph.triangleCount(bip.toDF("src", "dst")).collect().head.getLong(2) == 0)
  }

  test("clusteringCoefficients: hand-computed lcc on K4 + pendant, zeros for deg<2") {
    // K4 on {a,b,c,d} + pendant e on a: a has deg 4, 3 of C(4,2)=6
    // neighbor pairs connected (e pairs with nobody) → lcc 0.5;
    // b/c/d have deg 3, all 3 pairs connected → lcc 1; e deg 1 → 0
    val e = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("a", "e"))
    val got = Graph.clusteringCoefficients(e.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("a") == ((4L, 3L, 0.5)))
    Seq("b", "c", "d").foreach(v => assert(got(v) == ((3L, 3L, 1.0)), v))
    assert(got("e") == ((1L, 0L, 0.0)))
    // consistency with the global count: Σ per-vertex triangles = 3 · total
    val total = Graph.triangleCount(e.toDF("src", "dst")).collect().head.getLong(2)
    assert(got.values.map(_._2).sum == 3 * total)
  }

  /** Driver-side reference LPA: synchronous, self-vote, min-label ties. */
  private def referenceLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = (edges ++ edges.map(_.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = adj.keySet.map(v => v -> v).toMap
    (0 until iters).foreach { _ =>
      lab = adj.keySet.map { v =>
        val votes = (adj(v).map(lab) :+ lab(v)).groupBy(identity)
          .view.mapValues(_.size).toSeq
        val best = votes.minBy { case (l, c) => (-c, l) }._1
        v -> best
      }.toMap
    }
    lab
  }

  test("labelPropagation: two planted cliques with a bridge separate cleanly") {
    // cliques {1,2,3,4} and {10,11,12,13}, one bridge 4–10
    def clique(vs: Seq[Long]) = for (a <- vs; b <- vs if a < b) yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ (4L -> 10L))
    val got = Graph.labelPropagation(e.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referenceLpa(e, 5))
    assert(Seq(1L, 2L, 3L, 4L).map(got).distinct.size == 1, "clique 1 is one community")
    assert(Seq(10L, 11L, 12L, 13L).map(got).distinct.size == 1, "clique 2 is one community")
    assert(got(1L) != got(10L), "the bridge must not merge the cliques")
  }

  test("labelPropagation matches the reference on a bipartite graph (oscillation damped)") {
    // complete bipartite K(3,3): the synchronous-LPA worst case — the
    // self-vote must keep it deterministic and convergent
    val e = for (a <- Seq(1L, 2L, 3L); b <- Seq(20L, 21L, 22L)) yield (a, b)
    for (it <- Seq(1, 2, 5)) {
      val got = Graph.labelPropagation(e.toDF("src", "dst"), iterations = it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == referenceLpa(e, it), s"diverged at iterations=$it")
    }
  }

  test("labelPropagation: duplicate and reversed edges do not change votes") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val dup = e ++ e.map(_.swap) ++ e
    val a = Graph.labelPropagation(e.toDF("src", "dst"), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.labelPropagation(dup.toDF("src", "dst"), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("labelPropagation: string vertex ids keep labels non-null (tie-break regression)") {
    // the old tie-break negated the LABEL column, which casts a string
    // id to double → null after round 1; the fixed tie-break negates
    // the COUNT. Same two-clique shape as the numeric test, string ids.
    def clique(vs: Seq[String]) = for (a <- vs; b <- vs if a < b) yield (a, b)
    val e = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a4" -> "b1")
    val got = Graph.labelPropagation(e.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.forall(_ != null), "no label may be nulled by the tie-break")
    assert(Seq("a1", "a2", "a3", "a4").map(got).distinct.size == 1)
    assert(Seq("b1", "b2", "b3", "b4").map(got).distinct.size == 1)
    assert(got("a1") != got("b2"), "the bridge must not merge the cliques")
  }

  test("degreeHistogram: path graph buckets, duplicate/reversed edges collapse") {
    // path 1–2–3: degrees 1,2,1 → histogram (1 → 2 vertices, 2 → 1)
    val e = Seq((1L, 2L), (2L, 3L), (2L, 1L), (1L, 2L)) // dups + reversal
    val got = Graph.degreeHistogram(e.toDF("src", "dst"))
      .orderBy("degree").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.666667), (2L, 1L, 0.333333)))
  }
}
