package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
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
}
