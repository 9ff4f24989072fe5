package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class LinkageSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  val recs = Seq(
    (1L, "B1", "blue bolt"),
    (2L, "B1", "blue belt"),   // dist 1 from #1
    (3L, "B1", "blue bolt"),   // exact dup of #1 -> excluded (dist 0)
    (4L, "B1", "red widget"),  // far from everything
    (5L, "B2", "blue bolt")    // would match #1 but different block
  ).toDF("id", "block_key", "name")

  test("fuzzyPairs: matches within block only, excludes dist 0, banded distance correct") {
    val out = Linkage.fuzzyPairs(recs, "id", "block_key", "name",
        maxDist = 2, maxBlock = 100L)
      .orderBy("id_a", "id_b").collect()
    assert(out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("dist"))).toSeq ==
      Seq((1L, 2L, 1), (2L, 3L, 1)))  // cross-block 1-5 and exact 1-3 absent
  }

  test("fuzzyPairs: oversized blocks are excluded and the audit reports them") {
    val out = Linkage.fuzzyPairs(recs, "id", "block_key", "name",
        maxDist = 2, maxBlock = 3L)   // B1 has 4 rows -> dropped
      .collect()
    assert(out.isEmpty)
    val audit = Linkage.oversizedBlocks(recs, "block_key", 3L).collect()
    assert(audit.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("B1", 4L)))
  }

  test("fuzzyPairsAuto: a budget no block exceeds reproduces fuzzyPairs " +
      "exactly (no refinement, union dedups to the single-pass set)") {
    val fixed = Linkage.fuzzyPairs(recs, "id", "block_key", "name",
      maxDist = 2, maxBlock = 100L).orderBy("id_a", "id_b").collect()
    val auto = Linkage.fuzzyPairsAuto(recs, "id", "block_key", "name",
      maxDist = 2, compareBudget = 1000000L).orderBy("id_a", "id_b").collect()
    assert(auto.map(_.toSeq).toSeq == fixed.map(_.toSeq).toSeq)
    assert(auto.nonEmpty)
  }

  // six names in one block, budget 36 -> D=6, cap = 36/(2*6) = 3 -> the
  // block (6 distinct names) refines; prefix-4 and suffix-4 both fit
  val refined = Seq(
    (1L, "B", "red bolt"), (2L, "B", "new bolt"), (3L, "B", "red bolx"),
    (4L, "B", "qed bolt"), (5L, "B", "red bolu"), (6L, "B", "zzz zzzz")
  ).toDF("id", "block_key", "name")

  test("fuzzyMatchesAuto: forced refinement keeps one-ended pairs via the " +
      "prefix and suffix passes; only both-end-edit pairs are lost") {
    val got = Linkage.fuzzyMatchesAuto(refined, "id", "block_key", "name",
        maxDist = 2, compareBudget = 36L)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // prefix pass ("red " sub-block) + suffix pass ("tlob" sub-block)
    assert(got == Set(
      ("red bolt", "red bolu"), ("red bolt", "red bolx"),
      ("red bolu", "red bolx"), ("new bolt", "qed bolt"),
      ("new bolt", "red bolt"), ("qed bolt", "red bolt")))
    // the full (unrefined) set adds exactly the two both-end-edit pairs
    // (fuzzyPairs orients names by id order — normalize to lexicographic)
    val full = Linkage.fuzzyPairs(refined, "id", "block_key", "name",
        maxDist = 2, maxBlock = 100L)
      .select("name_a", "name_b").collect()
      .map { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        if (a < b) (a, b) else (b, a)
      }.toSet
    assert(full -- got ==
      Set(("qed bolt", "red bolu"), ("qed bolt", "red bolx")))
  }

  test("fuzzyMatchesAuto: multiplicities count ids per (block, name) and " +
      "fuzzyPairsAuto fans out exactly n_pairs id pairs per match") {
    val dup = recs.unionByName(
      Seq((6L, "B1", "blue bolt")).toDF("id", "block_key", "name"))
    // "blue bolt" now has ids {1, 3, 6} in B1; "blue belt" has {2}
    val m = Linkage.fuzzyMatchesAuto(dup, "id", "block_key", "name",
        maxDist = 2, compareBudget = 1000000L).collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("name_a") == "blue belt")
    assert(m.head.getAs[Long]("n_ids_a") == 1L)
    assert(m.head.getAs[Long]("n_ids_b") == 3L)
    assert(m.head.getAs[Long]("n_pairs") == 3L)
    val pairs = Linkage.fuzzyPairsAuto(dup, "id", "block_key", "name",
      maxDist = 2, compareBudget = 1000000L).collect()
    assert(pairs.length == 3)
    assert(pairs.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("fuzzyAutoPlan: reports the derived cap, chosen ladder levels and " +
      "the dropped residue when no ladder level fits") {
    // four names sharing first-2 AND last-2 chars: with ladder (1,2) and
    // cap 16/(2*4) = 2, neither pass can split them -> all dropped
    val stuck = Seq(
      (1L, "B", "ab11ba"), (2L, "B", "ab22ba"),
      (3L, "B", "ab33ba"), (4L, "B", "ab44ba")
    ).toDF("id", "block_key", "name")
    val plan = Linkage.fuzzyAutoPlan(stuck, "block_key", "name",
      maxDist = 2, compareBudget = 16L, ladder = Seq(1, 2)).collect()
    assert(plan.length == 1)
    val r = plan.head
    assert(r.getAs[Long]("n_rows") == 4L && r.getAs[Long]("n_names") == 4L)
    assert(r.getAs[Long]("cap") == 2L)
    assert(r.getAs[Int]("lvl_pre") == 2 && r.getAs[Int]("lvl_suf") == 2)
    assert(r.getAs[Long]("max_sub_pre") == 4L &&
      r.getAs[Long]("max_sub_suf") == 4L)
    assert(r.getAs[Long]("drop_pre") == 4L && r.getAs[Long]("drop_suf") == 4L)
    // the rail really dropped them: no pairs despite dist-2 neighbors
    assert(Linkage.fuzzyMatchesAuto(stuck, "id", "block_key", "name",
      maxDist = 2, compareBudget = 16L, ladder = Seq(1, 2)).isEmpty)
    // an unrefined block reports lvl 0 and no drops
    val plan2 = Linkage.fuzzyAutoPlan(recs, "block_key", "name",
      maxDist = 2, compareBudget = 1000000L).orderBy("block").collect()
    assert(plan2.map(_.getAs[Int]("lvl_pre")).forall(_ == 0))
    assert(plan2.map(_.getAs[Long]("drop_pre")).forall(_ == 0L))
  }
}
