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
}
