package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class BitextSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // hand-built embedding geometry: en0 ∥ es10 (true pair), en1 a "hub"
  // similar to everything, es11/es12 fillers
  private val docs = Seq(
    (0L, "en", Array(1f, 0f, 0f)),
    (1L, "en", Array(0.6f, 0.55f, 0.55f)), // hub: moderately close to all
    (10L, "es", Array(0.99f, 0.1f, 0f)),   // ≈ en0
    (11L, "es", Array(0f, 1f, 0f)),
    (12L, "es", Array(0f, 0f, 1f))).toDF("id", "lang", "vec")

  test("true pair wins with margin > 1; ids and sims are right") {
    val out = Bitext.minePairs(docs, "id", "lang", "vec", "en", "es",
      k = 2, marginThreshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val best = out.find(_._1 == 0L).get
    assert(best._2 == 10L)        // en0's best target is its translation
    assert(best._3 > 0.99)        // near-parallel vectors
    assert(best._4 > 1.0)         // margin clears the neighborhood mean
  }

  test("margin demotes hubs relative to raw cosine") {
    // the hub's best raw cosine can be high, but its top-k neighborhood
    // mean is also high, so its margin stays near 1 — strictly below the
    // true pair's margin
    val all = Bitext.minePairs(docs, "id", "lang", "vec", "en", "es",
      k = 2, marginThreshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(all(0L) > all(1L))
  }

  test("one row per source, none below the threshold") {
    val out = Bitext.minePairs(docs, "id", "lang", "vec", "en", "es",
      k = 2, marginThreshold = 1.0).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(_.getDouble(3) > 1.0))
  }
}
