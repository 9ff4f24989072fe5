package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class BasketSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  // 5 baskets: {1,2,3} {1,2} {1,2,4} {3,4} {1,5}.
  // supports: 1→4, 2→3, 3→2, 4→2, 5→1.
  private def baskets = {
    import spark.implicits._
    Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 4L),
      (40L, 3L), (40L, 4L),
      (50L, 1L), (50L, 5L)).toDF("b", "i")
  }

  test("hand-computed supports and lifts") {
    // frequent items at minItemSupport=2: {1,2,3,4}. pairs with
    // support >= 2: only (1,2) in baskets 10/20/30 → support 3.
    // lift(1,2) = 3·5 / (4·3) = 1.25.
    val got = Basket.frequentPairs(baskets, "b", "i",
        minItemSupport = 2, minPairSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 1.25)))
  }

  test("downward closure: no emitted pair contains an infrequent item") {
    val got = Basket.frequentPairs(baskets, "b", "i",
        minItemSupport = 3, minPairSupport = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // frequent at >=3: {1, 2} only — every pair is within that set
    assert(got == Set((1L, 2L)))
  }

  test("duplicate (basket, item) rows do not inflate support") {
    import spark.implicits._
    val dup = baskets.unionByName(Seq((10L, 1L), (10L, 2L)).toDF("b", "i"))
    val a = Basket.frequentPairs(baskets, "b", "i", 2, 2).collect().toSeq
    val b = Basket.frequentPairs(dup, "b", "i", 2, 2).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("lift denominator counts ALL baskets, including frequent-free ones") {
    import spark.implicits._
    // adding a basket of only-infrequent items changes n_baskets (5→6)
    // and therefore every lift: (1,2) → 3·6/(4·3) = 1.5
    val plus = baskets.unionByName(Seq((60L, 9L)).toDF("b", "i"))
    val got = Basket.frequentPairs(plus, "b", "i", 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1.5)))
  }

  test("rules: confidence is directional, support and lift are not") {
    // (1,2): support 3, s1=4, s2=3, n=5.
    // 1→2 conf 3/4 = 0.75; 2→1 conf 3/3 = 1.0; lift 1.25 both ways.
    val got = Basket.rules(baskets, "b", "i",
        minItemSupport = 2, minPairSupport = 2, minConfidence = 0.1)
      .orderBy("antecedent", "consequent")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 0.75, 1.25), (2L, 1L, 3L, 1.0, 1.25)))
  }

  test("rules: minConfidence filters one direction independently") {
    val got = Basket.rules(baskets, "b", "i", 2, 2, minConfidence = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((2L, 1L)), "only the 1.0-confidence direction survives")
  }

  test("thresholds are validated") {
    intercept[IllegalArgumentException](
      Basket.frequentPairs(baskets, "b", "i", 0, 1))
    intercept[IllegalArgumentException](
      Basket.frequentPairs(baskets, "b", "i", 1, 0))
    intercept[IllegalArgumentException](
      Basket.rules(baskets, "b", "i", 1, 1, minConfidence = 0.0))
  }
}
