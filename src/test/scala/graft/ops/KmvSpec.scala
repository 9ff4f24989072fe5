package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class KmvSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("unsaturated sketch is exact: distinct < k gives the true count and true jaccard") {
    // A = {0..49}, B = {25..74}: |A∩B|=25, |A∪B|=75, J=1/3 — with k=256
    // both sketches hold EVERY hash, so the estimates are exact
    val df = ((0L until 50L).map(("A", _)) ++ (25L until 75L).map(("B", _)))
      .toDF("grp", "v")
    val sk = Kmv.sketch(df, col("grp"), col("v"), k = 256)
    val est = sk.select(col("grp"), Kmv.estimateDistinct(col("kmv"), 256).as("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est == Map("A" -> 50.0, "B" -> 50.0))
    val ov = Kmv.overlap(sk, k = 256).collect().head
    assert(ov.getString(0) == "A" && ov.getString(1) == "B")
    assert(math.abs(ov.getDouble(2) - 25.0 / 75.0) < 1e-3, s"jaccard ${ov.getDouble(2)}")
    assert(ov.getDouble(3) == 75.0)
    assert(math.abs(ov.getDouble(4) - 25.0) < 0.05)
  }

  test("saturated estimator lands within 15% on 10k distinct values at k=256") {
    val df = (0L until 10000L).map(("A", _)).toDF("grp", "v")
    val sk = Kmv.sketch(df, col("grp"), col("v"), k = 256)
    val n = sk.select(Kmv.estimateDistinct(col("kmv"), 256)).head().getDouble(0)
    assert(math.abs(n - 10000) / 10000 < 0.15, s"estimate $n")
    // the sketch is exactly k sorted ascending distinct values
    val arr = sk.select("kmv").head().getSeq[Long](0)
    assert(arr.length == 256 && arr == arr.sorted && arr.distinct.length == 256)
  }

  test("identical sets estimate jaccard 1, disjoint sets 0; partition-invariant") {
    val df = ((0L until 5000L).map(("A", _)) ++ (0L until 5000L).map(("B", _)) ++
      (100000L until 105000L).map(("C", _))).toDF("grp", "v")
    def run(parts: Int) = Kmv.overlap(
        Kmv.sketch(df.repartition(parts), col("grp"), col("v"), k = 128), k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(4)))
      .toMap
    val ov = run(3)
    assert(ov(("A", "B"))._1 == 1.0)
    assert(ov(("A", "C"))._1 == 0.0 && ov(("A", "C"))._2 == 0.0)
    // the sketch is a pure function of the value set, not the partitioning
    assert(run(3) == run(11))
  }

  test("overlap estimate tracks the true intersection on partially overlapping sets") {
    // A = {0..5999}, B = {3000..8999}: J = 3000/9000 = 1/3
    val df = ((0L until 6000L).map(("A", _)) ++ (3000L until 9000L).map(("B", _)))
      .toDF("grp", "v")
    val ov = Kmv.overlap(Kmv.sketch(df, col("grp"), col("v"), k = 256), k = 256)
      .collect().head
    assert(math.abs(ov.getDouble(2) - 1.0 / 3.0) < 0.08, s"jaccard ${ov.getDouble(2)}")
    assert(math.abs(ov.getDouble(4) - 3000.0) / 3000.0 < 0.2, s"common ${ov.getDouble(4)}")
  }

  test("unionAll of group sketches equals the direct sketch of the pooled data") {
    // merging per-group sketches must lose nothing vs sketching the
    // union directly — the k smallest hashes of A∪B are a subset of
    // (k smallest of A) ∪ (k smallest of B)
    val df = ((0L until 6000L).map(("A", _)) ++ (3000L until 9000L).map(("B", _)) ++
      (7000L until 11000L).map(("C", _))).toDF("grp", "v")
    val merged = Kmv.unionAll(Kmv.sketch(df, col("grp"), col("v"), k = 256), k = 256)
      .collect().head.getSeq[Long](0)
    val direct = Kmv.sketch(df.withColumn("grp", lit("all")), col("grp"), col("v"), k = 256)
      .collect().head.getSeq[Long](1)
    assert(merged == direct, "one-aggregate union sketch != direct union sketch")
    val est = Kmv.unionAll(Kmv.sketch(df, col("grp"), col("v"), k = 256), k = 256)
      .select(Kmv.estimateDistinct(col("kmv"), 256).as("n")).collect().head.getDouble(0)
    assert(math.abs(est - 11000.0) / 11000.0 < 0.15, s"union estimate $est")
  }

  test("overlapMatrix: difference estimates exact when unsaturated, consistent when saturated") {
    // unsaturated: everything held exactly → diffs exact
    val small = ((0L until 50L).map(("A", _)) ++ (25L until 75L).map(("B", _)))
      .toDF("grp", "v")
    val m = Kmv.overlapMatrix(Kmv.sketch(small, col("grp"), col("v"), k = 256), k = 256)
      .collect().head
    def f(row: org.apache.spark.sql.Row, c: String): Double =
      row.getDouble(row.fieldIndex(c))
    assert(math.abs(f(m, "n_diff_ab_est") - 25.0) < 0.1, s"ab ${f(m, "n_diff_ab_est")}")
    assert(math.abs(f(m, "n_diff_ba_est") - 25.0) < 0.1, s"ba ${f(m, "n_diff_ba_est")}")
    // saturated: |A∖B|=3000, |B∖A|=3000 within 25%
    val big = ((0L until 6000L).map(("A", _)) ++ (3000L until 9000L).map(("B", _)))
      .toDF("grp", "v")
    val mb = Kmv.overlapMatrix(Kmv.sketch(big, col("grp"), col("v"), k = 256), k = 256)
      .collect().head
    assert(math.abs(f(mb, "n_diff_ab_est") - 3000.0) / 3000.0 < 0.25)
    assert(math.abs(f(mb, "n_diff_ba_est") - 3000.0) / 3000.0 < 0.25)
    // algebra consistency: n_a_est = common + diff_ab (by construction,
    // modulo the max(…, 0) clamp and rounding)
    assert(math.abs(f(mb, "n_a_est") - (f(mb, "n_common_est") + f(mb, "n_diff_ab_est"))) < 0.01)
  }

  test("trailingDistinct: exact when unsaturated, window slides, len 1 = per-bucket") {
    // d1 {1,2}, d2 {2,3}, d3 {4}; windowLen 2:
    //   d1 → |{1,2}| = 2, d2 → |{1,2,3}| = 3, d3 → |{2,3,4}| = 3
    val df = Seq(
      ("d1", 1L), ("d1", 2L), ("d1", 2L),
      ("d2", 2L), ("d2", 3L),
      ("d3", 4L)).toDF("day", "u")
    val sk = Kmv.sketch(df, col("day"), col("u"), k = 16)
    val got = Kmv.trailingDistinct(sk, windowLen = 2, k = 16)
      .orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // n_buckets marks warm-up: d1 merges only its own day (fill 1 < 2)
    assert(got.toSeq == Seq(
      ("d1", 2.0, 2.0, 1L), ("d2", 2.0, 3.0, 2L), ("d3", 1.0, 3.0, 2L)))
    val one = Kmv.trailingDistinct(sk, windowLen = 1, k = 16)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(one.forall { case (d, t) => d == t },
      "windowLen 1 trailing must equal the per-bucket estimate")
    intercept[IllegalArgumentException](Kmv.trailingDistinct(sk, 0, 16))
  }

  test("trailingDistinct: saturated trailing union lands within 15% at k=256") {
    // two buckets of 5000 distinct users with 2500 shared: union 7500
    val df = ((0L until 5000L).map(("d1", _)) ++ (2500L until 7500L).map(("d2", _)))
      .toDF("day", "u")
    val got = Kmv.trailingDistinct(Kmv.sketch(df, col("day"), col("u"), k = 256),
        windowLen = 2, k = 256)
      .orderBy("bucket").collect()
    assert(math.abs(got(1).getDouble(2) - 7500.0) / 7500.0 < 0.15,
      s"trailing union est ${got(1).getDouble(2)} vs exact 7500")
  }
}
