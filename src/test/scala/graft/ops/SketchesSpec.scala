package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def tokens(rows: (String, Int)*) =
    rows.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("token")

  test("heavyHitters: exact top-k with counts; estimate is one-sided (est >= exact)") {
    val df = tokens(("alpha", 50), ("beta", 30), ("gamma", 20), ("delta", 5), ("eps", 1))
    val out = Sketches.heavyHitters(df, "token", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq("alpha", "beta", "gamma"))
    assert(out.map(_._2).toSeq == Seq(50L, 30L, 20L))
    out.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: CMS must never underestimate")
    }
  }

  test("heavyHitters: overshoot within the eps*N bound on a wide corpus") {
    val df = tokens((1 to 200).map(i => (s"t$i", 1 + i % 7)): _*)
    val n = df.count()
    val out = Sketches.heavyHitters(df, "token", topK = 10, eps = 0.01)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    out.foreach { case (exact, est) =>
      assert(est - exact <= math.ceil(0.01 * n).toLong,
        s"overshoot ${est - exact} above eps*N")
    }
  }

  test("heavyHitters is deterministic for a fixed seed") {
    val df = tokens((1 to 100).map(i => (s"w$i", i)): _*)
    val a = Sketches.heavyHitters(df, "token", topK = 5).collect().toSeq
    val b = Sketches.heavyHitters(df, "token", topK = 5).collect().toSeq
    assert(a == b)
  }

  test("heavyHitters: count ties break lexicographically (stable top-k edge)") {
    val df = tokens(("b", 10), ("a", 10), ("c", 10), ("d", 1))
    val out = Sketches.heavyHitters(df, "token", topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b"))
  }

  test("heavyHitters works on integral id columns, keeping the native type") {
    import spark.implicits._
    val df = (Seq.fill(50)(7L) ++ Seq.fill(20)(3L) ++ (100L to 120L)).toDF("id")
    val out = Sketches.heavyHitters(df, "id", topK = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L, 3L))
    assert(out.map(_.getLong(1)).toSeq == Seq(50L, 20L))
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1), "CM estimate must be one-sided"))
    // unsupported column types fail loudly up front
    val bad = Seq(1.5, 2.5).toDF("x")
    intercept[IllegalArgumentException](Sketches.heavyHitters(bad, "x", topK = 1))
  }
}
