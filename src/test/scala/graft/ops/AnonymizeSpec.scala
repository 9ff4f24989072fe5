package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("kAnonymize keeps exactly the rows of groups with >= k members") {
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "fr", "a"), (5L, "fr", "b"),
      (6L, "de", "c")).toDF("id", "lang", "src")
    val got = Anonymize.kAnonymize(df, Seq("lang", "src"), k = 2)
      .select("id").as[Long].collect().toSet
    // (en,a) has 3 members; every other group is a singleton
    assert(got == Set(1L, 2L, 3L))
    // k=1 is the identity
    assert(Anonymize.kAnonymize(df, Seq("lang", "src"), 1).count() == 6)
  }

  test("kAnonymize: NULL quasi values form their own (anonymizable) group") {
    val df = Seq(
      (1L, Some("en")), (2L, None), (3L, None), (4L, Some("fr"))
    ).toDF("id", "lang")
    val got = Anonymize.kAnonymize(df, Seq("lang"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("generalizeRare folds sub-k values into the fallback, keeps rows and NULLs") {
    val df = Seq(
      (1L, Some("src1")), (2L, Some("src1")), (3L, Some("src2")),
      (4L, None)).toDF("id", "src")
    val got = Anonymize.generalizeRare(df, "src", k = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("src1"), 2L -> Some("src1"),
      3L -> Some("other"), 4L -> None))
  }

  test("lDiversityAudit reports group size and distinct sensitive count") {
    val df = Seq(
      ("en", "s1", "med"), ("en", "s1", "med"), ("en", "s1", "law"),
      ("fr", "s2", "med")).toDF("lang", "src", "topic")
    val got = Anonymize.lDiversityAudit(df, Seq("lang", "src"), "topic")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("en", "s1") -> (3L, 2L), ("fr", "s2") -> (1L, 1L)))
  }

  test("fixture: suppression drops every released row whose group is sub-k, keeps the rest") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val k = 3
    val out = Anonymize.kAnonymize(docs, Seq("lang", "source"), k)
    val sizes = out.groupBy("lang", "source").count()
    assert(sizes.filter(col("count") < k).isEmpty)
    // equivalent formulation: semi-join against HAVING count >= k
    val keep = docs.groupBy("lang", "source").count().filter(col("count") >= k)
      .drop("count")
    val expected = docs.join(keep, Seq("lang", "source"), "left_semi")
      .select(docs.columns.map(col).toSeq: _*)
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  // driver-side replay of the deterministic Laplace simulation:
  // u from the 32-bit md5 prefix of seed:group, inverse CDF with scale b
  private def laplaceReplay(seed: String, group: String, b: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$group".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    val c = u - 0.5
    -b * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
  }

  test("dpCounts: released value is exactly true count + seeded Laplace noise") {
    val df = Seq.tabulate(30)(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val got = Anonymize.dpCounts(df, "g", epsilon = 0.5, seed = "s1")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    val b = 2.0
    (0 to 2).foreach { i =>
      val (noisy, err95) = got(s"g$i")
      val expect = math.round((10.0 + laplaceReplay("s1", s"g$i", b)) * 1e4) / 1e4
      assert(noisy == expect, s"g$i")
      assert(err95 == math.round(b * math.log(20.0) * 1e4) / 1e4)
    }
    intercept[IllegalArgumentException](Anonymize.dpCounts(df, "g", 0.0, "s"))
  }

  test("dpCounts: err95 really is a ~95th-percentile error bound (400 groups)") {
    val df = Seq.tabulate(400)(i => (i.toLong, s"grp$i")).toDF("id", "g")
    val rows = Anonymize.dpCounts(df, "g", epsilon = 1.0, seed = "bound")
      .collect().map(r => (math.abs(r.getDouble(1) - 1.0), r.getDouble(3)))
    val err95 = rows.head._2
    val within = rows.count { case (absErr, _) => absErr <= err95 }
    // Laplace tail: P(|X| <= b·ln 20) = 0.95; deterministic md5 uniforms
    // over 400 groups must land near it (and not degenerately at 100%)
    assert(within >= 360 && within < 400, s"$within/400 within err95 = $err95")
  }

  test("dpSum: clamping bounds one row's influence by the sensitivity") {
    val base = Seq.tabulate(20)(i => (i.toLong, "a", 50.0)).toDF("id", "g", "v")
    val wild = base.union(Seq((99L, "a", 1e9)).toDF("id", "g", "v"))
    def rel(df: org.apache.spark.sql.DataFrame) =
      Anonymize.dpSum(df, "g", "v", lo = 0.0, hi = 100.0, epsilon = 1.0, seed = "w")
        .collect().head.getDouble(1)
    // same (seed, group) → identical noise, so the released difference is
    // exactly the wild row's CLAMPED contribution: ≤ sensitivity = 100
    val diff = rel(wild) - rel(base)
    assert(math.abs(diff - 100.0) <= 1e-3, s"clamped influence was $diff")
    intercept[IllegalArgumentException](Anonymize.dpSum(base, "g", "v", 5.0, 1.0, 1.0, "w"))
  }

  test("dpMean: two-query decomposition replays driver-side; total spend is ε") {
    val df = Seq.tabulate(10)(i => (i.toLong, "a", 40.0 + i)).toDF("id", "g", "v")
    val r = Anonymize.dpMean(df, "g", "v", lo = 0.0, hi = 100.0,
      epsilon = 1.0, seed = "m").collect().head
    // sum leg: Σv = 445 (all inside the clamp), b = 100/(ε/2) = 200;
    // count leg: n = 10, b = 2/ε = 2 — each on ε/2, composing to ε
    val sn = 445.0 + laplaceReplay("m:sum", "a", 200.0)
    val nn = 10.0 + laplaceReplay("m:cnt", "a", 2.0)
    assert(r.getDouble(1) == math.round(sn / math.max(nn, 1.0) * 1e4) / 1e4)
    assert(r.getDouble(2) == math.round(nn * 1e4) / 1e4)
    assert(r.getDouble(3) == 1.0, "released spend must be the full ε")
  }

  test("dpLedger: cumulative ε is the sequential-composition prefix sum") {
    val df = Seq.tabulate(12)(i => (i.toLong, s"g${i % 2}")).toDF("id", "g")
    val rel = Seq(Anonymize.DpRelease("r1", 0.5, "sa"),
      Anonymize.DpRelease("r2", 0.25, "sb"), Anonymize.DpRelease("r3", 1.0, "sc"))
    val got = Anonymize.dpLedger(df, "g", rel).collect()
    assert(got.length == 6, "every release × every group")
    val cum = got.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(cum == Map("r1" -> 0.5, "r2" -> 0.75, "r3" -> 1.75))
    // per-release seeds: the same group's noise differs across releases
    val g0 = got.filter(_.getString(1) == "g0").map(_.getDouble(2)).distinct
    assert(g0.length == 3, s"noise must vary by release seed: $g0")
    intercept[IllegalArgumentException](Anonymize.dpLedger(df, "g", Nil))
    intercept[IllegalArgumentException](Anonymize.dpLedger(df, "g",
      Seq(Anonymize.DpRelease("dup", 0.5, "x"), Anonymize.DpRelease("dup", 0.5, "y"))))
  }

  test("kAnonymize plan: one exchange, no second corpus scan") {
    val docs = Tables.documents(spark, GraftSpark.Sf0001)
    val plan = Anonymize.kAnonymize(docs, Seq("lang", "source"), 5)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }
}
