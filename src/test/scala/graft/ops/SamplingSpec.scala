package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def docs = Tables.documents(spark, GraftSpark.Sf0001)

  test("trainTestSplit is disjoint, exhaustive, near the target fraction, and stable") {
    val split = Sampling.trainTestSplit(docs, 0.2, col("doc_id"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    val frac = counts.getOrElse("test", 0L).toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"test fraction $frac far from 0.2")
    // stability: same assignment on recompute and under corpus growth
    val again = Sampling.trainTestSplit(docs, 0.2, col("doc_id"))
    assert(split.exceptAll(again).isEmpty)
    val grown = Sampling.trainTestSplit(
      docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L)), 0.2, col("doc_id"))
    val origAssign = grown.filter(col("doc_id") < 1000000L)
    assert(split.exceptAll(origAssign).isEmpty, "existing rows must keep their split as corpus grows")
  }

  test("groupedSplit: group integrity holds — leaked_groups is 0 by construction") {
    val ev = Tables.events(spark, GraftSpark.Sf0001)
    val sp = Sampling.groupedSplit(ev, testFraction = 0.25, col("user_id"), seed = "split0")
    // THE contract: no group may straddle splits (train/eval leakage)
    val leaked = sp.groupBy("user_id")
      .agg(count_distinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(leaked == 0L, "a user's events appeared in BOTH splits")
    // disjoint + exhaustive, and the test share lands near the fraction
    assert(sp.count() == ev.count())
    val groups = sp.select("user_id", "split").distinct()
    val frac = groups.filter(col("split") === "test").count().toDouble / groups.count()
    assert(frac > 0.1 && frac < 0.4, s"test-group share $frac")
  }

  test("groupedSplit assignment matches a driver-side md5 recomputation") {
    import spark.implicits._
    val df = (0L until 200L).map(g => (g, s"row$g")).toDF("g", "payload")
    val got = Sampling.groupedSplit(df, 0.25, col("g"), seed = "sd")
      .select("g", "split").as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val threshold = math.floor(0.25 * 4294967296.0d).toLong
    (0L until 200L).foreach { g =>
      val hex = md.digest(s"sd:$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val expect = if (java.lang.Long.parseLong(hex, 16) < threshold) "test" else "train"
      assert(got(g) == expect, s"group $g")
    }
    intercept[IllegalArgumentException](Sampling.groupedSplit(df, 1.5, col("g"), "sd"))
  }

  test("groupedSplit is a pure map-side projection — no shuffle, no group table") {
    val ev = Tables.events(spark, GraftSpark.Sf0001)
    val plan = Sampling.groupedSplit(ev, 0.25, col("user_id"), "split0")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"groupedSplit must not shuffle:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("trainTestSplit assignment matches a driver-side xxhash64 recomputation") {
    // first-principles check backing the pinned train_test_split oracle:
    // re-derive pmod(xxhash64(doc_id), 1e6)/1e6 < 0.2 with catalyst's
    // interpreted hash (different code path from the codegen'd query)
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    val got = Sampling.trainTestSplit(docs, 0.2, col("doc_id"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.select("doc_id").collect().map(_.getLong(0)).map { id =>
      val h = XxHash64Function.hash(id, LongType, 42L)
      val bucket = ((h % 1000000L) + 1000000L) % 1000000L
      id -> (if (bucket.toDouble / 1000000.0 < 0.2) "test" else "train")
    }.toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("stratifiedSample membership matches a driver-side xxhash64 recomputation") {
    // first-principles check backing the pinned stratified_sample oracle:
    // hashWeight salts with the stratum first — xxhash64(lang, doc_id)
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val got = Sampling.stratifiedSample(docs, col("lang"), 0.1, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.select("doc_id", "lang").collect().map { r =>
      val h1 = XxHash64Function.hash(UTF8String.fromString(r.getString(1)), StringType, 42L)
      val h = XxHash64Function.hash(r.getLong(0), LongType, h1)
      r.getLong(0) -> (((h % 1000000L) + 1000000L) % 1000000L).toDouble / 1000000.0
    }.filter(_._2 < 0.1).map(_._1).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("weightedSample matches a driver-side Efraimidis-Spirakis recomputation; zero/null weights ineligible") {
    // first-principles check backing the pinned weighted_sample oracle:
    // key = -ln((pmod(xxhash64(id),1e6)+0.5)/1e6) / w, k smallest win
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    val k = 50
    val got = Sampling.weightedSample(docs, k, col("n_chars"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.select(col("doc_id"), col("n_chars").cast("double")).collect()
      .flatMap { r =>
        val w = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
        if (w <= 0) None
        else {
          val h = XxHash64Function.hash(r.getLong(0), LongType, 42L)
          val u = ((((h % 1000000L) + 1000000L) % 1000000L).toDouble + 0.5) / 1000000.0
          Some(r.getLong(0) -> (-math.log(u) / w))
        }
      }.sortBy(_._2).take(k).map(_._1).toSet
    assert(got.size == k)
    assert(got == want)
    // heavier docs are sampled more often than light ones in aggregate:
    // the sample's mean weight exceeds the corpus mean weight
    val sampleMean = docs.filter(col("doc_id").isin(got.toSeq: _*))
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val corpusMean = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > corpusMean)
  }

  test("weightedSamplePerStratum: k smallest ES keys within each stratum, stratum-salted") {
    val out = Sampling.weightedSamplePerStratum(
      docs, col("lang"), 3, col("n_chars"), col("doc_id"))
    val byLang = out.select("lang", "doc_id", "sample_key").collect()
      .groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (_, rows) => assert(rows.length <= 3) }
    // within a stratum the kept keys are the stratum's minima: every kept
    // key must be <= the stratum's (k+1)-th smallest recomputed key
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val all = docs.select("doc_id", "lang", "n_chars").collect().map { r =>
      val h1 = XxHash64Function.hash(UTF8String.fromString(r.getString(1)), StringType, 42L)
      val h = XxHash64Function.hash(r.getLong(0), LongType, h1)
      val u = ((((h % 1000000L) + 1000000L) % 1000000L).toDouble + 0.5) / 1000000.0
      (r.getString(1), r.getLong(0), -math.log(u) / r.getLong(2).toDouble)
    }
    val wantTop = all.groupBy(_._1).map { case (lang, rows) =>
      lang -> rows.sortBy(_._3).take(3).map(_._2).toSet
    }
    val gotTop = byLang.map { case (lang, rows) => lang -> rows.map(_.getLong(1)).toSet }
    assert(gotTop == wantTop)
  }

  test("mixSources: rate 0 drops, integer rates replicate exactly, fractional rates match a driver-side hash recomputation") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val rates = Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.0, "src3" -> 2.5)
    val mixed = Sampling.mixSources(docs, col("source"), rates, 1.0, col("doc_id"))
    val got = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("src0"))
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("src2") == 2 * perSource("src2"))
    // unlisted sources keep defaultRate = 1.0 exactly
    perSource.keys.filterNot(rates.contains).foreach(srcN =>
      assert(got(srcN) == perSource(srcN), s"default-rate source $srcN changed"))
    // fractional legs: recompute hashWeight(source, doc_id) < frac on the driver
    val fracWant = docs.select("doc_id", "source").collect().flatMap { r =>
      val rate = rates.getOrElse(r.getString(1), 1.0)
      val h1 = XxHash64Function.hash(UTF8String.fromString(r.getString(1)), StringType, 42L)
      val h = XxHash64Function.hash(r.getLong(0), LongType, h1)
      val w = (((h % 1000000L) + 1000000L) % 1000000L).toDouble / 1000000.0
      val copies = rate.toLong + (if (w < rate - rate.floor) 1L else 0L)
      Seq.fill(copies.toInt)(r.getString(1))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got == fracWant)
    // copy index is a distinct 0..copies-1 per row
    val badCopies = mixed.groupBy("doc_id").agg(
        count(lit(1)).as("n"), countDistinct("copy").as("d"),
        min("copy").as("lo"), max("copy").as("hi"))
      .filter(col("n") =!= col("d") || col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(badCopies.isEmpty)
  }

  test("tokenBudget keeps the greedy in-order prefix per stratum, never exceeding the budget") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 400L), ("a", 2L, 300L), ("a", 3L, 200L), ("a", 4L, 50L),
      ("b", 5L, 900L), ("b", 6L, 100L),
      ("c", 7L, 800L)
    ).toDF("src", "id", "tokens")
    val kept = Sampling.tokenBudget(df, col("src"), col("tokens"), 800L, col("id"))
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(3)))
    // a: 400,700 kept; 900 (id 3) exceeds -> dropped, and id 4 does NOT
    // refill (cum stays monotone: 950 > 800). b: 900 > 800 drops both
    // (id 6's cum is 1000). c: exactly at budget kept.
    assert(kept.toSeq == Seq((1L, 400L), (2L, 700L), (7L, 800L)))
    // stability: the kept set over a GROWN corpus is a superset story —
    // earlier rows' fate is unchanged by appending later-ordered rows
    val grown = df.unionByName(Seq(("a", 9L, 10L)).toDF("src", "id", "tokens"))
    val keptGrown = Sampling.tokenBudget(grown, col("src"), col("tokens"), 800L, col("id"))
      .filter(col("id") < 9).orderBy("id").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(keptGrown.toSeq == kept.toSeq)
  }

  test("tokenBudget: one giant stratum spanning many range buckets still sums exactly") {
    import spark.implicits._
    // 500 rows, ONE stratum, 8 explicit buckets: the distributed two-level
    // prefix sum must agree with the driver-side greedy prefix even when
    // the stratum crosses every bucket boundary (the shape the round-6
    // single-window form serialized, and where an ambiguous bucket-join
    // would duplicate rows)
    val rows = (1L to 500L).map(i => ("web", i, (i * 7919L) % 97L + 1L))
    val df = rows.toDF("src", "id", "tokens").repartition(16)
    val budget = 9000L
    val kept = Sampling.tokenBudget(df, col("src"), col("tokens"), budget, 8, col("id"))
      .select("id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.sortBy(_._2)
      .scanLeft((0L, 0L)) { case ((_, cum), (_, i, t)) => (i, cum + t) }
      .tail.filter(_._2 <= budget).toSet
    assert(want.nonEmpty && kept == want)
  }

  test("tokenBudget rejects an input that already carries cum_tokens") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10L, 0L)).toDF("src", "id", "tokens", "cum_tokens")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudget(df, col("src"), col("tokens"), 10L, col("id"))
    }
    assert(e.getMessage.contains("cum_tokens"))
  }

  test("stratifiedSample keeps roughly the fraction within each stratum") {
    val sampled = Sampling.stratifiedSample(docs, col("lang"), 0.5, col("doc_id"))
    val perLang = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampledPer = sampled.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      if (n >= 30) {
        val f = sampledPer.getOrElse(lang, 0L).toDouble / n
        assert(f > 0.25 && f < 0.75, s"stratum $lang fraction $f far from 0.5")
      }
    }
  }

  test("temperatureWeights: tau=1 is the identity (factor 1, temp == natural)") {
    import spark.implicits._
    val df = Seq(("a", 100L), ("b", 300L)).toDF("src", "n")
    val w = Sampling.temperatureWeights(df, col("src"), col("n"), tau = 1.0)
      .select("source", "p_natural", "p_temperature", "upsample_factor")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(w("a")._1 - 0.25) < 1e-12)
    assert(math.abs(w("b")._1 - 0.75) < 1e-12)
    w.values.foreach { case (nat, temp, factor) =>
      assert(math.abs(temp - nat) < 1e-12)
      assert(math.abs(factor - 1.0) < 1e-12)
    }
  }

  test("temperatureWeights: tau<1 flattens toward uniform (small up, large down)") {
    import spark.implicits._
    val df = Seq(("small", 100L), ("large", 900L)).toDF("src", "n")
    val w = Sampling.temperatureWeights(df, col("src"), col("n"), tau = 0.5)
      .select("source", "p_natural", "p_temperature", "upsample_factor")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (sNat, sTemp, sFac) = w("small")
    val (lNat, lTemp, lFac) = w("large")
    assert(sTemp > sNat && sTemp < 0.5, "small source moves toward (not past) uniform")
    assert(lTemp < lNat && lTemp > 0.5, "large source moves toward (not past) uniform")
    assert(sFac > 1.0 && lFac < 1.0)
    assert(math.abs(sTemp + lTemp - 1.0) < 1e-12, "temperature shares still normalize")
  }

  test("temperatureWeights fails loudly on negative or all-null sizes; empty in → empty out") {
    import spark.implicits._
    val neg = Seq(("a", 100L), ("b", -5L)).toDF("src", "n")
    val e = intercept[Exception] {
      Sampling.temperatureWeights(neg, col("src"), col("n"), tau = 0.5).collect()
    }
    assert(e.getMessage.contains(">= 0"), s"unexpected: ${e.getMessage}")
    // all-NULL sizes: rows exist but carry no signal — NULL totals must
    // raise, not emit NULL shares
    val allNull = Seq(("a", null.asInstanceOf[java.lang.Long]), ("b", null.asInstanceOf[java.lang.Long]))
      .toDF("src", "n")
    val e2 = intercept[Exception] {
      Sampling.temperatureWeights(allNull, col("src"), col("n"), tau = 0.5).collect()
    }
    assert(e2.getMessage.contains("total size"), s"unexpected: ${e2.getMessage}")
    // a genuinely empty input has nothing to weight: empty result, no error
    val empty = Seq.empty[(String, Long)].toDF("src", "n")
    assert(Sampling.temperatureWeights(empty, col("src"), col("n"), tau = 0.5).isEmpty)
  }

  test("capPerStratum keeps exactly the k first rows per stratum with ranks 1..k") {
    val capped = Sampling.capPerStratum(
        docs.select("doc_id", "source"), col("source"), 10, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.map(_._1).sorted.take(10).zipWithIndex.map { case (id, i) => (id, src, i + 1L) }
      }.toSet
    assert(capped.toSet == expected)
    capped.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length <= 10, s"stratum $src over the cap")
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length), s"ranks not 1..k in $src")
    }
  }

  test("capPerStratum under a NON-total order: tie groups straddling k split " +
      "deterministically and partitioning-invariantly (content-hash tiebreak)") {
    import spark.implicits._
    // 8 rows per stratum all TIED on the user's order column — only the
    // appended content-hash tiebreak separates them
    val tied = (0 until 16).map(i => (i.toLong, if (i < 8) "a" else "b", 1))
      .toDF("id", "src", "ordkey")
    def run(parts: Int) = Sampling.capPerStratum(
        tied.repartition(parts), col("src"), 3, col("ordkey"))
      .select("id", "src").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val first = run(1)
    assert(first.count(_._2 == "a") == 3 && first.count(_._2 == "b") == 3,
      s"cap must keep exactly k despite the all-tied order: $first")
    assert(run(7) == first, "surviving set depends on physical partitioning")
  }

  test("rankInStratum evaluates the level-0 range exchange ONCE " +
      "(checkpointed; both legs read the materialized buckets)") {
    // The running sum + offsets roll-up are two consumers of the bucketed
    // frame. AQE ReusedExchange was the original one-scan mechanism, but
    // exchange reuse is not guaranteed across the offsets leg's broadcast
    // boundary — and when the legs DO evaluate separately, the range
    // partitioner re-samples boundaries from nondeterministic shuffle
    // order, misaligning __bkt between legs (the ×10 oracle gate caught
    // curriculum_order emitting duplicate global ranks). bucketedPrefixSum
    // now localCheckpoints the bucketed frame: pin that both consumers
    // read the checkpoint (no range exchange left in the final plan).
    val ranked = Sampling.rankInStratum(
      docs.select("doc_id", "source"), col("source"), 8, col("doc_id"))
    ranked.collect() // execute: AQE finalizes the adaptive plan
    val plan = ranked.queryExecution.executedPlan.toString
    val lower = plan.toLowerCase(java.util.Locale.ROOT)
    // the checkpointed buckets surface as an ExistingRDD scan
    assert(lower.contains("existingrdd"),
      s"bucketed frame is no longer checkpointed:\n$plan")
    assert(!lower.contains("rangepartitioning"),
      s"a consumer re-evaluates the range exchange instead of reading " +
        s"the checkpoint:\n$plan")
  }

  test("allocateBudget: Hamilton apportionment sums exactly to the budget, " +
      "each stratum within 1 of its real quota, all-integer determinism") {
    import spark.implicits._
    val w = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("src", "n")
    val got = Sampling.allocateBudget(w, col("src"), col("n"), budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 4L))
    // a classic remainder case: budget 10 over (1, 1, 1) → 4/3 quotas;
    // the extra unit goes to the LOWEST stratum on the remainder tie
    val tie = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("src", "n")
    val t = Sampling.allocateBudget(tie, col("src"), col("n"), budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(t.values.sum == 10L)
    assert(t == Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
    // skewed weights: exact-total + within-1-of-quota invariants hold
    val skew = Seq(("s1", 999999L), ("s2", 7L), ("s3", 1L), ("s4", 333L))
      .toDF("src", "n")
    val sk = Sampling.allocateBudget(skew, col("src"), col("n"), budget = 12345L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sk.map(_._3).sum == 12345L)
    val totW = sk.map(_._2).sum.toDouble
    sk.foreach { case (s, n, a) =>
      val quota = 12345L * n / totW
      assert(a >= math.floor(quota) && a <= math.ceil(quota), s"$s: $a vs quota $quota")
    }
    // loud failures: zero total weight, negative weight
    intercept[Exception] {
      Sampling.allocateBudget(Seq(("a", 0L)).toDF("src", "n"),
        col("src"), col("n"), 5L).collect()
    }
    intercept[Exception] {
      Sampling.allocateBudget(Seq(("a", -1L), ("b", 5L)).toDF("src", "n"),
        col("src"), col("n"), 5L).collect()
    }
  }

  test("mixEpochs: integer factors copy exactly, zero drops, fractional matches driver md5") {
    import spark.implicits._
    val data = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "c"))
      .toDF("id", "src")
    val factors = Map("a" -> 2.0, "b" -> 0.0, "c" -> 0.5)
    val withF = data.withColumn("f",
      when(col("src") === "a", 2.0).when(col("src") === "b", 0.0).otherwise(0.5))
    val out = Sampling.mixEpochs(withF, "id", col("src"), col("f"), "s0")
      .select("id", "src", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // src a: every doc exactly epochs {0, 1}; src b: gone
    assert(out.filter(_._2 == "a").groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap ==
      Map(1L -> Set(0L, 1L), 2L -> Set(0L, 1L)))
    assert(!out.exists(_._2 == "b"))
    // src c (f = 0.5): kept iff first 8 md5 hex digits of "s0:c:<id>" < 0x80000000
    def key(src: String, id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"s0:$src:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val wantC = Seq(4L, 5L).filter(id => key("c", id) < "80000000").toSet
    assert(out.filter(_._2 == "c").map(_._1).toSet == wantC)
    assert(out.filter(_._2 == "c").forall(_._3 == 0L))
  }

  test("mixEpochs fails loudly on negative or runaway factors") {
    import spark.implicits._
    val bad = Seq((1L, "a", -0.5)).toDF("id", "src", "f")
    val e = intercept[Exception] {
      Sampling.mixEpochs(bad, "id", col("src"), col("f"), "s0").collect()
    }
    assert(e.getMessage.contains("factor must be"), s"unexpected: ${e.getMessage}")
    val runaway = Seq((1L, "a", 1e6)).toDF("id", "src", "f")
    val e2 = intercept[Exception] {
      Sampling.mixEpochs(runaway, "id", col("src"), col("f"), "s0").collect()
    }
    assert(e2.getMessage.contains("factor must be"), s"unexpected: ${e2.getMessage}")
  }

  test("mixEpochs composed with temperatureWeights conserves expected mass") {
    val w = Sampling.temperatureWeights(docs, col("source"), col("n_chars"), tau = 0.5)
    val expanded = Sampling.mixEpochs(
      docs.join(broadcast(w.select(col("source"), col("upsample_factor"))), "source"),
      "doc_id", col("source"), col("upsample_factor"), "mix0")
    // per source, realized rows ≈ factor × docs (hash fraction ±1 doc slack
    // is exact in expectation; allow generous slack at fixture size)
    val factors = w.select("source", "upsample_factor").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val perSrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = expanded.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { case (src, n) =>
      val want = factors(src) * n
      val slack = math.max(4.0, 4 * math.sqrt(n))
      assert(math.abs(got.getOrElse(src, 0L) - want) <= slack,
        s"$src realized ${got.getOrElse(src, 0L)} vs expected $want")
    }
  }

  test("shuffleOrder matches a driver-side md5 sort and is a dense permutation") {
    val got = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", "epoch0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"epoch0:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => (hex(id), id)).sorted.map(_._2).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got == want)
    // dense 0..n-1, no gaps or ties
    assert(got.values.toSeq.sorted == (0L until got.size.toLong))
  }

  test("shuffleOrder: a new seed is a different permutation; same seed is stable") {
    val a = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", "epoch0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", "epoch0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", "epoch1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a != c, "different seed must permute differently")
    assert(c.values.toSeq.sorted == (0L until c.size.toLong))
  }

  test("interleaveSources: stride scheduling — weight-2 source appears ~2x " +
    "as often in every prefix; positions dense; deterministic") {
    import spark.implicits._
    val rows = ((0L until 40L).map(i => (i, "heavy")) ++
      (100L until 120L).map(i => (i, "light"))).toSeq.toDF("id", "src")
    val out = Sampling.interleaveSources(rows, "src", "id",
      Map("heavy" -> 2.0, "light" -> 1.0), numBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq == (0L until 60L))
    // exact stride property: in the first p positions, the heavy source
    // contributes ceil/floor of 2/3·p (±1 boundary slack)
    val ordered = out.sortBy(_._3).map(_._2)
    Seq(6, 15, 30, 45, 60).foreach { p =>
      val heavy = ordered.take(p).count(_ == "heavy")
      assert(math.abs(heavy - (2.0 * p / 3)) <= 1.0, s"prefix $p: $heavy heavy")
    }
    val again = Sampling.interleaveSources(rows, "src", "id",
      Map("heavy" -> 2.0, "light" -> 1.0), numBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("interleaveSources positions are bucket-count invariant (prefix sums associative)") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => (i, s"s${i % 3}")).toSeq.toDF("id", "src")
    def run(b: Int) = Sampling.interleaveSources(rows, "src", "id",
      Map("s0" -> 1.5), numBuckets = b)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(run(1) == run(7))
  }

  test("negativeSample: off-label only, never self, at most k, dense ranks") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i, (i % 3).toInt)).toSeq
    val out = Sampling.negativeSample(rows.toDF("id", "label"), "id", "label",
      k = 4, numBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(out.nonEmpty)
    out.foreach { case (a, al, _, n, nl) =>
      assert(al != nl, s"anchor $a drew same-label negative $n")
      assert(a != n)
    }
    out.groupBy(_._1).foreach { case (a, ns) =>
      val ranks = ns.map(_._3).sorted.toSeq
      assert(ranks.length <= 4 && ranks == (1 to ranks.length),
        s"anchor $a ranks $ranks")
    }
  }

  test("negativeSampleAuto: equals the fixed form at the derived floor; " +
      "more buckets derived as the corpus grows") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i, (i % 3).toInt)).toSeq
    val df = rows.toDF("id", "label")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(2), r.getLong(3))
    // n=60 < sliceTarget → derivation lands on minBuckets → identical set
    assert(Sampling.negativeSampleAuto(df, "id", "label", k = 4,
        sliceTarget = 512, minBuckets = 4).collect().map(key).toSet ==
      Sampling.negativeSample(df, "id", "label", k = 4, numBuckets = 4)
        .collect().map(key).toSet)
    // n=60, sliceTarget=10 → ⌈60/10⌉ = 6 buckets — the contract: slice
    // size stays ~sliceTarget instead of n/minBuckets
    assert(Sampling.negativeSampleAuto(df, "id", "label", k = 4,
        sliceTarget = 10, minBuckets = 2).collect().map(key).toSet ==
      Sampling.negativeSample(df, "id", "label", k = 4, numBuckets = 6)
        .collect().map(key).toSet)
    intercept[IllegalArgumentException](
      Sampling.negativeSampleAuto(df, "id", "label", 4, sliceTarget = 0))
  }

  test("negativeSample: deterministic, and ranks follow the md5 ordering") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, (i % 2).toInt)).toSeq
    val df = rows.toDF("id", "label")
    def run() = Sampling.negativeSample(df, "id", "label", k = 3, numBuckets = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    assert(run() == run())
    // driver-side recompute for one anchor: candidates in its bucket,
    // off-label, ordered by md5("neg:a:c")
    val b = (a: Long) => ((a * 2654435761L + 1) % 2)
    val cb = (c: Long) => ((c * 2654435761L) % 2)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val anchor = 0L
    val want = rows.filter { case (c, cl) => cb(c) == b(anchor) && cl != 0 && c != anchor }
      .map(_._1).sortBy(c => (md5hex(s"neg:$anchor:$c"), c)).take(3)
      .zipWithIndex.map { case (c, i) => (anchor, i + 1, c) }.toSet
    assert(run().filter(_._1 == anchor) == want)
  }

  test("rankInStratum equals row_number for every bucket count, including one giant stratum") {
    import org.apache.spark.sql.expressions.Window
    // skewed strata: one stratum holds 90% of rows — the shape the
    // bucketed prefix sum exists for (a partitionBy(stratum) window would
    // push all of it through one task)
    val df = docs.withColumn("stratum",
      when(col("doc_id") % 10 < 9, lit("giant")).otherwise(col("source")))
    val want = df.withColumn("stratum_rank",
        row_number().over(Window.partitionBy("stratum").orderBy("doc_id")).cast("long"))
      .select("doc_id", "stratum_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bucket boundaries must never change values (prefix sums are
    // associative) — try degenerate (1), default, and over-split counts
    for (n <- Seq(1, 7, 64)) {
      val got = Sampling.rankInStratum(df, col("stratum"), n, col("doc_id"))
        .select("doc_id", "stratum_rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"rank mismatch at numBuckets=$n")
    }
  }

  test("exactStratifiedSplit allocates exactly round(f*n) per stratum, even skewed") {
    val df = docs.withColumn("stratum",
      when(col("doc_id") % 10 < 9, lit("giant")).otherwise(col("source")))
    val out = Sampling.exactStratifiedSplit(df, "doc_id", col("stratum"), 0.3)
    val got = out.groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sizes = df.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (s, n) =>
      val want = math.round(n * 0.3)
      assert(got.getOrElse((s, "test"), 0L) == want, s"stratum $s: want $want")
      assert(got.getOrElse((s, "train"), 0L) == n - want)
    }
    // deterministic row-for-row
    val a = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.exactStratifiedSplit(df, "doc_id", col("stratum"), 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("rankInStratum and tokenBudget are invariant to input partitioning") {
    // the prefix sums must be pure functions of (strata, order) — never
    // of how the input happens to be partitioned when they run
    def rk(parts: Int) = Sampling.rankInStratum(
        docs.repartition(parts), col("source"), 5, col("doc_id"))
      .select("doc_id", "stratum_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rk(3) == rk(11))
    def tb(parts: Int) = Sampling.tokenBudget(
        docs.repartition(parts), col("source"), col("n_chars"), 5000L, col("doc_id"))
      .select("doc_id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tb(3) == tb(11))
  }

  test("curriculumOrder: dense easy-first positions, monotone tiers, balanced cuts") {
    val scored = docs.select(col("doc_id"), (col("n_chars") % 97).cast("double").as("difficulty"))
    val out = Sampling.curriculumOrder(scored, "doc_id", col("difficulty"), tiers = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
    val n = scored.count()
    // dense 0..n-1 positions, exactly one per row
    assert(out.map(_._4).sorted.toSeq == (0L until n))
    // tier is monotone along the training order (easy streams first)
    val byPos = out.sortBy(_._4)
    assert(byPos.map(_._3).toSeq == byPos.map(_._3).sorted.toSeq)
    // every tier-t row has difficulty <= every tier-(t+1) row's (cuts are
    // percentiles of the difficulty itself)
    val maxPerTier = out.groupBy(_._3).map { case (t, xs) => t -> xs.map(_._2).max }
    val minPerTier = out.groupBy(_._3).map { case (t, xs) => t -> xs.map(_._2).min }
    for (t <- 0 until 3 if maxPerTier.contains(t) && minPerTier.contains(t + 1))
      assert(maxPerTier(t) <= minPerTier(t + 1), s"tier $t overlaps ${t + 1}")
    // quartile cuts keep tiers within a reasonable band of n/4
    out.groupBy(_._3).foreach { case (t, xs) =>
      assert(xs.length > n / 8 && xs.length < n / 2, s"tier $t size ${xs.length}")
    }
    // deterministic
    val again = Sampling.curriculumOrder(scored, "doc_id", col("difficulty"), tiers = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  test("weightedSamplePerStratum keeps the k smallest ES keys per stratum") {
    val out = Sampling.weightedSamplePerStratum(
      docs, col("source"), k = 5, col("n_chars"), col("doc_id"))
    val perStratum = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(perStratum.nonEmpty)
    perStratum.foreach { case (s, n) => assert(n <= 5, s"stratum $s kept $n > k") }
    // selected rows are exactly the per-stratum minima of the full key set
    val allKeys = Sampling.weightedSamplePerStratum(
        docs, col("source"), k = Int.MaxValue, col("n_chars"), col("doc_id"))
      .select("source", "doc_id", "sample_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = allKeys.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._3, x._2)).take(5).toSeq }.map(x => (x._1, x._2)).toSet
    val got = out.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("domainReweight: a simplex that upweights excess-loss domains, " +
      "driver recomputation exact, smoothing floor holds") {
    import spark.implicits._
    val dl = Seq(("a", 700L, 2.0), ("b", 200L, 5.0), ("c", 100L, 3.0))
      .toDF("domain", "n_docs", "loss")
    val out = Sampling.domainReweight(dl, steps = 20, eta = 1.0, smoothing = 0.01)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getDouble(4), r.getDouble(5)))
    // a simplex (to output rounding)
    assert(math.abs(out.map(_._2).sum - 1.0) < 3e-6, out.toSeq.toString)
    // the high-loss minority domain gains weight, the easy majority sheds
    val byName = out.map(t => t._1 -> t._3).toMap
    assert(byName("b") > 1.0, s"hard domain must upsample: $byName")
    assert(byName("a") < 1.0, s"easy majority must downsample: $byName")
    // smoothing floor: every domain keeps at least c/k
    assert(out.forall(_._2 >= 0.01 / 3 - 1e-9))
    // driver recomputation of the exact published update (12-dp ladder)
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val l = Array(2.0, 5.0, 3.0)
    var w = Array(0.7, 0.2, 0.1).map(r(_, 12))
    (1 to 20).foreach { _ =>
      val b = r(w.indices.map(i => w(i) * l(i)).sum / w.sum, 12)
      w = w.indices.map(i => r(w(i) * math.exp(math.max(0.0, l(i) - b)), 12)).toArray
    }
    val sw = w.sum
    val expect = w.map(x => r(0.99 * x / sw + 0.01 / 3, 6))
    assert(out.map(_._2).toSeq == expect.toSeq,
      s"got ${out.map(_._2).toSeq}, want ${expect.toSeq}")
    // eta monotonicity: a hotter update concentrates more on the hard domain
    val alphaByName = out.map(t => t._1 -> t._2).toMap
    val hot = Sampling.domainReweight(dl, steps = 20, eta = 2.0, smoothing = 0.01)
      .orderBy("domain").collect().map(r2 => r2.getString(0) -> r2.getDouble(4)).toMap
    assert(hot("b") >= alphaByName("b") - 1e-9)
    intercept[IllegalArgumentException](
      Sampling.domainReweight(dl, steps = 0))
    intercept[IllegalArgumentException](
      Sampling.domainReweight(dl, smoothing = 1.0))
  }
}
