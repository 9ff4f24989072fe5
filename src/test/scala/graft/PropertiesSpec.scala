package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Loads
import graft.schema.{Ddl, SqlDialect}

/** Property-based tests (SURVEY.md §5.3): DDL round trip and
  * merge-semantics invariants over ScalaCheck-generated data (raw Gen with
  * fixed seeds — deterministic, no scalatestplus bridge needed).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  // ---- DDL round trip ----

  private val cleanTypes: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, StringType, BooleanType, TimestampType, DateType,
    DecimalType(12, 2), DecimalType(38, 9))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 8)
    fields <- Gen.listOfN(n, for {
      name <- Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty)
      dt <- cleanTypes
      nullable <- Gen.oneOf(true, false)
    } yield StructField(name, dt, nullable))
  } yield StructType(fields.zipWithIndex.map { case (f, i) => f.copy(name = s"${f.name}_$i") })

  test("property: schemaToDdl then ddlToSchema is identity on clean types (all dialects)") {
    for {
      schema <- samples(schemaGen, 15)
      dialect <- Seq(SqlDialect.MySql, SqlDialect.SqlServer, SqlDialect.Postgres)
    } {
      val ddl = Ddl.schemaToDdl(schema, "t", dialect)
      val back = Ddl.ddlToSchema(ddl, dialect)
      assert(back.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq,
        s"\ndialect=$dialect ddl=\n$ddl")
    }
  }

  test("NVARCHAR promotion survives the round trip") {
    val s = StructType(Seq(StructField("c", StringType)))
    val marked = Ddl.markNvarchar(s, Map("c" -> true))
    val back = Ddl.ddlToSchema(Ddl.schemaToDdl(marked, "t", SqlDialect.SqlServer), SqlDialect.SqlServer)
    assert(back("c").metadata.getBoolean(graft.schema.TypeMap.NvarcharKey))
  }

  // ---- merge-semantics invariants over generated keyed data ----

  private val rowsGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 15L)
      day <- Gen.choose(0L, 60L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (k, day, v))
  } yield rows

  test("property: upsert is idempotent, keyed-complete, incoming-wins") {
    for ((e, i) <- samples(rowsGen, 8).zip(samples(rowsGen, 8).reverse)) {
      val existing = e.distinctBy(_._1).toDF("k", "day", "v")
      val incoming = i.distinctBy(_._1).toDF("k", "day", "v")
      val once = Loads.upsert(existing, incoming, Seq("k"))
      val twice = Loads.upsert(once, incoming, Seq("k"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      assert(once.groupBy("k").count().filter(col("count") =!= 1).isEmpty)
      val incomingKeys = incoming.select("k").as[Long].collect().toSet
      if (incomingKeys.nonEmpty) {
        val winners = once.filter(col("k").isin(incomingKeys.toSeq: _*))
        assert(winners.exceptAll(incoming).isEmpty)
      }
    }
  }

  test("property: L5 refresh is idempotent; L3 re-run appends exactly the overlap") {
    for (rows <- samples(rowsGen, 8)) {
      val existing = rows.toDF("k", "day", "v")
      val windowPred = col("day") >= 30L
      val incoming = existing.filter(windowPred)
      val l5Once = Loads.refreshWindow(existing, incoming, windowPred)
      val l5Twice = Loads.refreshWindow(l5Once, incoming, windowPred)
      assert(l5Once.exceptAll(l5Twice).isEmpty && l5Twice.exceptAll(l5Once).isEmpty)

      val l3Once = Loads.retainThenAppend(existing, incoming, windowPred)
      assert(l3Once.count() == existing.filter(windowPred).count() + incoming.count())
    }
  }

  // ---- sampling / curation invariants over generated data ----

  private val budgetRowsGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 50)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("a", "b", "c")
      tok <- Gen.choose(1L, 400L)
    } yield (src, tok))
  } yield rows.zipWithIndex.map { case ((s, t), i) => (s, i.toLong, t) }

  test("property: tokenBudget kept set equals the driver-side greedy prefix; never over budget") {
    for (rows <- samples(budgetRowsGen, 8)) {
      val budget = 600L
      val df = rows.toDF("src", "id", "tokens")
      val kept = graft.ops.Sampling
        .tokenBudget(df, col("src"), col("tokens"), budget, col("id"))
        .select("src", "id", "cum_tokens").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(_._2).scanLeft(("", -1L, 0L)) { case ((_, _, cum), (s, i, t)) =>
          (s, i, cum + t)
        }.tail.filter(_._3 <= budget)
      }.toSet
      assert(kept == want)
      kept.groupBy(_._1).foreach { case (_, ks) =>
        assert(ks.map(_._3).max <= budget)
      }
    }
  }

  private val clusterGen: Gen[(List[(Long, Double)], List[(Long, Long)])] = for {
    n <- Gen.choose(2, 16)
    scores <- Gen.listOfN(n, Gen.choose(0.0, 1.0).map(s => math.rint(s * 100) / 100))
    nPairs <- Gen.choose(0, 10)
    pairs <- Gen.listOfN(nPairs, for {
      a <- Gen.choose(0L, (n - 1).toLong)
      b <- Gen.choose(0L, (n - 1).toLong)
    } yield (math.min(a, b), math.max(a, b)))
  } yield (scores.zipWithIndex.map { case (s, i) => (i.toLong, s) },
    pairs.filter(p => p._1 != p._2).distinct)

  // 3 samples: each CC fixpoint is an iterative multi-job plan — more
  // samples cost CI minutes without adding shape coverage beyond
  // (no pairs / chain / star / multi-cluster), which 3 seeds already hit
  test("property: canonicalByQuality keeps exactly one max-score member per component, all singletons") {
    for (((rows, pairs), seed) <- samples(clusterGen, 3).zipWithIndex) {
      val df = rows.toDF("id", "q")
      if (pairs.isEmpty) {
        val kept = graft.ops.Dedup
          .canonicalByQuality(df, Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id", col("q"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(kept == rows.map(r => (r._1, 1L)).toSet, s"seed=$seed")
      } else {
        val pdf = pairs.toDF("id_a", "id_b")
        val kept = graft.ops.Dedup.canonicalByQuality(df, pdf, "id", col("q"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
        val byComp = rows.filter(r => parent.contains(r._1))
          .groupBy(r => find(r._1))
        val wantWinners = byComp.map { case (_, members) =>
          val best = members.map(_._2).max
          val id = members.filter(_._2 == best).map(_._1).min
          (id, members.size.toLong, best)
        }.toSet
        val wantSingles = rows.filter(r => !parent.contains(r._1))
          .map(r => (r._1, 1L, r._2)).toSet
        assert(kept.toSet == wantWinners ++ wantSingles, s"seed=$seed")
      }
    }
  }

  test("property: nllScore equals a driver-side recomputation (self-trained, no OOV)") {
    val textGen: Gen[List[String]] = for {
      n <- Gen.choose(1, 15)
      docs <- Gen.listOfN(n, Gen.listOf(Gen.oneOf("x", "y", "z", "w"))
        .map(ts => if (ts.isEmpty) "x" else ts.mkString(" ")))
    } yield docs
    for (docs <- samples(textGen, 6)) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.ops.TextAnalysis
        .nllScore(df, "id", "text", graft.ops.TextAnalysis.unigramModel(df, "text"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val toks = docs.map(_.split(" ", -1).toSeq)
      val freq = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
      val n = toks.map(_.size).sum.toDouble
      docs.indices.foreach { i =>
        val want = toks(i).map(t => -math.log(freq(t) / n)).sum / toks(i).size
        assert(math.abs(got(i.toLong) - math.rint(want * 1e4) / 1e4) < 1e-9, s"doc $i")
      }
    }
  }

  test("property: KMV sketch of a union equals the merge of the parts' sketches") {
    import graft.ops.Kmv
    val setGen = Gen.listOfN(400, Gen.choose(0L, 5000L)).map(_.distinct)
    for (seedIdx <- 0 until 5) {
      val a = samples(setGen, 1).head.map(v => ("A", v))
      val b = (0 until 1).flatMap(_ => samples(setGen.map(_.map(_ + seedIdx * 1000)), 1).head)
        .map(v => ("A", v))
      val k = 64
      // sketch(A ∪ B) must equal the k smallest of sketch(A) ∪ sketch(B):
      // the mergeability that makes the aggregation partial-safe
      val spark2 = spark
      import spark2.implicits._
      def sk(rows: Seq[(String, Long)]) = Kmv.sketch(rows.toDF("g", "v"), col("g"), col("v"), k)
        .select("kmv").head().getSeq[Long](0).toVector
      val skU = sk(a ++ b)
      val merged = (sk(a) ++ sk(b)).distinct.sorted.take(k).toVector
      assert(skU == merged, s"seed $seedIdx")
    }
  }

  test("property: mergeAggregate is split-invariant — any delta partitioning gives one rollup") {
    val li = graft.etl.Tables.lineitem(spark, GraftSpark.Sf0001).limit(2000)
      .localCheckpoint()
    def rollup(df: org.apache.spark.sql.DataFrame) = df.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"), sum("l_quantity").as("l_quantity"))
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), math.rint(r.getDouble(2) * 1e4))).toSeq
    val full = norm(rollup(li))
    for (m <- Seq(2, 3, 5)) {
      // split the facts m ways by orderkey residue and fold them in
      var acc = rollup(li.filter(col("l_orderkey") % m === 0))
      (1 until m).foreach { r =>
        acc = Loads.mergeAggregate(acc, li.filter(col("l_orderkey") % m === r),
          Seq("l_returnflag"), Seq("l_quantity"), "n")
      }
      assert(norm(acc) == full, s"m=$m")
    }
  }

  test("property: every attribution model conserves total conversion value") {
    import graft.ops.Attribution
    // random event streams: a handful of users, mixed touches/purchases
    // at random second offsets inside one week
    val evGen = Gen.listOfN(60, for {
      user <- Gen.choose(1L, 5L)
      offSec <- Gen.choose(0L, 6L * 86400L)
      kind <- Gen.oneOf("purchase", "view", "click", "signup")
      value <- Gen.choose(1, 500).map(_.toDouble)
    } yield (user, offSec, kind, value))
    for ((rows, seedIdx) <- samples(evGen, 5).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((u, off, kind, v), i) =>
        (i.toLong, u, new java.sql.Timestamp(1700000000000L + off * 1000L), kind, v)
      }.toDF("event_id", "user_id", "ts", "event_type", "value")
      val conv = df.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      if (conv.count() > 0) {
        val report = Attribution.report(Attribution.credits(conv,
          df.filter(col("event_type") =!= "purchase")
            .select(col("user_id"), col("ts"), col("event_type")),
          "user_id", "ts", "event_id", "value", "event_type",
          expr("INTERVAL 2 DAYS")))
        val total = conv.agg(sum("value")).head().getDouble(0)
        Seq("last_value", "linear_value", "decay_value", "position_value")
          .foreach { m =>
            val s = report.agg(sum(m)).head().getDouble(0)
            // report() rounds per channel to 4dp → up to channels×5e-5
            // aggregate rounding; a REAL leak is at least one credit (~1)
            assert(math.abs(s - total) < 1e-3,
              s"seed $seedIdx: $m sums to $s, expected $total")
          }
      }
    }
  }

  test("property: BM25 erase equals a rebuild on the retained corpus (random victims)") {
    import graft.ops.Bm25Index
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
      .limit(120).localCheckpoint()
    val built = Bm25Index.build(docs, "doc_id", "text")
    val victimGen = Gen.listOfN(25, Gen.choose(0L, 119L)).map(_.distinct)
    for ((ids, seedIdx) <- samples(victimGen, 4).zipWithIndex) {
      val victims = ids.toDF("doc_id")
      val erased = Bm25Index.erase(built, victims)
      val rebuilt = Bm25Index.build(
        docs.join(victims, Seq("doc_id"), "left_anti"), "doc_id", "text")
      assert(erased.postings.exceptAll(rebuilt.postings).isEmpty &&
        rebuilt.postings.exceptAll(erased.postings).isEmpty, s"seed $seedIdx postings")
      assert(erased.terms.exceptAll(rebuilt.terms).isEmpty &&
        rebuilt.terms.exceptAll(erased.terms).isEmpty, s"seed $seedIdx terms")
      val (se, sr) = (erased.stats.head(), rebuilt.stats.head())
      assert(se.getDouble(0) == sr.getDouble(0), s"seed $seedIdx n")
      assert(math.abs(se.getDouble(1) - sr.getDouble(1)) < 1e-9, s"seed $seedIdx avgdl")
    }
  }
}
