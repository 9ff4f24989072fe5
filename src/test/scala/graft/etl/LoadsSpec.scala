package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

/** Load/merge semantics: the SURVEY.md §7.3 faithful-vs-fixed properties —
  * L3 duplicates the overlap on re-run, L5 is idempotent, upsert is
  * idempotent and incoming-wins.
  */
class LoadsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val ref = LocalDate.parse("2001-11-04")

  private def li: DataFrame = Tables.lineitem(spark, GraftSpark.Sf0001)

  test("L3 faithful: re-running duplicates the retained window (reference bug reproduced)") {
    val incoming = li.filter(Windows.inWindow(col("l_shipdate"), ref, 30))
    val n = incoming.count()
    val once = Loads.retainThenAppend(li, incoming, Windows.inWindow(col("l_shipdate"), ref, 30))
    val twice = Loads.retainThenAppend(once, incoming, Windows.inWindow(col("l_shipdate"), ref, 30))
    assert(once.count() == 2 * n)
    assert(twice.count() == 3 * n)
  }

  test("L5: window refresh is idempotent (re-run == single run)") {
    val incoming = li.filter(Windows.inWindow(col("l_shipdate"), ref, 30))
    val pred = Windows.insideRefreshWindow(col("l_shipdate"), ref, 30)
    val once = Loads.refreshWindow(li, incoming, pred)
    val twice = Loads.refreshWindow(once, incoming, pred)
    assert(once.count() == li.count())
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("L3 dedup variant does NOT duplicate") {
    val incoming = li.filter(Windows.inWindow(col("l_shipdate"), ref, 30))
    val once = Loads.retainThenAppendDedup(li, incoming,
      Windows.inWindow(col("l_shipdate"), ref, 30), keys = Seq("l_orderkey", "l_linenumber"))
    assert(once.count() == incoming.count())
  }

  test("L4 upsert: incoming wins, unmatched existing retained, idempotent") {
    val existing = Seq((1L, "old", 10.0), (2L, "keep", 20.0)).toDF("k", "s", "v")
    val incoming = Seq((1L, "new", 11.0), (3L, "ins", 30.0)).toDF("k", "s", "v")
    val out = Loads.upsert(existing, incoming, Seq("k")).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    val again = Loads.upsert(Loads.upsert(existing, incoming, Seq("k")), incoming, Seq("k"))
    assert(again.orderBy("k").collect() === Loads.upsert(existing, incoming, Seq("k")).orderBy("k").collect())
  }

  test("L4 upsert: tie-break within incoming by tieBreak column descending") {
    val existing = Seq((1L, "old", 0)).toDF("k", "s", "ver")
    val incoming = Seq((1L, "v1", 1), (1L, "v2", 2)).toDF("k", "s", "ver")
    val out = Loads.upsert(existing, incoming, Seq("k"), tieBreak = Seq("ver")).collect()
    assert(out.length == 1 && out(0).getString(1) == "v2")
  }

  test("L4 upsert: intra-batch duplicate keys with NO tieBreak resolve by row content, " +
      "independent of partitioning") {
    val existing = Seq((1L, "old", 0.0)).toDF("k", "s", "v")
    // same key, equal source priority, no tieBreak: winner must be the
    // content-order max (s desc → "zz"), not whichever partition scans first
    val dupA = Seq((1L, "aa", 5.0), (1L, "zz", 3.0)).toDF("k", "s", "v")
    val dupB = dupA.repartition(7) // different physical order, same rows
    val winA = Loads.upsert(existing, dupA, Seq("k")).collect()
    val winB = Loads.upsert(existing, dupB, Seq("k")).collect()
    assert(winA.length == 1 && winA(0).getString(1) == "zz")
    assert(winA.toSeq == winB.toSeq)
  }

  test("L6 deleteWhere removes exactly the predicate rows") {
    val orders = Tables.orders(spark, GraftSpark.Sf0001)
    val pred = Windows.olderThanWindow(col("o_orderdate"), LocalDate.parse("2001-08-01"), 30)
    val kept = Loads.deleteWhere(orders, pred)
    assert(kept.count() == orders.filter(!pred).count())
    assert(kept.filter(pred).isEmpty)
  }

  test("L2 overwrite result is exactly incoming") {
    val incoming = li.limit(5)
    assert(Loads.overwrite(li, incoming).count() == 5)
  }

  private val t0 = java.sql.Timestamp.valueOf("2001-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2001-06-01 00:00:00")
  private val t2 = java.sql.Timestamp.valueOf("2001-12-01 00:00:00")

  private def dim(rows: (Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])*) =
    rows.toDF("k", "v", "valid_from", "valid_to")

  test("L7 scd2: change closes the open row and opens a new one; unchanged and absent keys pass through") {
    val current = dim((1L, "a", t0, None), (2L, "b", t0, None), (3L, "c", t0, None))
    val incoming = Seq((1L, "a2"), (2L, "b")).toDF("k", "v") // 1 changed, 2 unchanged, 3 absent
    val out = Loads.scd2(current, incoming, Seq("k"), lit(t1))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(out.toSeq == Seq(
      (1L, "a", t0, Some(t1)), (1L, "a2", t1, None),
      (2L, "b", t0, None),
      (3L, "c", t0, None)))
  }

  test("L7 scd2: unseen keys open fresh rows; closed history is untouched") {
    val current = dim((1L, "a", t0, Some(t1)), (1L, "a2", t1, None))
    val incoming = Seq((1L, "a2"), (9L, "new")).toDF("k", "v")
    val out = Loads.scd2(current, incoming, Seq("k"), lit(t2))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(out.toSeq == Seq(
      (1L, "a", t0, Some(t1)), (1L, "a2", t1, None),
      (9L, "new", t2, None)))
  }

  test("L7 scd2: applying the same snapshot twice is a no-op (idempotent)") {
    val current = dim((1L, "a", t0, None), (2L, "b", t0, None))
    val incoming = Seq((1L, "a2"), (2L, "b")).toDF("k", "v")
    val once = Loads.scd2(current, incoming, Seq("k"), lit(t1))
    val twice = Loads.scd2(once, incoming, Seq("k"), lit(t2))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("L7 scd2: three generations accumulate in order") {
    val current = dim((1L, "v1", t0, None))
    val g2 = Loads.scd2(current, Seq((1L, "v2")).toDF("k", "v"), Seq("k"), lit(t1))
    val g3 = Loads.scd2(g2, Seq((1L, "v3")).toDF("k", "v"), Seq("k"), lit(t2))
    val out = g3.orderBy("valid_from").collect()
      .map(r => (r.getString(1), Option(r.getTimestamp(3))))
    assert(out.toSeq == Seq(("v1", Some(t1)), ("v2", Some(t2)), ("v3", None)))
    // exactly one open row per key
    assert(g3.filter(col("valid_to").isNull).count() == 1)
  }

  test("L8 mergeAggregate: incremental refresh equals the full recompute, chainable") {
    def rollup(df: DataFrame) = df.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"), sum("l_quantity").as("l_quantity"))
    val cut1 = lit("1999-01-01").cast("timestamp")
    val cut2 = lit("2001-01-01").cast("timestamp")
    val existing = rollup(li.filter(col("l_shipdate") < cut1))
    // two sequential deltas — maintenance must chain
    val step1 = Loads.mergeAggregate(existing,
      li.filter(col("l_shipdate") >= cut1 && col("l_shipdate") < cut2),
      Seq("l_returnflag"), Seq("l_quantity"), "n")
    val step2 = Loads.mergeAggregate(step1,
      li.filter(col("l_shipdate") >= cut2),
      Seq("l_returnflag"), Seq("l_quantity"), "n")
    val got = step2.orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e4)))
    val want = rollup(li).orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e4)))
    assert(got.toSeq == want.toSeq)
    // schema contract enforced loudly
    intercept[IllegalArgumentException] {
      Loads.mergeAggregate(existing.drop("n"), li, Seq("l_returnflag"),
        Seq("l_quantity"), "n")
    }
  }

  test("L8 mergeAggregate with mixed sum/min/max specs equals the full recompute, chainable") {
    val specs = Seq(Loads.AggSpec("l_quantity", "sum"),
      Loads.AggSpec("l_extendedprice", "min"),
      Loads.AggSpec("l_shipdate", "max"))
    def rollup(df: DataFrame) = df.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"), sum("l_quantity").as("l_quantity"),
        min("l_extendedprice").as("l_extendedprice"), max("l_shipdate").as("l_shipdate"))
    def render(df: DataFrame) = df.orderBy("l_returnflag").collect().map(r =>
      (r.getString(r.fieldIndex("l_returnflag")), r.getLong(r.fieldIndex("n")),
        math.round(r.getDouble(r.fieldIndex("l_quantity")) * 1e4),
        math.round(r.getDouble(r.fieldIndex("l_extendedprice")) * 1e4),
        r.get(r.fieldIndex("l_shipdate")).toString)).toSeq
    val cut1 = lit("1999-01-01").cast("timestamp")
    val cut2 = lit("2001-01-01").cast("timestamp")
    val step1 = Loads.mergeAggregate(rollup(li.filter(col("l_shipdate") < cut1)),
      li.filter(col("l_shipdate") >= cut1 && col("l_shipdate") < cut2),
      Seq("l_returnflag"), specs, "n")
    val step2 = Loads.mergeAggregate(step1, li.filter(col("l_shipdate") >= cut2),
      Seq("l_returnflag"), specs, "n")
    assert(render(step2) == render(rollup(li)))
    // a non-algebraic agg is rejected at spec construction
    intercept[IllegalArgumentException](Loads.AggSpec("l_quantity", "median"))
    // duplicate spec columns are rejected
    intercept[IllegalArgumentException] {
      Loads.mergeAggregate(rollup(li), li, Seq("l_returnflag"),
        Seq(Loads.AggSpec("l_quantity", "sum"), Loads.AggSpec("l_quantity", "min")), "n")
    }
  }

  test("L8 rollupErase: retraction equals the rebuild without victims; " +
      "fully-erased keys drop; value conservation") {
    val specs = Seq(Loads.AggSpec("l_quantity", "sum"),
      Loads.AggSpec("l_extendedprice", "min"),
      Loads.AggSpec("l_shipdate", "max"))
    def rollup(df: DataFrame) = df.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"), sum("l_quantity").as("l_quantity"),
        min("l_extendedprice").as("l_extendedprice"), max("l_shipdate").as("l_shipdate"))
    def render(df: DataFrame) = df.orderBy("l_returnflag").collect().map(r =>
      (r.getString(r.fieldIndex("l_returnflag")), r.getLong(r.fieldIndex("n")),
        math.round(r.getDouble(r.fieldIndex("l_quantity")) * 1e4),
        math.round(r.getDouble(r.fieldIndex("l_extendedprice")) * 1e4),
        r.get(r.fieldIndex("l_shipdate")).toString)).toSeq
    val isVictim = pmod(col("l_suppkey"), lit(13)) === 0
    val erased = Loads.rollupErase(rollup(li), li.filter(isVictim),
      Seq("l_returnflag"), specs, "n", retained = li.filter(!isVictim))
    assert(render(erased) == render(rollup(li.filter(!isVictim))))
    // value conservation: erased-rollup partials + victims' partials =
    // original rollup partials (count and sum; sums here are
    // integer-valued doubles, so equality is exact)
    val origTot = rollup(li).agg(sum("n"), sum("l_quantity")).head()
    val afterTot = erased.agg(sum("n"), sum("l_quantity")).head()
    val vTot = li.filter(isVictim)
      .agg(count(lit(1)).cast("long"), sum("l_quantity")).head()
    assert(afterTot.getLong(0) + vTot.getLong(0) == origTot.getLong(0))
    assert(afterTot.getDouble(1) + vTot.getDouble(1) == origTot.getDouble(1))
    // a FULLY-victim key drops out of the rollup entirely
    val fullVictims = li.filter(col("l_returnflag") === "R")
    val dropped = Loads.rollupErase(rollup(li), fullVictims,
      Seq("l_returnflag"), specs, "n",
      retained = li.filter(col("l_returnflag") =!= "R"))
    assert(render(dropped) == render(rollup(li.filter(col("l_returnflag") =!= "R"))))
    assert(!dropped.select("l_returnflag").collect().map(_.getString(0)).contains("R"))
    // all-sum rollups never read `retained` (null is fine)
    val sumOnly = Loads.rollupErase(rollup(li).drop("l_extendedprice", "l_shipdate"),
      li.filter(isVictim), Seq("l_returnflag"),
      Seq(Loads.AggSpec("l_quantity", "sum")), "n")
    assert(render(sumOnly.withColumn("l_extendedprice", lit(0.0))
        .withColumn("l_shipdate", lit("x"))).map(t => (t._1, t._2, t._3)) ==
      render(rollup(li.filter(!isVictim))).map(t => (t._1, t._2, t._3)))
    // min/max specs without `retained` are rejected
    intercept[IllegalArgumentException] {
      Loads.rollupErase(rollup(li), li.filter(isVictim),
        Seq("l_returnflag"), specs, "n")
    }
  }

  test("L8 rollupErase retracts NULL-key groups (null-safe key joins)") {
    // groupBy keeps a NULL-key group, so a rollup on a nullable key has
    // NULL-key rows; plain equi-joins would never match them and their
    // victims would silently survive the erase
    val facts = Seq(
      (Option("a"), 10.0, "u1"), (Option("a"), 20.0, "u2"),
      (Option.empty[String], 5.0, "u1"), (Option.empty[String], 7.0, "u2"),
      (Option.empty[String], 9.0, "u3")
    ).toDF("k", "v", "subject")
    val victims = facts.filter(col("subject") === "u1")
    val sumRollup = facts.groupBy("k")
      .agg(count(lit(1)).cast("long").as("n"), sum("v").as("v"))
    val erased = Loads.rollupErase(sumRollup, victims.drop("subject"),
        Seq("k"), Seq(Loads.AggSpec("v", "sum")), "n")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(erased == Set((Some("a"), 1L, 20.0), (None, 2L, 16.0)))
    // the keyed min/max recompute path must also match the NULL group
    val mixRollup = facts.groupBy("k")
      .agg(count(lit(1)).cast("long").as("n"), sum("v").as("v"),
        max("subject").as("subject"))
    val erased2 = Loads.rollupErase(mixRollup, victims, Seq("k"),
        Seq(Loads.AggSpec("v", "sum"), Loads.AggSpec("subject", "max")), "n",
        retained = facts.filter(col("subject") =!= "u1"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(erased2 == Set((Some("a"), 1L, 20.0, "u2"), (None, 2L, 16.0, "u3")))
  }
}
