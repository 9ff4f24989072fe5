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
}
