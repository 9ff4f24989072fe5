package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def statusMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("diff classifies added / removed / changed / unchanged (known answer)") {
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("id", "v", "n")
    val b = Seq((2L, "y", 20), (3L, "zz", 30), (4L, "w", 40)).toDF("id", "v", "n")
    assert(statusMap(Snapshot.diff(a, b, "id")) == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val summary = Snapshot.diffSummary(a, b, "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("fingerprints are unambiguous under control characters and NULLs") {
    // separator-style encodings collide on these; per-column md5 must not:
    // ("a\\u0001b", "c") vs ("a", "b\\u0001c") shift a control char across
    // the column boundary, ("\\u0002", x) vs (null, x) hit the null mark
    val a = Seq((1L, "a\u0001b", "c"), (2L, "\u0002", "k")).toDF("id", "c1", "c2")
    val b = Seq((1L, "a", "b\u0001c"), (2L, null.asInstanceOf[String], "k")).toDF("id", "c1", "c2")
    assert(statusMap(Snapshot.diff(a, b, "id")) == Map(1L -> "changed", 2L -> "changed"))
  }

  test("duplicate ids compare as multisets (one deterministic row per id)") {
    val a = Seq((1L, "x"), (1L, "y"), (2L, "p")).toDF("id", "v")
    val sameOtherOrder = Seq((1L, "y"), (1L, "x"), (2L, "p")).toDF("id", "v")
    val replaced = Seq((1L, "x"), (1L, "x"), (2L, "p")).toDF("id", "v")
    val d1 = Snapshot.diff(a, sameOtherOrder, "id")
    assert(d1.count() == 2, "exactly one row per id, duplicates never fan out")
    assert(statusMap(d1) == Map(1L -> "unchanged", 2L -> "unchanged"))
    // same ids, different multiset ({x,y} vs {x,x}) → changed
    assert(statusMap(Snapshot.diff(a, replaced, "id"))(1L) == "changed")
  }

  test("compareCols defaults to the shared non-id columns (schema evolution)") {
    val a = Seq((1L, "x", "only-a")).toDF("id", "v", "extra_a")
    val b = Seq((1L, "x", "only-b")).toDF("id", "v", "extra_b")
    // extra_* differ but are not shared — the diff must ignore them
    assert(statusMap(Snapshot.diff(a, b, "id")) == Map(1L -> "unchanged"))
    val bChanged = Seq((1L, "X", "only-b")).toDF("id", "v", "extra_b")
    assert(statusMap(Snapshot.diff(a, bChanged, "id")) == Map(1L -> "changed"))
  }

  test("changeSet carries b's payload for insert/update, NULLs for delete") {
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("id", "v", "n")
    val b = Seq((2L, "y", 20), (3L, "zz", 30), (4L, "w", 40)).toDF("id", "v", "n")
    val got = Snapshot.changeSet(a, b, "id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getInt(3))))
      .toMap
    assert(got == Map(
      1L -> ("delete", None, None),
      3L -> ("update", Some("zz"), Some(30)),
      4L -> ("insert", Some("w"), Some(40))))
  }

  test("applyChangeSet round-trip: apply(a, changeSet(a->b)) == b") {
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("id", "v", "n")
    val b = Seq((2L, "y", 20), (3L, "zz", 30), (4L, "w", 40)).toDF("id", "v", "n")
    val applied = Snapshot.applyChangeSet(a, Snapshot.changeSet(a, b, "id"), "id")
    assert(applied.exceptAll(b).isEmpty && b.exceptAll(applied).isEmpty)
  }

  test("applyChangeSet round-trip on fixture documents (drop/modify/add churn)") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val old = docs.filter(col("doc_id") % 11 =!= 3)
    val neu = docs.filter(col("doc_id") % 13 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 17 === 2, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    val applied = Snapshot.applyChangeSet(old, Snapshot.changeSet(old, neu, "doc_id"), "doc_id")
    assert(applied.exceptAll(neu).isEmpty && neu.exceptAll(applied).isEmpty)
  }

  test("diff plan carries no extra exchange beyond the per-side shuffles") {
    // the per-id aggregate and the full-outer join key on the same column:
    // AQE/EnsureRequirements must not add a third shuffle per side
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((1L, "x")).toDF("id", "v")
    val plan = Snapshot.diff(a, b, "id").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 hash exchanges, got $exchanges:\n$plan")
  }
}
