package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  import DataQuality._

  test("columnChecks: one pass, dotted check names resolve (regression)") {
    // check names carry the production "table.check" convention — the
    // old implementation aliased agg columns BY that name and read them
    // back with col(name), which parsed the dot as struct access and
    // failed analysis (UNRESOLVED_COLUMN, the r12 bench error)
    val t = Seq((1, Some(5.0)), (2, Some(60.0)), (3, None)).toDF("id", "v")
    val got = columnChecks(t, Seq(
        ColCheck("t.v_in_range", col("v").isNull || col("v") > 50),
        ColCheck("t.v_not_null", col("v").isNull)))
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("t.v_in_range", 2L, 3L), ("t.v_not_null", 1L, 3L)))
  }

  test("columnChecks: empty frame reports 0/0, not null") {
    val t = Seq.empty[(Int, Double)].toDF("id", "v")
    val got = columnChecks(t, Seq(ColCheck("t.bad", col("v") < 0)))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L)))
  }

  test("unique: surplus beyond one row per key") {
    val t = Seq(1, 2, 2, 3).toDF("k")
    val got = unique(t, "t.k_unique", Seq("k")).collect().head
    assert((got.getLong(1), got.getLong(2)) == (1L, 4L))
  }

  test("foreignKey: unmatched and NULL fks are both orphans") {
    val child = Seq(Some(1), Some(2), None, Some(9)).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val got = foreignKey(child, "fk", parent, "pk", "c.fk").collect().head
    assert((got.getLong(1), got.getLong(2)) == (2L, 4L))
  }

  test("duplicate check names fail fast, not as DUPLICATED_MAP_KEY at runtime") {
    val t = Seq((1, 5.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      columnChecks(t, Seq(
        ColCheck("t.v", col("v") < 0),
        ColCheck("t.v", col("v") > 1)))
    }
  }

  test("report: union keeps uniform schema and pass = (violations == 0)") {
    val t = Seq((1, 5.0)).toDF("id", "v")
    val rep = report(Seq(
        columnChecks(t, Seq(
          ColCheck("t.v_negative", col("v") < 0),
          ColCheck("t.v_over_1", col("v") > 1))),
        unique(t, "t.id_unique", Seq("id"))))
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(rep.toSeq == Seq(
      ("t.id_unique", 0L, true),
      ("t.v_negative", 0L, true),
      ("t.v_over_1", 1L, false)))
  }
}
