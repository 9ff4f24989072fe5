package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class SanitizeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("T1: +Inf and -Inf become NULL in double columns") {
    val df = Seq(
      (1L, Double.PositiveInfinity, "a"),
      (2L, Double.NegativeInfinity, "b"),
      (3L, 1.5, "c")).toDF("id", "v", "s")
    val out = Sanitize.sanitizeInf(df).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1) == 1.5)
  }

  test("T1: NaN is left untouched (reference replaces only infinities)") {
    val df = Seq((1L, Double.NaN)).toDF("id", "v")
    val out = Sanitize.sanitizeInf(df).collect()
    assert(out(0).getDouble(1).isNaN)
  }

  test("T1: non-double columns pass through bit-identical") {
    val df = Seq((1L, "x", 7)).toDF("id", "s", "n")
    assert(Sanitize.sanitizeInf(df).collect() === df.collect())
  }

  test("T1: float columns are sanitized too") {
    val df = Seq((1L, Float.PositiveInfinity), (2L, 2.5f)).toDF("id", "v")
    val out = Sanitize.sanitizeInf(df).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getFloat(1) == 2.5f)
  }

  test("P2: drop tolerates absent columns") {
    val df = Seq((1, "a")).toDF("id", "s")
    val out = Sanitize.dropColumns(df, "s", "@odata.etag", "missing")
    assert(out.columns.toSeq == Seq("id"))
  }
}
