package graft.etl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class EvolveSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("alignTo: missing column backfills typed NULL, extras drop, order normalizes") {
    val incoming = Seq((1, "x", "extra")).toDF("id", "name", "junk")
    val out = Evolve.alignTo(incoming, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", LongType), ("name", StringType), ("amount", DoubleType)))
    val r = out.collect()(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "x" && r.isNullAt(2))
  }

  test("alignTo: up-casts int->long and float->double; rejects lossy drift") {
    val ok = Seq((1, 2.0f)).toDF("id", "amount")
    val out = Evolve.alignTo(ok, target).collect()(0)
    assert(out.getLong(0) == 1L && out.getDouble(2) == 2.0)
    val lossy = Seq(("not-a-number", "y")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Evolve.alignTo(lossy, target)
    }
    assert(e.getMessage.contains("'id'"))
  }

  test("alignTo strict: extra incoming columns raise") {
    val incoming = Seq((1L, "x", 0.0, "junk")).toDF("id", "name", "amount", "junk")
    val e = intercept[IllegalArgumentException] {
      Evolve.alignTo(incoming, target, strict = true)
    }
    assert(e.getMessage.contains("junk"))
  }

  test("unionEvolved: widens per-column and backfills one-sided columns") {
    val hist = Seq((1, "a")).toDF("id", "name")               // id: int
    val fresh = Seq((2L, 9.5, "s1")).toDF("id", "amount", "src") // id: long, new cols
    val out = Evolve.unionEvolved(hist, fresh)
    assert(out.schema("id").dataType == LongType)
    assert(out.columns.toSeq == Seq("id", "name", "amount", "src"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a" && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).getDouble(2) == 9.5)
  }

  test("alignTo: re-cased column matches under default case-insensitivity, keeps target casing") {
    val incoming = Seq((1L, "x", 2.5)).toDF("ID", "Name", "AMOUNT")
    val out = Evolve.alignTo(incoming, target)
    assert(out.columns.toSeq == Seq("id", "name", "amount"))
    val r = out.collect()(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "x" && r.getDouble(2) == 2.5)
  }

  test("alignTo: dotted column names align as plain columns, not nested paths") {
    val t = StructType(Seq(StructField("a.b", LongType), StructField("c", StringType)))
    val incoming = Seq((1L, "z")).toDF("a.b", "c")
    val r = Evolve.alignTo(incoming, t).collect()(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "z")
  }

  test("alignTo is a pure projection (no shuffle in the plan)") {
    val incoming = Seq((1, "x")).toDF("id", "name")
    val plan = Evolve.alignTo(incoming, target).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
