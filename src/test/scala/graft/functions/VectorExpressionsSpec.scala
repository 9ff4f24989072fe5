package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.functions.VectorFunctions._

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("vec_dot over float arrays matches manual computation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().getDouble(0) == 32.0)
  }

  test("vec_dot over double arrays") {
    val df = Seq((Array(1.5, 2.0), Array(2.0, 0.5))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().getDouble(0) == 4.0)
  }

  test("vec_dot null propagation") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("codegen and interpreted paths agree (HOF cross-check)") {
    val emb = graft.etl.Tables.embeddings(spark, GraftSpark.Sf0001).limit(100)
    val hof = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v))
      .collect().map(_.getDouble(0))
    val native = emb.select(vec_dot(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(hof.toSeq == native.toSeq)
  }

  test("vec_norm of unit vector is 1") {
    val df = Seq(Tuple1(Array(0.6f, 0.8f))).toDF("a")
    assert(math.abs(df.select(vec_norm(col("a"))).head().getDouble(0) - 1.0) < 1e-7)
  }

  test("mismatched types are rejected at analysis") {
    val df = Seq((Array(1), Array(1.0f))).toDF("a", "b")
    intercept[Exception] { df.select(vec_dot(col("a"), col("b"))).collect() }
  }
}
