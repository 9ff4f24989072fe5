package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.functions.TextFunctions._

/** Direct coverage for [[IntersectCountSorted]] against the repo's
  * native-vs-HOF oracle convention: `size(array_intersect(a, b))` is the
  * independent built-in oracle (hash-set based, order-insensitive), the
  * native merge must agree on every distinct-sorted input, via BOTH the
  * codegen path (DataFrame select) and the interpreted path (direct eval).
  */
class IntersectCountSortedSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def interpreted(a: Array[Long], b: Array[Long]): Int =
    IntersectCountSorted(
      Literal.create(a, ArrayType(LongType, containsNull = false)),
      Literal.create(b, ArrayType(LongType, containsNull = false)))
      .eval(null).asInstanceOf[Int]

  test("property: agrees with size(array_intersect) on random distinct-sorted arrays") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200) {
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val df = cases.toDF("a", "b")
    val rows = df.select(
        intersect_count_sorted(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("oracle"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // interpreted eval must match codegen on the same inputs
    cases.zip(rows).foreach { case ((a, b), r) =>
      assert(interpreted(a, b) == r.getInt(0))
    }
  }

  test("edge cases: empty, disjoint, identical, subset") {
    assert(interpreted(Array.empty, Array.empty) == 0)
    assert(interpreted(Array(1L, 2L), Array.empty) == 0)
    assert(interpreted(Array(1L, 3L, 5L), Array(2L, 4L, 6L)) == 0)
    assert(interpreted(Array(1L, 2L, 3L), Array(1L, 2L, 3L)) == 3)
    assert(interpreted(Array(1L, 2L, 3L, 9L), Array(2L, 9L)) == 2)
    assert(interpreted(Array(Long.MinValue, 0L, Long.MaxValue),
      Array(Long.MinValue, Long.MaxValue)) == 2)
  }

  test("null propagation") {
    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(df.select(intersect_count_sorted(col("a"), col("b"))).head().isNullAt(0))
  }
}
