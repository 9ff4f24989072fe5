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

/** [[CharEntropy]]: hand-computed values, HOF cross-check (explode-based
  * Spark SQL recomputation — an independent in-engine oracle), and
  * interpreted-vs-codegen agreement.
  */
class CharEntropySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def interpreted(s: String): Double =
    CharEntropy(Literal(s)).eval(null).asInstanceOf[Double]

  test("hand-computed: uniform, single-char, empty") {
    assert(interpreted("") == 0.0)
    assert(interpreted("aaaa") == 0.0)
    assert(math.abs(interpreted("aabb") - math.log(2)) < 1e-12)
    assert(math.abs(interpreted("abab") - math.log(2)) < 1e-12)  // order-free
    assert(math.abs(interpreted("abcd") - math.log(4)) < 1e-12)
    // p = (1/2, 1/4, 1/4): H = 0.5 ln2 + 0.5 ln4
    assert(math.abs(interpreted("aabc") - (0.5 * math.log(2) + 0.5 * math.log(4))) < 1e-12)
  }

  test("agrees with explode-based recomputation on real documents") {
    val docs = graft.etl.Tables.documents(spark, graft.GraftSpark.Sf0001).limit(100)
    val native = docs.select(col("doc_id"),
      round(char_entropy(col("text")), 6).as("h")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // split(text, '') emits a trailing "" element — filter it
    val plain = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(collect_list(col("c")).as("cs"))
      .collect()
      .map { r =>
        val cs = r.getSeq[Long](1)
        val n = cs.sum.toDouble
        val h = -cs.map(c => c / n * math.log(c / n)).sum
        r.getLong(0) -> BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    assert(plain.keySet == native.keySet)
    plain.foreach { case (id, h) => assert(math.abs(h - native(id)) < 2e-6, s"doc $id") }
  }

  test("null propagation and codegen-vs-interpreted agreement") {
    val df = Seq(Option("hello world"), None, Some("aabb")).toDF("t")
    val got = df.select(char_entropy(col("t"))).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
    assert(math.abs(got(2).getDouble(0) - interpreted("aabb")) < 1e-15)
    assert(math.abs(got(0).getDouble(0) - interpreted("hello world")) < 1e-15)
  }
}

/** [[NonAlnumSpaceCount]] vs its regex oracle: the native byte scan must
  * equal `length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))` on every
  * input, including multi-byte and astral code points and NULLs, via both
  * the codegen path and the interpreted eval.
  */
class NonAlnumSpaceCountSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = graft.GraftSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("equals the regexp_replace length oracle on crafted and random text") {
    val crafted = Seq(
      "", " ", "abc", "a b c", "a,b.c!", "éàü", "héllo wörld!",
      "日本語 text 123", "emoji 😀 pair", "tab\tnl\n", "ASCII only 42",
      "!@#$%^&*()", "mixed é1! x")
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(200)(
      // build from code-point-safe chunks so surrogate pairs stay paired
      (0 until rnd.nextInt(30)).map { _ =>
        val i = rnd.nextInt(10)
        Seq("a", "b", " ", "1", ",", ".", "!", "é", "日", "😀")(i)
      }.mkString)
    val df = (crafted ++ random).toDF("t")
    val mismatches = df.select(
        graft.functions.TextFunctions.non_alnum_space_count(col("t")).as("native"),
        length(regexp_replace(col("t"), "[a-zA-Z0-9 ]", "")).as("oracle"))
      .filter(col("native") =!= col("oracle")).count()
    assert(mismatches == 0)
    // NULL propagates like the regex form
    val n = Seq[Option[String]](None).toDF("t")
      .select(graft.functions.TextFunctions.non_alnum_space_count(col("t")))
      .collect().head
    assert(n.isNullAt(0))
    // interpreted eval agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(NonAlnumSpaceCount(Literal("a,é 1")).eval(null) == 2)
  }
}
