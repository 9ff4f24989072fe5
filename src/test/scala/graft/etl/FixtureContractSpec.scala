package graft.etl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

/** Pins the dtype contract of every driver-generated fixture column this
  * repo reads, so a regenerated fixture fails HERE with a readable
  * diagnosis instead of breaking 16 declared queries silently (the round-8
  * regression: `events.ts` flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
  * between fixture generations and the unconditional ns→µs conversion
  * failed analysis everywhere downstream).
  *
  * Each assertion names its adaptation point — the code to change if the
  * driver regenerates fixtures with a new shape ON PURPOSE.
  */
class FixtureContractSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def raw(name: String) =
    spark.read.parquet(s"${GraftSpark.Sf0001}/$name.parquet")

  private def assertType(table: String, column: String, accepted: Set[DataType],
      adapt: String): Unit = {
    val schema = raw(table).schema
    assert(schema.fieldNames.contains(column),
      s"fixture drift: $table.parquet lost column '$column' (adapt: $adapt)")
    val dt = schema(column).dataType
    assert(accepted.contains(dt),
      s"fixture drift: $table.$column read as $dt, expected one of " +
        s"${accepted.mkString("{", ", ", "}")} — adapt: $adapt")
  }

  test("events.ts is raw-nanos long or a timestamp type (Tables.events dispatches)") {
    // the one column with a KNOWN history of drifting between generations:
    // accepted shapes are exactly what graft.etl.Tables.events and
    // graft.streaming.Incremental.StagedStream.tsAsTimestamp dispatch on
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assertType("events", "ts", Set(LongType, TimestampType, TimestampNTZType),
      "graft.etl.Tables.events + Incremental.StagedStream.tsAsTimestamp/tsLiteral")
  }

  test("events carries the declared analytics columns") {
    val adapt = "the events_* queries + streaming/Incremental callers in SparkEntry"
    assertType("events", "event_id", Set(LongType), adapt)
    assertType("events", "user_id", Set(LongType), adapt)
    assertType("events", "event_type", Set(StringType), adapt)
    assertType("events", "value", Set(DoubleType), adapt)
    assertType("events", "props", Set(StringType), adapt) // JSON text: events_from_json parses it
  }

  test("documents carries the text-pipeline columns") {
    val adapt = "graft.ops.TextAnalysis/Dedup/Sampling callers in SparkEntry"
    assertType("documents", "doc_id", Set(LongType), adapt)
    assertType("documents", "text", Set(StringType), adapt)
    assertType("documents", "lang", Set(StringType), adapt)
    assertType("documents", "source", Set(StringType), adapt)
    assertType("documents", "n_chars", Set(LongType), adapt)
  }

  test("embeddings carries float vectors with int labels") {
    val adapt = "graft.ops.Similarity/IvfPqIndex/Vectors callers in SparkEntry"
    assertType("embeddings", "vec_id", Set(LongType), adapt)
    assertType("embeddings", "embedding",
      Set(ArrayType(FloatType, containsNull = true), ArrayType(FloatType, containsNull = false)),
      adapt)
    assertType("embeddings", "label", Set(IntegerType), adapt)
  }

  test("TPC-H key/measure columns keep their types") {
    val adapt = "the q* analytics + etl.Windows/Loads callers in SparkEntry"
    assertType("lineitem", "l_orderkey", Set(LongType), adapt)
    assertType("lineitem", "l_quantity", Set(DoubleType), adapt)
    assertType("lineitem", "l_extendedprice", Set(DoubleType), adapt)
    assertType("lineitem", "l_shipdate", Set(TimestampType, TimestampNTZType, DateType), adapt)
    assertType("orders", "o_orderkey", Set(LongType), adapt)
    assertType("orders", "o_orderdate", Set(TimestampType, TimestampNTZType, DateType), adapt)
    assertType("customer", "c_custkey", Set(LongType), adapt)
    assertType("part", "p_partkey", Set(LongType), adapt)
  }
}
