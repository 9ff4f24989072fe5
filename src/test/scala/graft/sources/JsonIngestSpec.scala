package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

/** Permissive-ingest quarantine + key-drift audit ([[JsonRecords]]). */
class JsonIngestSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val Ddl = "id BIGINT, name STRING, score DOUBLE"

  private def parse(lines: Seq[String]) =
    JsonRecords.parseWithQuarantine(
      lines.toDF("line"), "line", Ddl)

  test("quarantine: clean records parse fully with status ok") {
    val out = parse(Seq("""{"id":1,"name":"a","score":0.5}"""))
      .select("ingest_status", "parsed_id", "parsed_name", "parsed_score")
      .head()
    assert(out == Row("ok", 1L, "a", 0.5))
  }

  test("quarantine: malformed JSON quarantines with all parsed fields NULL, raw text kept") {
    val out = parse(Seq("""{"id":1,"name":"a""""))
      .select("line", "ingest_status", "parsed_id", "parsed_name", "parsed_score")
      .head()
    assert(out == Row("""{"id":1,"name":"a"""", "malformed", null, null, null))
  }

  test("quarantine: type mismatch keeps the convertible fields (partial-result parse)") {
    val out = parse(Seq("""{"id":7,"name":"b","score":"not a number"}"""))
      .select("ingest_status", "parsed_id", "parsed_name", "parsed_score")
      .head()
    assert(out == Row("schema_mismatch", 7L, "b", null))
  }

  test("quarantine: missing fields are NULL but the record is still ok (JSON is sparse)") {
    val out = parse(Seq("""{"id":9}"""))
      .select("ingest_status", "parsed_id", "parsed_name").head()
    assert(out == Row("ok", 9L, null))
  }

  test("quarantine: empty and non-JSON strings are malformed") {
    val st = parse(Seq("", "   ", "plainly not json"))
      .select("ingest_status").as[String].collect().toSeq
    assert(st == Seq("malformed", "malformed", "malformed"))
  }

  test("quarantine: valid NON-OBJECT JSON is malformed, not schema_mismatch " +
      "(no declared field could ever parse from a scalar or array)") {
    val out = parse(Seq("42", "[1,2]", "\"str\"", "true"))
      .select("ingest_status").collect().map(_.getString(0)).toSeq
    assert(out == Seq.fill(4)("malformed"), out)
  }

  test("key drift: a record repeating one top-level key counts ONCE") {
    val audited = JsonRecords.keyDriftAudit(
        Seq("""{"id":1,"id":2}""", """{"id":3}""").toDF("line"), "line",
        expected = Seq("id", "name"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(audited("id") == 2, s"duplicate key inflated presence: $audited")
    assert(audited("name") == 0)
  }

  test("quarantine: input columns colliding with produced columns are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      JsonRecords.parseWithQuarantine(
        Seq(("{}", "x")).toDF("line", "ingest_status"), "line", Ddl)
    }
    assert(e.getMessage.contains("ingest_status"))
    val e2 = intercept[IllegalArgumentException] {
      JsonRecords.parseWithQuarantine(
        Seq(("{}", 1L)).toDF("line", "parsed_id"), "line", Ddl)
    }
    assert(e2.getMessage.contains("parsed_id"))
  }

  test("quarantine: declaring the internal corrupt column is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      JsonRecords.parseWithQuarantine(Seq("{}").toDF("line"), "line",
        "id BIGINT, _graft_corrupt_record STRING")
    }
    assert(e.getMessage.contains("_graft_corrupt_record"))
  }

  test("quarantine: stateless — composes unchanged with readStream (file stream, availableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_stream")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      java.util.Arrays.asList(
        """{"id":1,"name":"a","score":0.5}""",
        """{"id":2,"name":"b","score":"bad"}""",
        """not json"""))
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("value STRING"))
      .text(dir.toString)
    val out = JsonRecords.parseWithQuarantine(stream, "value", Ddl)
      .groupBy("ingest_status").count()
    val q = out.writeStream.format("memory").queryName("jsonl_q")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val lanes = spark.table("jsonl_q")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(lanes == Map("ok" -> 1L, "schema_mismatch" -> 1L, "malformed" -> 1L))
  }

  test("key drift: extra keys surface, missing declared keys report zero") {
    val lines = Seq(
      """{"id":1,"name":"a"}""",
      """{"id":2,"name":"b","rogue":true}""",
      """{"id":3}""",
      "not json at all")
    val out = JsonRecords.keyDriftAudit(lines.toDF("line"), "line",
        expected = Seq("id", "name", "score"))
      .orderBy("field")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq(
      ("id", 3L, true),
      ("name", 2L, true),
      ("rogue", 1L, false),
      ("score", 0L, true)))
  }
}
