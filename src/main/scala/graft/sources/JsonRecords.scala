package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** OData/REST entity source shape (SURVEY.md §2.1 S9/S10, §2.3 T2).
  *
  * The reference fetches a Dynamics 365 entity as a JSON record list on the
  * Airflow worker and normalizes with `pd.DataFrame(records)`
  * (`Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:58-77`). Phase-1
  * faithful equivalent: JSON lines → `spark.read.json` with schema
  * inference (the reference's OData payload has no declared schema either).
  *
  * Scale path (SURVEY.md §7.4): a driver-side full fetch cannot hold at
  * 100 TB. [[fromPages]] accepts the page structure OData paging
  * (`@odata.nextLink` / `$skiptoken`) yields, parallelizing the PARSE across
  * executors even when the fetch is driver-side; a DSv2 `TableProvider` that
  * fetches pages inside partition readers is the round-2+ upgrade.
  */
object JsonRecords {

  /** T2: JSON records (one JSON object per string) → DataFrame. */
  def fromRecords(spark: SparkSession, records: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(records)
    spark.read.json(ds)
  }

  /** Page-parallel variant: each element is one fetched page (a JSON array
    * of records, OData `value` unwrapped upstream as JSON-lines text).
    * Pages become partitions; parsing is distributed.
    */
  def fromPages(spark: SparkSession, pages: Seq[Seq[String]]): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(pages.flatten).repartition(math.max(1, pages.size))
    spark.read.json(ds)
  }

  private val CorruptCol = "_graft_corrupt_record"

  /** Permissive JSONL parse with a corrupt-record quarantine lane.
    *
    * At ingest scale, malformed records are a certainty (truncated
    * writes, schema drift upstream, encoding damage); a FAILFAST parse
    * aborts a 100 TB job on the first bad byte and a silent PERMISSIVE
    * parse loses the evidence. This keeps BOTH lanes in one map-side
    * pass — no second scan, no UDF, whole-stage codegen throughout:
    *
    *   - `ingest_status = 'ok'`              — record parsed fully
    *   - `ingest_status = 'schema_mismatch'` — valid JSON, but ≥1 field
    *     failed to convert to the declared type (Spark's partial-result
    *     parse keeps the convertible fields; the failed ones are NULL)
    *   - `ingest_status = 'malformed'`       — not parseable JSON at all
    *     (every parsed field NULL)
    *
    * Classification derives from Spark's PERMISSIVE corrupt-record
    * column (set for BOTH failure classes) disambiguated by a
    * `get_json_object(…, '$')` probe, which is NULL exactly when the
    * text is not valid JSON. Downstream splits on `ingest_status`; the
    * quarantine lane keeps the raw text (`jsonCol`) for replay.
    *
    * Reference context: the reference's OData path trusts
    * `pd.DataFrame(records)` end to end
    * (`Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:58-77`) — one
    * bad payload fails the whole Airflow task. This is the scale-safe
    * version of that boundary.
    *
    * @param ddl declared record schema as a DDL string
    *            (e.g. `"doc_id BIGINT, lang STRING"`); must not already
    *            contain the corrupt-record column.
    */
  def parseWithQuarantine(
      df: DataFrame,
      jsonCol: String,
      ddl: String,
      prefix: String = "parsed_"): DataFrame = {
    val declared = StructType.fromDDL(ddl)
    require(!declared.fieldNames.contains(CorruptCol),
      s"schema must not declare the internal corrupt column $CorruptCol")
    // fail at the API boundary, not with AMBIGUOUS_REFERENCE downstream
    val produced = declared.fieldNames.map(prefix + _).toSet ++
      Set("ingest_status", "__graft_parsed")
    val collisions = df.columns.filter(produced)
    require(collisions.isEmpty,
      s"input already has column(s) the parse would produce: ${collisions.mkString(", ")}")
    val schema = declared.add(CorruptCol, StringType)
    val parsed = df.withColumn("__graft_parsed",
      from_json(col(jsonCol), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol)))
    val corrupt = col("__graft_parsed").getField(CorruptCol)
    // a NULL parsed struct (empty/whitespace/NULL input never reaches the
    // parser) carries no corrupt marker — it must still quarantine
    // the object probe distinguishes the two corrupt-marked lanes:
    // json_object_keys is non-NULL only for a JSON OBJECT, so valid
    // non-object JSON (`42`, `[1,2]`, `"str"` — no declared field could
    // ever parse) routes to malformed, not schema_mismatch
    val status = when(col("__graft_parsed").isNull, lit("malformed"))
      .when(corrupt.isNull, lit("ok"))
      .when(json_object_keys(col(jsonCol)).isNotNull, lit("schema_mismatch"))
      .otherwise(lit("malformed"))
    val fieldCols: Seq[Column] = declared.fieldNames.toSeq.map(f =>
      col("__graft_parsed").getField(f).as(s"$prefix$f"))
    parsed.select(
      df.columns.map(col).toSeq ++ fieldCols :+ status.as("ingest_status"): _*)
  }

  /** Schema-drift audit over raw JSONL: per top-level key, how many
    * records carry it, against the declared field list — the "is the
    * upstream feed still shaped like we think" gate a scraped corpus
    * needs before [[parseWithQuarantine]]'s typed parse.
    *
    * One `json_object_keys` explode + hash aggregate (map-side partial);
    * the `is_expected` flag is a plan-literal IN over the declared list
    * (no join), and declared-but-absent fields still report with
    * `n_present = 0` via an anti-join of the tiny declared list against
    * the aggregated keys. A field silently vanishing upstream surfaces
    * as a row, not an absence. Records that are not valid JSON
    * contribute no keys (audited separately by the quarantine lane).
    */
  def keyDriftAudit(df: DataFrame, jsonCol: String, expected: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(expected.nonEmpty, "expected field list must be non-empty")
    // array_distinct: a pathological record repeating one top-level key
    // must count ONCE, so n_present means records-carrying-the-key and
    // never exceeds the record count
    val observed = df
      .select(explode(array_distinct(json_object_keys(col(jsonCol)))).as("field"))
      .groupBy("field").agg(count(lit(1)).as("n_present"))
    val absent = expected.toDF("field")
      .join(observed, Seq("field"), "left_anti")
      .select(col("field"), lit(0L).as("n_present"))
    observed.unionByName(absent)
      .withColumn("is_expected", col("field").isin(expected: _*))
  }
}
