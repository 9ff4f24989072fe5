package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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
}
