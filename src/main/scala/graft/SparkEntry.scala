package graft

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Loads, Sanitize, Tables, Windows}
import graft.queries._
import graft.queries.Fixtures.{LineitemRef, WindowDays}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (reference
  * parity) or the north-star surface (dedup / similarity / text analysis),
  * expressed as a deterministic DataFrame plan over the fixture tables;
  * [[oracleSql]] carries the DuckDB-equivalent ANSI SQL (FIXTURES.md §C
  * determinism rules: pinned date literals, ORDER BY on keys, matching
  * column names and 4-dp rounding on computed doubles).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's Method-2 incremental extract whole: windowed scan →
    * sanitize → load-merge (SURVEY.md §3.1 restated as one lazy plan).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val incoming = Sanitize.sanitizeInf(
      li.filter(Windows.inWindow(col("l_shipdate"), LineitemRef, WindowDays)))
    Loads.refreshWindow(li, incoming,
      Windows.insideRefreshWindow(col("l_shipdate"), LineitemRef, WindowDays))
  }

  /** One entry per implemented operator from SURVEY.md §2 + north-star
    * ops, composed from the per-family registries in [[graft.queries]]
    * (split r14; keys and bodies unchanged — the driver contract is this
    * one map). Key uniqueness is asserted across files: with `++`, a
    * cross-family duplicate would silently shadow one body while its
    * oracle still green-checks the survivor's dump.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = composedQueries

  private lazy val composedQueries: Map[String, (SparkSession, String) => DataFrame] = {
    val families = Seq(
      EtlQueries.queries, RelationalQueries.queries, DedupQueries.queries,
      TextQueries.queries, SamplingQueries.queries, GraphQueries.queries,
      EventsQueries.queries, SimilarityQueries.queries,
      StreamingQueries.queries, MultimodalQueries.queries)
    val dupes = families.flatMap(_.keys)
      .groupBy(identity).collect { case (k, ks) if ks.size > 1 => k }
    require(dupes.isEmpty, s"duplicate query keys across family registries: $dupes")
    families.reduce(_ ++ _)
  }

  /** DuckDB-equivalent ANSI SQL per query (FIXTURES.md §C determinism
    * rules), composed from the same family registries; queries whose
    * semantics are JVM-side carry pinned VALUES oracles instead
    * ([[PinnedOracles]], captured at sf0.01).
    */
  def oracleSql: Map[String, String] = composedOracles

  private lazy val composedOracles: Map[String, String] = {
    val families = Seq(
      EtlQueries.oracles, RelationalQueries.oracles, DedupQueries.oracles,
      TextQueries.oracles, SamplingQueries.oracles, GraphQueries.oracles,
      EventsQueries.oracles, SimilarityQueries.oracles,
      StreamingQueries.oracles, MultimodalQueries.oracles)
    val dupes = families.flatMap(_.keys)
      .groupBy(identity).collect { case (k, ks) if ks.size > 1 => k }
    require(dupes.isEmpty, s"duplicate oracle keys across family registries: $dupes")
    // pins COMPLEMENT the SQL oracles: a key carrying both would hide one
    val sql = families.reduce(_ ++ _)
    val both = sql.keySet.intersect(PinnedOracles.sql.keySet)
    require(both.isEmpty, s"keys with BOTH a SQL oracle and a pin: $both")
    sql ++ PinnedOracles.sql
  }
}
