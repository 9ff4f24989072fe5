package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a pipeline
  * runs before promoting a load (the publicly documented
  * dbt-test/Great-Expectations shape: each check reports violation and
  * total counts, a load ships only if the gates it cares about pass).
  * The reference validates nothing after extraction (a pandas
  * `DataFrame.to_sql` ships whatever arrived — e.g.
  * `Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:54-82`); this is the
  * audit the SURVEY §7.5 north-star adds on top.
  *
  * Scale design: ALL column-predicate checks against one table fold into
  * a SINGLE aggregation pass (`columnChecks` — one conditional-sum per
  * check inside one scan), so adding a check never adds a scan. The
  * relational checks keep their minimal shapes: uniqueness is one
  * distinct-count aggregate, referential integrity one left-anti join
  * (keys-only projection on both sides). Every check emits the uniform
  * row (check, violations, total) — composable by union into one report.
  */
object DataQuality {

  /** One column-predicate expectation: `violation` is the row-level
    * predicate that flags a BAD row (include the NULL policy in it).
    */
  final case class ColCheck(name: String, violation: Column)

  /** All `checks` against `df` in ONE aggregation pass: one
    * `sum(when(violation))` per check plus the shared row count, then
    * an explode back to (check, violations, total) rows. The map stays
    * check-count-sized — never data-sized.
    */
  def columnChecks(df: DataFrame, checks: Seq[ColCheck]): DataFrame = {
    require(checks.nonEmpty, "columnChecks needs at least one check")
    // duplicate names would otherwise surface as Spark's opaque
    // DUPLICATED_MAP_KEY runtime error from the explode map
    require(checks.map(_.name).distinct.size == checks.size,
      s"check names must be unique: ${checks.map(_.name)}")
    // checks are aliased positionally (__c0, __c1, …), never by their
    // display name: check names are dotted ("table.check") and col(name)
    // would parse the dot as struct access (UNRESOLVED_COLUMN)
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(c.violation, lit(1L)).otherwise(lit(0L))), lit(0L))
        .as(s"__c$i")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kv = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.name), col(s"__c$i"))
    }
    one.select(explode(map(kv: _*)).as(Seq("check_name", "violations")),
        col("__total").as("total"))
  }

  /** Uniqueness expectation over a key column list: violations = surplus
    * rows beyond one per distinct key (0 ⇔ the key is unique).
    */
  def unique(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("total"),
        countDistinct(cols.head, cols.tail: _*).as("__d"))
      .select(lit(name).as("check_name"),
        (col("total") - col("__d")).as("violations"), col("total"))

  /** Referential-integrity expectation: child rows whose `fkCol` value
    * has no match in `parent.pkCol` (NULL fk rows are orphans too —
    * left-anti keeps them). Keys-only projection on both sides; the
    * total rides a 1-row cross join (broadcast scalar).
    */
  def foreignKey(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String, name: String): DataFrame = {
    val orphans = child.select(col(fkCol))
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total).select(lit(name).as("check_name"),
      col("violations"), col("total"))
  }

  /** Union the per-check frames into the report, adding `pass`. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === 0L)
}
