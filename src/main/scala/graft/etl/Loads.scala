package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Load/merge semantics (SURVEY.md §2.6, L1–L6) as pure table-to-table
  * functions `(existing, incoming) => result`.
  *
  * The reference implements these as connector side-effects (executemany
  * INSERT, BigQuery load jobs, target-side DELETEs); modeling them as
  * DataFrame merges makes each disposition a testable, engine-agnostic plan
  * that works identically over parquet fixtures and JDBC targets, and — at
  * 100 TB — runs as a distributed shuffle/union instead of a driver-side row
  * loop.
  *
  * Scale notes:
  * - `append`/`overwrite`/window variants are union + filter: NO shuffle at
  *   all; they pipeline straight into the writer.
  * - `upsert` is the only keyed merge; it shuffles once by the key (window
  *   `row_number`), the same cost class as any keyed MERGE. For skewed keys
  *   AQE skew-join handling applies because it is a plain hash partition.
  */
object Loads {

  /** L1: plain append (reference `executemany` INSERT,
    * `Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:77-81`).
    */
  def append(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.unionByName(incoming)

  /** L2: truncate-refresh — the result IS the incoming frame (reference
    * `WRITE_TRUNCATE`, `Template-to-BigQuery/MySQL-to-BigQuery-Method-1.py:76-79`).
    */
  def overwrite(existing: DataFrame, incoming: DataFrame): DataFrame =
    incoming

  /** L6: standalone target DELETE as a retain-filter
    * (`Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:68-85`): keep the rows
    * the predicate does NOT select.
    */
  def deleteWhere(existing: DataFrame, deletePred: Column): DataFrame =
    existing.filter(!deletePred)

  /** L3 (faithful): rolling-retention delete-old-then-append.
    * Target rows older than the retention window are deleted, then the fresh
    * windowed extract is appended (`…/BigQuery-to-MySQL-Method-2.py:68-85,104`).
    *
    * FAITHFUL semantics: consecutive daily runs re-append the overlapping
    * 29 days — rows in the retained window DUPLICATE, exactly as the
    * reference does (no key dedup). See [[retainThenAppendDedup]] for the
    * fixed variant (SURVEY.md §7.3).
    */
  def retainThenAppend(existing: DataFrame, incoming: DataFrame, retainPred: Column): DataFrame =
    existing.filter(retainPred).unionByName(incoming)

  /** L3 (fixed): as [[retainThenAppend]] but keyed — a row already present
    * (by `keys`) is not duplicated; the incoming copy wins.
    */
  def retainThenAppendDedup(
      existing: DataFrame,
      incoming: DataFrame,
      retainPred: Column,
      keys: Seq[String]): DataFrame =
    upsert(existing.filter(retainPred), incoming, keys)

  /** L5: idempotent window refresh — delete the refresh window from the
    * target, then append the fresh extract of that window
    * (`Template-to-BigQuery/Dynamics365-to-BigQuery-Method-2.py:82-92`).
    * Re-running twice equals running once (the property test in
    * LoadsSpec). On a date-partitioned file target this is exactly
    * dynamic-partition-overwrite.
    */
  def refreshWindow(existing: DataFrame, incoming: DataFrame, windowPred: Column): DataFrame =
    existing.filter(!windowPred).unionByName(incoming)

  /** L4: keyed upsert — incoming rows replace existing rows with the same
    * key; unmatched existing rows are retained (reference row-wise
    * `INSERT … ON DUPLICATE KEY UPDATE`,
    * `Template-to-MySQL/PgSQL-to-MySQL-Method-1.py:76-82`).
    *
    * The reference is row-order-dependent (`iterrows`, last row wins); here
    * the tie-break is deterministic (SURVEY.md §7.3): source priority
    * (incoming=0 beats existing=1), then `tieBreak` columns descending,
    * then — so the winner never depends on partition/scan order even when
    * `incoming` itself carries intra-batch key duplicates with equal
    * tieBreak values — every remaining orderable non-key column descending
    * (a total order over row CONTENT). One shuffle by `keys`; no driver
    * involvement.
    */
  /** L7 (extension — no reference counterpart): SCD Type-2 historization
    * merge. `current` is a versioned dimension (`keys` ++ tracked
    * attribute columns ++ `valid_from`/`valid_to`, open rows having
    * `valid_to IS NULL`); `incoming` is an unversioned snapshot batch
    * (`keys` ++ tracked, unique per key). Attribute changes close the open
    * row at `effective` and open a new one; unchanged and absent keys pass
    * through; unseen keys open fresh rows. Closed history never changes.
    *
    * Scale shape: closed history is a pass-through union (no shuffle); the
    * open set joins `incoming` ONCE (full outer, broadcast when the batch
    * is small) and each joined row emits its 1–2 output versions through a
    * single array-explode — no per-leg re-filter of the join, so the plan
    * reads each input exactly once.
    */
  def scd2(
      current: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      effective: Column): DataFrame = {
    val tracked = current.columns
      .filterNot(c => keys.contains(c) || c == "valid_from" || c == "valid_to").toSeq
    val history = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)

    val cur = open.select(
      (keys.map(col) ++ tracked.map(c => col(c).as(s"__cur_$c")) :+
        col("valid_from").as("__cur_vf")): _*)
      .withColumn("__in_cur", lit(true))
    val inc = incoming.select(
      (keys.map(col) ++ tracked.map(c => col(c).as(s"__inc_$c"))): _*)
      .withColumn("__in_inc", lit(true))
    val j = cur.join(inc, keys, "full_outer")

    val inCur = coalesce(col("__in_cur"), lit(false))
    val inInc = coalesce(col("__in_inc"), lit(false))
    val changed = tracked.map(c => !(col(s"__cur_$c") <=> col(s"__inc_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def version(src: String, vf: Column, vt: Column) = struct(
      tracked.map(c => col(s"__${src}_$c").as(c)) ++
        Seq(vf.as("valid_from"), vt.as("valid_to")): _*)
    val nullTs = lit(null).cast(open.schema("valid_to").dataType)
    val versions =
      when(inCur && inInc && changed,
        array(version("cur", col("__cur_vf"), effective),
          version("inc", effective, nullTs)))
      .when(inCur, array(version("cur", col("__cur_vf"), nullTs)))
      .otherwise(array(version("inc", effective, nullTs)))

    val merged = j
      .select(keys.map(col) :+ explode(versions).as("__v"): _*)
      .select(current.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"__v.$c").as(c)).toSeq: _*)
    history.unionByName(merged)
  }

  def upsert(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val srcCol = "__graft_src"
    val unioned = existing.withColumn(srcCol, lit(1))
      .unionByName(incoming.withColumn(srcCol, lit(0)))
    val residual = existing.schema.fields
      .filterNot(f => keys.contains(f.name) || tieBreak.contains(f.name))
      // only orderable types may join the total order (maps — including
      // nested inside structs/arrays — are not)
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(f.name).desc)
    val ordering = (col(srcCol).asc +: tieBreak.map(col(_).desc)) ++ residual
    val w = Window.partitionBy(keys.map(col).toSeq: _*).orderBy(ordering.toSeq: _*)
    unioned
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop(srcCol, "__graft_rn")
  }

  /** How one rollup column aggregates in [[mergeAggregate]]: `agg` is
    * applied both to RAW delta rows and when re-merging partial tables —
    * legal exactly because sum/min/max are associative and commutative
    * (`sum` of sums, `min` of mins, `max` of maxes). `avg` is served at
    * read time as sum/count; non-algebraic aggregates (median, distinct)
    * don't decompose this way and are rejected at construction.
    */
  final case class AggSpec(column: String, agg: String) {
    require(AggSpec.Fns.contains(agg),
      s"agg must be one of ${AggSpec.Fns.keys.toSeq.sorted.mkString("/")}: '$agg'")
  }

  object AggSpec {
    private[graft] val Fns: Map[String, Column => Column] =
      Map("sum" -> (sum(_)), "min" -> (min(_)), "max" -> (max(_)))
    /** The common all-sums shorthand. */
    def sums(cols: Seq[String]): Seq[AggSpec] = cols.map(AggSpec(_, "sum"))
  }

  /** L8 (extension — incremental materialized-aggregate maintenance):
    * refresh a keyed rollup from a DELTA of raw rows without rescanning
    * history. Works for any ALGEBRAIC aggregate whose partials re-merge
    * with an associative+commutative function — `count` via `countCol`
    * (partials SUM), plus per-column [[AggSpec]]s for `sum`/`min`/`max`
    * (each column re-merges with its own function); `avg` is sum/count
    * at read time (the standard partial-aggregate decomposition).
    *
    * `existing` holds one row per key with the partial columns
    * (`specs` plus a `countCol`); `delta` is RAW incoming rows.
    * The delta is partial-aggregated FIRST (map-side combine on the
    * delta only — history is touched as an aggregate table, never as
    * rows), then the two aggregate tables merge by key. The refresh
    * cost is O(|delta| + |aggregate table|), independent of the raw
    * history size — the property that makes daily rollup refresh viable
    * at 100 TB of accumulated facts.
    */
  def mergeAggregate(
      existing: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      specs: Seq[AggSpec],
      countCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeAggregate needs at least one key")
    require(specs.map(_.column).distinct.size == specs.size,
      s"one AggSpec per column: ${specs.map(_.column)}")
    val expected = ((keys ++ specs.map(_.column)) :+ countCol).sorted
    require(existing.columns.sorted.toSeq == expected,
      s"existing must be exactly keys + spec columns + '$countCol': " +
        s"got ${existing.columns.toSeq.sorted} want $expected")
    def reAgg(s: AggSpec): Column = AggSpec.Fns(s.agg)(col(s.column)).as(s.column)
    val deltaAgg = delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as(countCol), specs.map(reAgg): _*)
      .select(existing.columns.map(col).toSeq: _*)
    existing.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).cast("long").as(countCol), specs.map(reAgg): _*)
      .select(existing.columns.map(col).toSeq: _*)
  }

  /** Subject ERASURE on a maintained rollup — the GDPR leg of L8
    * ([[mergeAggregate]] can refresh a rollup from a delta but cannot
    * forget a subject; an aggregate still "knows" erased facts).
    * Retracts the victims' contribution WITHOUT a full recompute:
    *  - `count`/`sum` partials form a GROUP under addition — the
    *    victims' re-aggregated partials subtract in closed form,
    *    O(|victims| + |affected keys|);
    *  - `min`/`max` are only SEMIGROUPS (no inverse), so the affected
    *    keys recompute those columns from `retained` RESTRICTED TO THE
    *    AFFECTED KEYS (one keyed semi-join — never a history rescan; at
    *    100 TB the key predicate prunes partitions/row-groups). Pass
    *    `retained = null` for all-sum rollups — it is then never read.
    * Keys whose count reaches 0 drop out of the rollup entirely.
    *
    * `victims` is the subject's RAW fact rows, which must already be
    * folded into `existing` — retracting unseen rows corrupts the rollup
    * (the mirror of [[graft.ops.Bm25Index.append]]'s disjointness
    * contract). `retained` is the raw fact source WITHOUT the victims.
    * The declared `l8_rollup_erase` query's oracle is the full recompute
    * over the retained facts — erasure on the aggregate is provably a
    * rebuild without the victims (sum retraction is bit-exact here
    * because the fixture measures are integer-valued doubles; a
    * decimal-typed rollup is exact unconditionally).
    */
  def rollupErase(
      existing: DataFrame,
      victims: DataFrame,
      keys: Seq[String],
      specs: Seq[AggSpec],
      countCol: String,
      retained: DataFrame = null): DataFrame = {
    require(keys.nonEmpty, "rollupErase needs at least one key")
    require(specs.map(_.column).distinct.size == specs.size,
      s"one AggSpec per column: ${specs.map(_.column)}")
    val expected = ((keys ++ specs.map(_.column)) :+ countCol).sorted
    require(existing.columns.sorted.toSeq == expected,
      s"existing must be exactly keys + spec columns + '$countCol': " +
        s"got ${existing.columns.toSeq.sorted} want $expected")
    val minMax = specs.filter(s => s.agg == "min" || s.agg == "max")
    require(minMax.isEmpty || retained != null,
      s"min/max specs ${minMax.map(_.column)} need `retained` for the keyed recompute")
    val sums = specs.filter(_.agg == "sum")
    // the victims' partials re-aggregate map-side; this frame is bounded
    // by the AFFECTED key count and drives both the subtraction and the
    // recompute key set
    val vAgg = victims.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__vn"),
        sums.map(s => sum(col(s.column)).as("__v_" + s.column)): _*)
    val vKeys = vAgg.select(keys.map(col): _*)
    // every key comparison is NULL-SAFE (<=>): groupBy keeps a NULL-key
    // group, so a rollup maintained on a nullable key has NULL-key rows —
    // a plain equi-join would never match them and their victims would
    // silently survive the erase
    def keyCond(l: DataFrame, r: DataFrame): Column =
      keys.map(k => l(k) <=> r(k)).reduce(_ && _)
    val untouched = existing.join(vKeys, keyCond(existing, vKeys), "left_anti")
      .select(existing.columns.map(col).toIndexedSeq: _*)
    // inner join = affected keys only; an all-NULL victim measure sums to
    // NULL (nothing to subtract — coalesced away)
    val subtracted = existing.join(vAgg, keyCond(existing, vAgg))
      .select((keys.map(k => existing(k).as(k)) :+
        (existing(countCol) - col("__vn")).cast("long").as(countCol)) ++
        specs.map { s =>
          if (s.agg == "sum")
            (existing(s.column) - coalesce(col("__v_" + s.column), lit(0)))
              .as(s.column)
          else existing(s.column).as(s.column)
        }: _*)
    val withMinMax =
      if (minMax.isEmpty) subtracted
      else {
        val reAgg = minMax.map(s => AggSpec.Fns(s.agg)(col(s.column)).as("__r_" + s.column))
        val re = retained.join(vKeys, keyCond(retained, vKeys), "left_semi")
          .groupBy(keys.map(col): _*)
          .agg(reAgg.head, reAgg.tail: _*)
        // LEFT: a fully-erased key has no retained rows — its NULL
        // min/max never surfaces because the count-0 filter drops it
        subtracted.join(re, keyCond(subtracted, re), "left")
          .select((keys.map(k => subtracted(k).as(k)) :+
            subtracted(countCol).as(countCol)) ++
            specs.map { s =>
              if (s.agg == "sum") subtracted(s.column).as(s.column)
              else col("__r_" + s.column).as(s.column)
            }: _*)
      }
    untouched.unionByName(
      withMinMax.filter(col(countCol) > 0)
        .select(existing.columns.map(col).toIndexedSeq: _*))
  }

  /** [[mergeAggregate]] with every column summed — the original L8
    * surface (kept as the common case's shorthand).
    */
  def mergeAggregate(
      existing: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      countCol: String = "n")(implicit d: DummyImplicit): DataFrame =
    mergeAggregate(existing, delta, keys, AggSpec.sums(sumCols), countCol)
}
