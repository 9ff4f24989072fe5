package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten cascade: delete a set of data subjects and every
  * dependent row reachable through the declared foreign-key chain, and
  * return the audit ledger regulators actually ask for (per table: rows
  * deleted, rows remaining). The reference's pipelines only ever append
  * or truncate whole tables (`Template-to-MySQL/BigQuery-to-MySQL-
  * Method-1.py:54-82` — pandas `to_sql`); subject-level erasure across a
  * relational chain is the GDPR/CCPA operation SURVEY §7.5's curation
  * north-star adds on top of the L-family.
  *
  * Scale design: each step is ONE keys-only left-semi join (the delete
  * set) — the subject-key frames that link the steps are single-column
  * projections, `localCheckpoint`ed because each feeds both a count and
  * the child step (never the wide rows). No driver-side key collection:
  * the subject set may itself be 10⁹ rows. Deletes stay declarative
  * (anti-join = the retained frame), matching how Loads.deleteWhere
  * rewrites targets; this module computes the cascade and its ledger,
  * the write is the caller's L6 leg.
  */
object Erasure {

  /** One table in the cascade.
    *
    * @param table   ledger name
    * @param df      the table's rows
    * @param fkCol   column matched against the incoming key frame
    * @param from    which key frame selects victims here: None = the
    *                subject keys; Some(t) = the keys EMITTED by earlier
    *                step `t` (its deleted rows' `emitKey` values)
    * @param emitKey column of this step's DELETED rows exposed to
    *                downstream steps (None = leaf)
    */
  final case class CascadeStep(
      table: String,
      df: DataFrame,
      fkCol: String,
      from: Option[String] = None,
      emitKey: Option[String] = None)

  /** The cascade's per-step victim-selecting KEY frames: for each step,
    * the single-column frame (named `__k`) whose match on `step.fkCol`
    * selects that table's victims. This is the shared input of BOTH
    * erasure legs — the ledger ([[cascadeDelete]]) and the physical
    * delete/rewrite (`retained(step.df, step.fkCol, keys)` → the
    * caller's L6 write) — so the audit provably describes the same
    * delete set the rewrite applied. Key frames stay slim (keys-only)
    * and checkpointed; no driver-side key collection.
    */
  def cascadeKeys(
      subjects: DataFrame,
      steps: Seq[CascadeStep]): Seq[(CascadeStep, DataFrame)] = {
    require(subjects.columns.length == 1,
      s"subjects must be a single key column, got ${subjects.columns.toSeq}")
    require(steps.nonEmpty, "cascade needs at least one step")
    // the emitted-key map is keyed by table name: a duplicate would
    // silently overwrite an earlier step's emitted keys and route a
    // later `from` at the wrong frame
    require(steps.map(_.table).distinct.size == steps.size,
      s"cascade step table names must be unique: ${steps.map(_.table)}")
    val subjectKeys = subjects.toDF("__k").distinct().localCheckpoint()

    // table -> the key frame its deleted rows emit (slim, checkpointed)
    var emitted = Map.empty[String, DataFrame]
    steps.map { st =>
      val keys = st.from match {
        case None => subjectKeys
        case Some(t) => emitted.getOrElse(t,
          throw new IllegalArgumentException(
            s"step '${st.table}' cascades from '$t', which emitted no keys"))
      }
      st.emitKey.foreach { k =>
        emitted += st.table ->
          st.df.join(keys, st.df(st.fkCol) === keys("__k"), "left_semi")
            .select(col(k).as("__k")).distinct().localCheckpoint()
      }
      st -> keys
    }
  }

  /** Run the cascade from `subjects` (a single-column frame of subject
    * keys) through `steps`, in order. Returns the ledger
    * (table_name, n_deleted, n_remaining), one row per step.
    */
  def cascadeDelete(subjects: DataFrame, steps: Seq[CascadeStep]): DataFrame =
    cascadeKeys(subjects, steps).map { case (st, keys) =>
      val deleted = st.df.join(keys, st.df(st.fkCol) === keys("__k"), "left_semi")
      val nDel = deleted.agg(count(lit(1)).as("n_deleted"))
      val nTot = st.df.agg(count(lit(1)).as("__t"))
      nDel.crossJoin(nTot).select(
        lit(st.table).as("table_name"),
        col("n_deleted"),
        (col("__t") - col("n_deleted")).as("n_remaining"))
    }.reduce(_.unionByName(_))

  /** The retained frame for one table (the L6 write leg): everything NOT
    * selected by `keys` on `fkCol` — NULL fks are retained (they name no
    * subject).
    */
  def retained(df: DataFrame, fkCol: String, keys: DataFrame): DataFrame = {
    require(keys.columns.length == 1,
      s"keys must be a single column, got ${keys.columns.toSeq}")
    val k = keys.toDF("__k")
    df.join(k, df(fkCol) === k("__k"), "left_anti")
  }
}
