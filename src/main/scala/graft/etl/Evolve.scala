package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-drift alignment for load pipelines.
  *
  * The reference's templates bind the extract's column list at write time
  * (e.g. the dynamic `INSERT` column list built from the fetched frame,
  * `Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:54-66`), so a source
  * adding, dropping, or re-typing a column mid-schedule fails the load —
  * or worse, positionally mis-writes. [[alignTo]] makes the disposition
  * explicit and total:
  *
  * - target column missing from the incoming frame → typed NULL column
  *   (appears as "new column backfilled with NULL", the standard warehouse
  *   contract);
  * - incoming column absent from the target → dropped (tolerant, the P2
  *   convention) — or an error under `strict`;
  * - same name, different type → cast when Spark's `Cast.canUpCast`
  *   guarantees losslessness (int→long, float→double, date→timestamp…),
  *   error otherwise (silent narrowing corrupts; an explicit
  *   [[Sanitize]]/transform step should own lossy conversions);
  * - columns re-ordered to the target order (positional writers — JDBC
  *   batch INSERT, parquet append — see a stable layout).
  *
  * Pure projection: no shuffle, no data pass — safe to prepend to every
  * load at any scale.
  */
object Evolve {

  /** Aligns `incoming` to `target`: returns a frame with EXACTLY the
    * target's columns, in target order. See object doc for the per-column
    * disposition. Throws `IllegalArgumentException` on non-up-castable
    * type drift, or (under `strict = true`) on extra incoming columns.
    *
    * Name matching honors the session's `spark.sql.caseSensitive` (default
    * false — a source re-casing `amount` → `Amount` still matches, like
    * every other Spark resolution); a re-cased match keeps the TARGET's
    * casing. Column references are backtick-quoted, so names containing
    * dots align as plain columns, not nested-field paths.
    */
  def alignTo(
      incoming: DataFrame,
      target: StructType,
      strict: Boolean = false): DataFrame = {
    val caseSensitive = incoming.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    // embedded backticks double per Spark's quoted-identifier rule
    def ref(n: String) = col("`" + n.replace("`", "``") + "`")
    val in = incoming.schema
    val targetNames = target.fieldNames.map(norm).toSet
    val extras = in.fieldNames.filterNot(n => targetNames.contains(norm(n)))
    if (strict && extras.nonEmpty)
      throw new IllegalArgumentException(
        s"alignTo(strict): incoming has columns absent from target: ${extras.mkString(", ")}")
    val cols = target.fields.map { tf =>
      in.find(f => norm(f.name) == norm(tf.name)) match {
        case None =>
          lit(null).cast(tf.dataType).as(tf.name)
        case Some(inf) if inf.dataType == tf.dataType =>
          ref(inf.name).as(tf.name)
        case Some(inf) if Cast.canUpCast(inf.dataType, tf.dataType) =>
          ref(inf.name).cast(tf.dataType).as(tf.name)
        case Some(inf) =>
          throw new IllegalArgumentException(
            s"alignTo: column '${tf.name}' cannot losslessly cast " +
              s"${inf.dataType.simpleString} -> ${tf.dataType.simpleString}; " +
              "handle the conversion explicitly before the load")
      }
    }
    incoming.select(cols.toSeq: _*)
  }

  /** Union of two frames under drift: each side aligns to the WIDENED
    * common schema — per column, the up-cast supertype of the two sides'
    * types (columns missing on one side backfill NULL). The incremental-
    * load shape when history and fresh extract disagree on schema.
    */
  def unionEvolved(a: DataFrame, b: DataFrame): DataFrame = {
    val caseSensitive = a.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val bs = b.schema
    val merged = StructType(
      a.schema.fields.map { af =>
        bs.find(f => norm(f.name) == norm(af.name)) match {
          case Some(bf) if bf.dataType == af.dataType => af
          case Some(bf) if Cast.canUpCast(bf.dataType, af.dataType) => af
          case Some(bf) if Cast.canUpCast(af.dataType, bf.dataType) => af.copy(dataType = bf.dataType)
          case Some(bf) =>
            throw new IllegalArgumentException(
              s"unionEvolved: column '${af.name}' has incompatible types " +
                s"${af.dataType.simpleString} vs ${bf.dataType.simpleString}")
          case None => af
        }
      } ++ bs.fields.filterNot(bf =>
        a.schema.fieldNames.exists(an => norm(an) == norm(bf.name))))
    alignTo(a, merged).unionByName(alignTo(b, merged))
  }
}
