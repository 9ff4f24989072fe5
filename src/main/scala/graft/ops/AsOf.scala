package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for every left row, attach the LATEST right
  * row with the same key whose time is ≤ the left row's time. The staple
  * temporal operator for joining events to the most recent prior state
  * (prices, sessions, feature snapshots) that plain equi-joins can't
  * express.
  *
  * Built by COMPOSITION of built-ins (preference (a) of the custom-operator
  * ladder — no custom SparkPlan needed): tag both sides, union, and
  * carry-forward the last right payload with a keyed window. ONE shuffle by
  * (key) — the same cost class as a sort-merge join, and the window sort is
  * exactly the merge order. Skewed keys behave like any keyed window
  * (salt or split upstream if one key dominates).
  *
  * Right-side ties on (key, time) are broken by the full right-row struct
  * ordering (largest wins) — deterministic, documented (engines differ on
  * tie choice).
  */
object AsOf {

  /** @param tolerance optional maximum left−right time gap (same unit as a
    *                   Column subtraction on the time columns, e.g. an
    *                   interval for timestamps): matches older than the
    *                   tolerance are discarded (pandas `merge_asof`
    *                   semantics).
    */
  /** @param direction `"backward"` (default — latest right at-or-before,
    *                   pandas `merge_asof` default), `"forward"` (earliest
    *                   right at-or-after), or `"nearest"` (smaller absolute
    *                   gap; exact ties resolve BACKWARD, documented since
    *                   engines differ). All three run in the same single
    *                   keyed shuffle — nearest adds a second window SORT
    *                   over the already-partitioned union, not a second
    *                   Exchange.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "r_",
      inner: Boolean = true,
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest: $direction")
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__ts"),
        lit(1).as("__side"),
        struct(left.columns.map(col).toSeq: _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(right.columns.map(col).toSeq: _*).as("__r")): _*)

    // at equal __ts the right row sorts first (side 0) ⇒ inclusive match
    // in BOTH directions; among equal-ts rights, `last` over __r asc picks
    // the largest right struct — the documented deterministic tie-break
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val union = lTagged.unionByName(rTagged)
    val withMatch = direction match {
      case "backward" =>
        union.withColumn("__match", last(col("__r"), ignoreNulls = true).over(wB))
      case "forward" =>
        union.withColumn("__match", last(col("__r"), ignoreNulls = true).over(wF))
      case "nearest" =>
        union
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wB))
          .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(wF))
          .withColumn("__match",
            when(col("__mf").isNull, col("__mb"))
              .when(col("__mb").isNull, col("__mf"))
              .when(col("__ts") - col("__mb")(rightTime) <=
                col("__mf")(rightTime) - col("__ts"), col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }
    val carried0 = withMatch.filter(col("__side") === 1)
    // tolerance: the two-sided bound is direction-universal (backward
    // matches satisfy the upper bound trivially, forward the lower)
    val carried = tolerance.fold(carried0) { tol =>
      carried0.withColumn("__match",
        when(col("__match").isNotNull &&
          col("__match")(rightTime) >= col("__ts") - tol &&
          col("__match")(rightTime) <= col("__ts") + tol, col("__match")))
    }

    val filtered = if (inner) carried.filter(col("__match").isNotNull) else carried
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    filtered.select(leftCols ++ rightCols: _*)
  }

  /** Range join: pairs (left, right) with same key and right time inside
    * `[left time − lookback, left time]` — the windowed-neighborhood
    * generalization of [[asOfJoin]]. Composed as an equi-join on key plus
    * a range predicate; at scale, bucketing time into join keys
    * (time-bucket + key) bounds the pair space.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      lookback: Column,
      rightPrefix: String = "r_"): DataFrame = {
    val r2 = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"$rightPrefix$c"))
    val cond = keys.map(k => left(k) === r2(s"$rightPrefix$k")).reduce(_ && _) &&
      r2(s"$rightPrefix$rightTime") <= left(leftTime) &&
      r2(s"$rightPrefix$rightTime") >= left(leftTime) - lookback
    left.join(r2, cond, "inner")
  }
}
