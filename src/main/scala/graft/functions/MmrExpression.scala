package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998; public method) over ONE query's candidate list: greedily pick
  *
  *   argmax_d  λ·sim(q, d) − (1−λ)·max_{s∈selected} cos(d, s)
  *
  * so each next result is relevant to the query but NOT redundant with
  * what's already selected — the standard diversification step a RAG
  * pipeline runs after retrieval (two near-identical chunks waste
  * context window; MMR keeps one).
  *
  * Input: `array<struct<id: bigint, sim: double, vec: array<float|double>>>`
  * — the query's candidate set, already top-k-bounded by retrieval.
  * Output: `array<struct<id: bigint, mmr: double>>` in selection order,
  * at most `k` entries.
  *
  * Determinism (pinnable-oracle contract): candidate-to-candidate
  * cosines round to 4 dp and MMR scores to 6 dp BEFORE comparison (the
  * repo-wide convention); score ties pick the LOWER id; the argmax is
  * evaluated against rounded values, so the selection is independent of
  * the input array's order (collect_list order never matters). With the
  * selected set empty the redundancy term is 0, so the first pick is
  * the rounded λ·sim maximum.
  *
  * Scale: a per-ROW greedy over an already-bounded candidate array —
  * O(k·|cand|·dim) inside the scan, zero shuffle, no driver state. The
  * corpus-sized work (retrieval) happened upstream; this expression
  * only ever sees candidate lists.
  */
case class MmrSelect(child: Expression, lambda: Double, k: Int)
    extends UnaryExpression {
  require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(
          StructField(_, LongType, _, _),
          StructField(_, DoubleType, _, _),
          StructField(_, ArrayType(FloatType | DoubleType, _), _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr_select expects array<struct<bigint, double, array<float|double>>>, got $other")
    }

  private def vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fields(2).dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def round4(x: Double): Double = math.round(x * 1e4) / 1e4
  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val isFloat = vecIsFloat
    // null candidate entries (or entries with a null vector) carry
    // nothing rankable — SKIP them instead of NPE-ing mid-scan; vector
    // lengths are validated once so a ragged batch fails with a
    // descriptive error, not an ArrayIndexOutOfBounds deep in cos()
    val idsB = new scala.collection.mutable.ArrayBuffer[Long](total)
    val simsB = new scala.collection.mutable.ArrayBuffer[Double](total)
    val vecsB = new scala.collection.mutable.ArrayBuffer[Array[Double]](total)
    var i = 0
    var dim = -1
    while (i < total) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val vd = row.getArray(2)
          val vec = new Array[Double](vd.numElements())
          var j = 0
          while (j < vec.length) {
            vec(j) = if (isFloat) vd.getFloat(j).toDouble else vd.getDouble(j)
            j += 1
          }
          if (dim < 0) dim = vec.length
          else if (vec.length != dim)
            throw new org.apache.spark.SparkException(
              s"mmr_select: candidate id ${row.getLong(0)} has vector length " +
                s"${vec.length}, expected $dim — all candidate vectors in one " +
                "list must share a dimension")
          idsB += row.getLong(0)
          simsB += row.getDouble(1)
          vecsB += vec
        }
      }
      i += 1
    }
    val n = idsB.length
    val ids = idsB.toArray
    val sims = simsB.toArray
    val vecs = vecsB.toArray
    val norms = vecs.map(vv => math.sqrt(vv.map(x => x * x).sum))
    def cos(a: Int, b: Int): Double = {
      val va = vecs(a); val vb = vecs(b)
      var dot = 0.0
      var j = 0
      while (j < va.length) { dot += va(j) * vb(j); j += 1 }
      val d = norms(a) * norms(b)
      if (d == 0.0) 0.0 else round4(dot / d)
    }
    val taken = new Array[Boolean](n)
    // bestRed(i) = max cosine of candidate i to anything selected so far;
    // −∞ start, NOT 0 — a max over all-negative cosines is negative (a
    // zero floor silently erased anti-correlated redundancy terms)
    val bestRed = Array.fill(n)(Double.NegativeInfinity)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var picks = 0
    while (picks < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val red = if (picks == 0) 0.0 else bestRed(c)
          val score = round6(lambda * sims(c) - (1.0 - lambda) * red)
          if (score > bestScore || (score == bestScore && (best < 0 || ids(c) < ids(best)))) {
            bestScore = score
            best = c
          }
        }
        c += 1
      }
      taken(best) = true
      out += new GenericInternalRow(Array[Any](ids(best), bestScore))
      var r = 0
      while (r < n) {
        if (!taken(r)) {
          val cs = cos(r, best)
          if (cs > bestRed(r)) bestRed(r) = cs
        }
        r += 1
      }
      picks += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into the greedy above — the whole-stage
    // pipeline stays intact (same delegation shape as BpeEncodeText)
    val ref = ctx.addReferenceObj("mmr", this, classOf[MmrSelect].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MmrFunctions {
  /** MMR-diversify a candidate array column; see [[MmrSelect]]. */
  def mmr_select(candidates: Column, lambda: Double, k: Int): Column =
    ColumnInterop.column(MmrSelect(ColumnInterop.expression(candidates), lambda, k))
}
