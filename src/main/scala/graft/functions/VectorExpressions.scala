package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the vector-math hot path (north-star
  * similarity search, SURVEY.md §7.5).
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`) is
  * evaluated interpreted — lambda dispatch plus a transient array allocation
  * PER ROW PAIR, which dominates brute-force top-k (O(|Q|·|C|) pairs). This
  * expression compiles to a tight primitive loop inside whole-stage codegen:
  * no allocation, no virtual dispatch. Accumulation is double precision in
  * index order, bit-identical to the sequential left-fold the DuckDB oracle
  * computes (FIXTURES.md §C).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += (double)$a.$lGet($i) * (double)$b.$rGet($i);
        }
        ${ev.value} = $s;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deterministic ±1 hyperplane components for random-hyperplane LSH, shared
  * by the interpreted HOF reference form and the native [[LshSignature]]
  * expression (they must agree bit-for-bit).
  *
  * Plane p, dimension i has sign +1 iff
  * `xxhash64('plane', p, i) & 1 == 1` — exactly Spark's `xxhash64` builtin
  * chain (seed 42, each argument's hash seeding the next). The sign tables
  * depend only on (numPlanes, dim): they are computed once per JVM and
  * cached, so the per-row signature cost is a pure multiply-add loop — at
  * corpus scale the table is a few KB of effectively-broadcast state, not
  * per-row hashing.
  */
object LshUtil {
  /** Hash of the 'plane' tag string: the chained seed after xxhash64's first
    * argument.
    */
  private val PlaneTag: Long = {
    val s = UTF8String.fromString("plane")
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
  }

  /** Seed for plane p (= xxhash64 chain after arguments 'plane', p). */
  def planeSeed(p: Int): Long = XXH64.hashInt(p, PlaneTag)

  // per-plane sign rows, grown to the largest dimension seen; values are a
  // pure function of (p, i) so concurrent recomputation is benign
  private val cache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  /** ±1.0 signs for plane p, dimensions [0, dim). Returned array may be
    * longer than dim.
    */
  def signRow(p: Int, dim: Int): Array[Double] = {
    val cur = cache.get(p)
    if (cur != null && cur.length >= dim) cur
    else {
      val n = math.max(64, Integer.highestOneBit(math.max(dim - 1, 1)) * 2)
      val seed = planeSeed(p)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = if ((XXH64.hashInt(i, seed) & 1L) == 1L) 1.0 else -1.0
        i += 1
      }
      cache.put(p, out)
      out
    }
  }
}

/** Native random-hyperplane LSH signature: bit p (of `numPlanes`) is the
  * sign of the projection of the vector onto deterministic ±1 hyperplane p.
  *
  * Replaces the interpreted `zip_with` + `aggregate` + per-element
  * `xxhash64` HOF formulation (numPlanes × dim lambda dispatches and a
  * transient array per row — the round-1 bench's top cost). Here the signs
  * come from the JVM-cached [[LshUtil]] table and the projection is a tight
  * primitive loop inside whole-stage codegen. Bit-identical to the HOF form
  * (same hash chain, same left-to-right double accumulation) — cross-checked
  * in SimilaritySpec.
  */
case class LshSignature(child: Expression, numPlanes: Int) extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 63, s"numPlanes must be in [1,63], got $numPlanes")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signature expects array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val signs = LshUtil.signRow(p, n)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * signs(i)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      val signs = ctx.freshName("signs")
      val proj = ctx.freshName("proj")
      s"""
        int $n = $a.numElements();
        long $sig = 0L;
        for (int $p = 0; $p < $numPlanes; $p++) {
          double[] $signs = graft.functions.LshUtil.signRow($p, $n);
          double $proj = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $proj += (double)$a.$get($i) * $signs[$i];
          }
          if ($proj >= 0) $sig |= (1L << $p);
        }
        ${ev.value} = $sig;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment against a driver-bounded centroid table
  * (nlist × dim doubles), embedded in the expression — the shuffle-free IVF
  * assignment. Returns the 0-based index of the centroid with the highest
  * cosine similarity (dot / centroid-norm; the row's own norm is a positive
  * constant across candidates so it cannot change the argmax); ties keep the
  * lowest index, matching the previous window form's (sim desc, cluster asc)
  * ordering.
  *
  * Round 1 assigned clusters with `monotonically_increasing_id` + a
  * `row_number` window over a |corpus| × nlist cross join — a full shuffle of
  * the corpus per Lloyd pass, the one scale-killer the round-1 verdict
  * called out. This is zero-exchange: centroids ride into codegen as a
  * reference object (≙ a broadcast of driver-bounded state).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    if (arr.numElements() != centroids(0).length) throw new IllegalArgumentException(
      s"nearest_centroid: vector dim ${arr.numElements()} != centroid dim ${centroids(0).length}")
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var dot = 0.0
      var i = 0
      while (i < cen.length) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * cen(i)
        i += 1
      }
      val sim = dot / norms(c)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cenRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val normRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val sim = ctx.freshName("sim")
      s"""
        if ($a.numElements() != $cenRef[0].length) {
          throw new IllegalArgumentException("nearest_centroid: vector dim " +
            $a.numElements() + " != centroid dim " + $cenRef[0].length);
        }
        int $best = -1;
        double $bestSim = Double.NEGATIVE_INFINITY;
        for (int $c = 0; $c < $cenRef.length; $c++) {
          double[] $cen = $cenRef[$c];
          int $n = $cen.length;
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += (double)$a.$get($i) * $cen[$i];
          }
          double $sim = $dot / $normRef[$c];
          if ($sim > $bestSim) { $bestSim = $sim; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: split the vector into `m` equal subspaces
  * and emit, per subspace, the index of the L2-nearest codebook centroid
  * (`codebooks(s)(c)` = centroid c of subspace s) — the classic PQ encoding
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; public method). A D-dim float vector compresses to m small
  * ints, the memory-bound representation for corpus-scale ANN serving.
  * Codebooks are driver-bounded (m × k × D/m doubles) and ride into codegen
  * as a reference object — encoding is a zero-exchange map pass. Ties keep
  * the lowest code index.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks(0).nonEmpty, "codebooks must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    if (arr.numElements() != m * dsub) throw new IllegalArgumentException(
      s"pq_encode: vector dim ${arr.numElements()} != m*dsub ${m * dsub}")
    val isFloat = elemIsFloat
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (isFloat) arr.getFloat(s * dsub + i).toDouble
                   else arr.getDouble(s * dsub + i)) - cen(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val cb = ctx.freshName("cb")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
        int $m = $cbRef.length;
        int $dsub = $cbRef[0][0].length;
        if ($a.numElements() != $m * $dsub) {
          throw new IllegalArgumentException("pq_encode: vector dim " +
            $a.numElements() + " != m*dsub " + ($m * $dsub));
        }
        int[] $out = new int[$m];
        for (int $s = 0; $s < $m; $s++) {
          double[][] $cb = $cbRef[$s];
          int $best = -1;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $cb.length; $c++) {
            double[] $cen = $cb[$c];
            double $d = 0.0;
            for (int $i = 0; $i < $dsub; $i++) {
              double $x = (double)$a.$get($s * $dsub + $i) - $cen[$i];
              $d += $x * $x;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $out[$s] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side ADC lookup table: lut[s*k + c] = dot(query-subvector s,
  * codebooks(s)(c)). Computed ONCE per query row (m × k × D/m flops), after
  * which scoring any corpus row is m array lookups ([[PqAdcLut]]) — the
  * asymmetric-distance-computation split that makes a PQ scan memory-bound
  * instead of compute-bound.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks(0).nonEmpty, "codebooks must be non-empty")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_lut expects array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = codebooks.length
    val k = codebooks(0).length
    val dsub = codebooks(0)(0).length
    if (arr.numElements() != m * dsub) throw new IllegalArgumentException(
      s"pq_lut: vector dim ${arr.numElements()} != m*dsub ${m * dsub}")
    val isFloat = elemIsFloat
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val cen = codebooks(s)(c)
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) arr.getFloat(s * dsub + i).toDouble
                  else arr.getDouble(s * dsub + i)
          dot += x * cen(i)
          i += 1
        }
        out(s * k + c) = dot
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
        int $m = $cbRef.length;
        int $k = $cbRef[0].length;
        int $dsub = $cbRef[0][0].length;
        if ($a.numElements() != $m * $dsub) {
          throw new IllegalArgumentException("pq_lut: vector dim " +
            $a.numElements() + " != m*dsub " + ($m * $dsub));
        }
        double[] $out = new double[$m * $k];
        for (int $s = 0; $s < $m; $s++) {
          for (int $c = 0; $c < $k; $c++) {
            double[] $cen = $cbRef[$s][$c];
            double $dot = 0.0;
            for (int $i = 0; $i < $dsub; $i++) {
              $dot += (double)$a.$get($s * $dsub + $i) * $cen[$i];
            }
            $out[$s * $k + $c] = $dot;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC scoring: sum(lut[s*k + codes[s]]) — m array lookups per corpus row.
  * With an inner-product LUT this approximates dot(query, corpus vector);
  * with a squared-norm LUT (a constant per codebook set) it reconstructs
  * the approximate corpus norm. The hot inner loop of a PQ scan: no
  * flops on the (huge) corpus side beyond m adds.
  */
case class PqAdcLut(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (array<double> lut, array<int> codes), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * k) throw new IllegalArgumentException(
      s"pq_adc: lut length ${lut.numElements()} != m*k ${m * k}")
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getDouble(s * k + codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
        int $m = $r.numElements();
        if ($l.numElements() != $m * $k) {
          throw new IllegalArgumentException("pq_adc: lut length " +
            $l.numElements() + " != m*k " + ($m * $k));
        }
        double $acc = 0.0;
        for (int $s = 0; $s < $m; $s++) {
          $acc += $l.getDouble($s * $k + $r.getInt($s));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two array<float|double> columns, double accumulation. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnInterop.column(DotProduct(ColumnInterop.expression(a), ColumnInterop.expression(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Random-hyperplane LSH signature (long, bits [0, numPlanes)). */
  def lsh_signature(vec: Column, numPlanes: Int): Column =
    ColumnInterop.column(LshSignature(ColumnInterop.expression(vec), numPlanes))

  /** 0-based index of the nearest centroid by cosine similarity. */
  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnInterop.column(NearestCentroid(ColumnInterop.expression(vec), centroids))

  /** PQ codes (array<int>, one L2-nearest code per subspace). */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnInterop.column(PqEncode(ColumnInterop.expression(vec), codebooks))

  /** Query-side inner-product ADC lookup table (array<double>, m*k). */
  def pq_lut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnInterop.column(PqLut(ColumnInterop.expression(vec), codebooks))

  /** ADC score: sum over subspaces of lut[s*k + codes[s]]. */
  def pq_adc(lut: Column, codes: Column, k: Int): Column =
    ColumnInterop.column(PqAdcLut(
      ColumnInterop.expression(lut), ColumnInterop.expression(codes), k))
}
