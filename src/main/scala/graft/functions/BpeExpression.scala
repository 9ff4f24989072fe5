package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE ENCODING of a whole document with a trained merge list
  * (Sennrich et al. 2016 inference: per word, repeatedly fuse the
  * lowest-rank adjacent symbol pair until none applies — exactly replaying
  * the training merges in rank order, so encoding a training word
  * reproduces its final training segmentation; asserted in BpeSpec).
  *
  * This is the corpus-scale hot path (one call per document, every
  * document), hence a codegen'd expression rather than `numMerges` nested
  * HOF folds: the merge-rank lookup is one java.util.HashMap probe per
  * adjacent pair, the model is plan-time state shared per task via a
  * codegen reference object, and whole-stage codegen keeps the scan
  * pipelined — ZERO shuffle, no per-row lambda dispatch.
  *
  * Words are split on the repo-wide single-space tokenizer contract; the
  * `endOfWord` sentinel must match training. Output: the document's
  * subword tokens, in order.
  */
case class BpeEncodeText(
    child: Expression,
    merges: Seq[(String, String)],
    endOfWord: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode expects string, got $other")
    }

  // "lhs<NUL>rhs" -> rank; NUL cannot occur inside a symbol (words are
  // space-split text), so the composite key is collision-free. Escape
  // sequence, NOT a literal NUL byte: a raw 0x00 in the source made
  // text-mode scanners treat this whole file as binary and skip it.
  private val PairSep = "\u0000"
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + PairSep + r, Integer.valueOf(i))
    }
    m
  }

  /** Per-task word -> tokens memo (see [[WordMemo]] for scope/bounds). */
  @transient private lazy val wordCache = new WordMemo()

  /** Encode one word's symbol buffer in place; returns the token list. */
  private def encodeWord(word: String): scala.collection.mutable.ArrayBuffer[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) { syms += word.charAt(i).toString; i += 1 }
    if (endOfWord.nonEmpty) syms += endOfWord
    var continue = true
    while (continue && syms.length > 1) {
      // lowest-rank applicable merge
      var bestRank = Int.MaxValue
      var j = 0
      while (j + 1 < syms.length) {
        val r = ranks.get(syms(j) + PairSep + syms(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (l, r) = merges(bestRank)
        // greedy left-to-right, non-overlapping (same as training)
        var k = 0
        var w = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == l && syms(k + 1) == r) {
            syms(w) = l + r; k += 2
          } else { syms(w) = syms(k); k += 1 }
          w += 1
        }
        syms.dropRightInPlace(syms.length - w)
      }
    }
    syms
  }

  /** Public for the generated code path. */
  def encodeText(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && s.charAt(i) != ' ') i += 1
        val word = s.substring(start, i)
        val toks = wordCache.getOrEncode(word)(
          w => encodeWord(w).map(UTF8String.fromString).toArray)
        var t = 0
        while (t < toks.length) { out += toks(t); t += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encodeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeText].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  /** BPE-encode a text column with a trained merge list (rank order). */
  def bpe_encode(text: Column, merges: Seq[graft.ops.Bpe.Merge],
      endOfWord: String = graft.ops.Bpe.EndOfWord): Column = {
    val sorted = merges.sortBy(_.rank).map(m => (m.lhs, m.rhs))
    ColumnInterop.column(BpeEncodeText(ColumnInterop.expression(text), sorted, endOfWord))
  }
}
