package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unigram-LM ENCODING with a fixed (piece, logprob) model
  * (Kudo 2018 / SentencePiece inference): per word, the VITERBI-best
  * segmentation under the unigram log-probabilities — ties prefer the
  * longer final piece, [[graft.ops.Unigram.viterbi]]'s exact rule — and
  * a word with an uncoverable position (character absent from the
  * model) becomes a single `[UNK]`, the whole-word fallback shared with
  * [[WordPieceEncodeText]].
  *
  * Corpus-scale hot path, same design as [[BpeEncodeText]] /
  * [[WordPieceEncodeText]]: the model is a plan-time HashMap shared per
  * task via a codegen reference object, each position probes at most
  * `maxPieceLen` substrings, and whole-stage codegen keeps the scan
  * pipelined — zero shuffle, no per-row lambda dispatch.
  *
  * Words are split on the repo-wide single-space tokenizer contract.
  */
case class UnigramEncodeText(
    child: Expression,
    model: Seq[(String, Double)],
    maxPieceLen: Int,
    unk: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_encode expects string, got $other")
    }

  @transient private lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](model.size * 2)
    model.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  /** Per-task word -> pieces memo (see [[WordMemo]] for scope/bounds). */
  @transient private lazy val wordCache = new WordMemo()

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
        val toks = wordCache.getOrEncode(word) { w =>
          val seg = graft.ops.Unigram.viterbi(w, logp, maxPieceLen)
          if (seg == null) Array(UTF8String.fromString(unk))
          else seg.map(UTF8String.fromString)
        }
        var t = 0
        while (t < toks.length) { out += toks(t); t += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encodeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ug", this, classOf[UnigramEncodeText].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramFunctions {
  /** Unigram-Viterbi-encode a text column against a (piece, logprob) model. */
  def unigram_encode(text: Column, model: Seq[(String, Double)], maxPieceLen: Int = 6,
      unk: String = graft.ops.Unigram.Unk): Column =
    ColumnInterop.column(UnigramEncodeText(
      ColumnInterop.expression(text), model, maxPieceLen, unk))
}
