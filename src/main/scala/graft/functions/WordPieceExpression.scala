package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece ENCODING with a fixed vocabulary (Wu et al. 2016 /
  * BERT inference): per word, greedy LONGEST-match from the left —
  * word-initial position looks up the raw substring, later positions the
  * `##`-prefixed continuation — and a word with any unmatchable position
  * becomes a single `[UNK]` (whole-word fallback, as in BERT's
  * WordpieceTokenizer).
  *
  * Corpus-scale hot path, same design as [[BpeEncodeText]]: the
  * vocabulary is a plan-time HashSet shared per task via a codegen
  * reference object, lookups are O(maxPieceLen) substring probes per
  * consumed position, and whole-stage codegen keeps the scan pipelined —
  * zero shuffle, no per-row lambda dispatch.
  *
  * Words are split on the repo-wide single-space tokenizer contract.
  */
case class WordPieceEncodeText(
    child: Expression,
    vocab: Seq[String],
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
          s"wordpiece_encode expects string, got $other")
    }

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** Per-task word -> pieces memo (see [[WordMemo]] for scope/bounds). */
  @transient private lazy val wordCache = new WordMemo()

  /** Greedy longest-match segmentation of one word. */
  private def encodeWord(word: String): Array[UTF8String] = {
    val n = word.length
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var ok = true
    while (ok && i < n) {
      var l = math.min(maxPieceLen, n - i)
      var matched: String = null
      while (matched == null && l >= 1) {
        val sub = word.substring(i, i + l)
        val candidate = if (i == 0) sub else "##" + sub
        if (pieces.contains(candidate)) matched = candidate else l -= 1
      }
      if (matched == null) ok = false
      else { tokens += matched; i += l }
    }
    if (ok) tokens.map(UTF8String.fromString).toArray
    else Array(UTF8String.fromString(unk))
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
        val toks = wordCache.getOrEncode(word)(encodeWord)
        var t = 0
        while (t < toks.length) { out += toks(t); t += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encodeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wp", this, classOf[WordPieceEncodeText].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceFunctions {
  /** WordPiece-encode a text column against a piece vocabulary. */
  def wordpiece_encode(text: Column, vocab: Seq[String], maxPieceLen: Int = 6,
      unk: String = graft.ops.WordPiece.Unk): Column =
    ColumnInterop.column(WordPieceEncodeText(
      ColumnInterop.expression(text), vocab, maxPieceLen, unk))
}
