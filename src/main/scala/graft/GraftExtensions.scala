package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharEntropy, DotProduct, IntersectCountSorted, LangIdExpr, LshSignature, MinHashSig, ShingleHash, SimHash64, StopwordCount, WordNgrams}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works and
  * the functions are usable from pure-SQL pipelines.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(shingles, k) - MinHash signature (k hashes)"),
      (args: Seq[Expression]) => MinHashSig(args(0), GraftExtensions.intLitArg("graft_minhash_sig", args, 2, 1, "k"))))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_hash"),
      info("graft_shingle_hash", "graft_shingle_hash(tokens, k) - hashed word k-shingles"),
      (args: Seq[Expression]) => ShingleHash(args(0), GraftExtensions.intLitArg("graft_shingle_hash", args, 2, 1, "k"))))
    e.injectFunction((
      FunctionIdentifier("graft_lsh_sig"),
      info("graft_lsh_sig", "graft_lsh_sig(vec, planes) - random-hyperplane LSH bit signature"),
      (args: Seq[Expression]) => LshSignature(args(0), GraftExtensions.intLitArg("graft_lsh_sig", args, 2, 1, "planes"))))
    e.injectFunction((
      FunctionIdentifier("graft_stopword_count"),
      info("graft_stopword_count",
        "graft_stopword_count(tokens, array('the', ...)) - tokens present in the word list"),
      (args: Seq[Expression]) => GraftExtensions.stopwordCount(args)))
    e.injectFunction((
      FunctionIdentifier("graft_lang_id"),
      info("graft_lang_id",
        "graft_lang_id(tokens) - stopword-vote language id over the built-in de/en/es/fr lists"),
      (args: Seq[Expression]) => LangIdExpr(args.head, graft.ops.TextAnalysis.LangTable)))
    e.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams",
        "graft_word_ngrams(text, n) - space-joined word n-grams (whitespace tokens)"),
      (args: Seq[Expression]) => WordNgrams(args(0), GraftExtensions.intLitArg("graft_word_ngrams", args, 2, 1, "n"))))
    e.injectFunction((
      FunctionIdentifier("graft_intersect_count_sorted"),
      info("graft_intersect_count_sorted",
        "graft_intersect_count_sorted(a, b) - intersection size of two sorted long arrays"),
      (args: Seq[Expression]) => IntersectCountSorted(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(text) - Shannon entropy (nats) of the char distribution"),
      (args: Seq[Expression]) => CharEntropy(args.head)))
    e.injectFunction((
      FunctionIdentifier("graft_bpe_encode"),
      info("graft_bpe_encode",
        "graft_bpe_encode(text, array('lh rh', ...)) - BPE encode with rank-ordered " +
          "'lhs rhs' merge literals"),
      (args: Seq[Expression]) => GraftExtensions.bpeEncode(args)))
    e.injectFunction((
      FunctionIdentifier("graft_wordpiece_encode"),
      info("graft_wordpiece_encode",
        "graft_wordpiece_encode(text, array(piece, ...), maxPieceLen) - WordPiece greedy " +
          "longest-match encode against a literal vocabulary"),
      (args: Seq[Expression]) => GraftExtensions.wordpieceEncode(args)))
    e.injectFunction((
      FunctionIdentifier("graft_unigram_encode"),
      info("graft_unigram_encode",
        "graft_unigram_encode(text, array(piece, ...), array(logprob, ...), maxPieceLen) - " +
          "Viterbi unigram-LM encode against literal parallel piece/logprob arrays"),
      (args: Seq[Expression]) => GraftExtensions.unigramEncode(args)))
    e.injectFunction((
      FunctionIdentifier("graft_mmr_select"),
      info("graft_mmr_select",
        "graft_mmr_select(candidates, lambda, k) - MMR-diversify an " +
          "array<struct<id, sim, vec>> candidate list; returns array<struct<id, mmr>>"),
      (args: Seq[Expression]) => GraftExtensions.mmrSelect(args)))
  }
}

object GraftExtensions {
  /** Arity + foldable-INT-literal validation for SQL function builders:
    * a wrong arg count or a non-literal / non-INT argument (a column ref,
    * `2L`, NULL) raises a proper AnalysisException with Spark's standard
    * error classes instead of an opaque ClassCastException/NPE.
    */
  private[graft] def intLitArg(
      fn: String, args: Seq[Expression], arity: Int, idx: Int, param: String): Int = {
    import org.apache.spark.sql.AnalysisException
    // WRONG_NUM_ARGS has subclasses, and AnalysisException's constructor
    // asserts class/subclass consistency while formatting — the bare class
    // name would surface as a raw AssertionError, so the subclass (and its
    // docroot param) is mandatory here
    if (args.length != arity)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`$fn`", "expectedNum" -> arity.toString,
        "actualNum" -> args.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"), None)
    val e = args(idx)
    def bad: Nothing = throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
      "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
      "paramType" -> "\"INT\""), None)
    if (!e.foldable || e.dataType != org.apache.spark.sql.types.IntegerType) bad
    e.eval() match {
      case i: Int => i
      case _ => bad
    }
  }

  /** Builder for the SQL form: the word list must be a foldable array of
    * string literals (evaluated once at plan time).
    */
  private[graft] def stopwordCount(args: Seq[Expression]): Expression = {
    require(args(1).foldable, "graft_stopword_count word list must be a literal array")
    val words = stringArrayLit("graft_stopword_count", args(1))
    StopwordCount(args(0), words)
  }

  private def stringArrayLit(fn: String, e: Expression): Seq[String] = {
    require(e.foldable, s"$fn: argument must be a literal array of strings")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** SQL builder: merges as rank-ordered 'lhs rhs' string literals (the
    * model travels inside the plan — tokenizers are bounded vocab-sized).
    */
  private[graft] def bpeEncode(args: Seq[Expression]): Expression = {
    val pairs = stringArrayLit("graft_bpe_encode", args(1)).map { s =>
      val i = s.indexOf(' ')
      require(i > 0 && i < s.length - 1,
        s"graft_bpe_encode: merge '$s' must be 'lhs rhs'")
      (s.substring(0, i), s.substring(i + 1))
    }
    graft.functions.BpeEncodeText(args(0), pairs, graft.ops.Bpe.EndOfWord)
  }

  private[graft] def wordpieceEncode(args: Seq[Expression]): Expression = {
    val vocab = stringArrayLit("graft_wordpiece_encode", args(1))
    val maxLen = intLitArg("graft_wordpiece_encode", args, 3, 2, "maxPieceLen")
    graft.functions.WordPieceEncodeText(args(0), vocab, maxLen, graft.ops.WordPiece.Unk)
  }

  private[graft] def unigramEncode(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.types._
    val pieces = stringArrayLit("graft_unigram_encode", args(1))
    require(args(2).foldable, "graft_unigram_encode: logprobs must be a literal array")
    val arr = args(2).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // SQL decimal literals (`-1.5`) parse as DECIMAL, not DOUBLE — accept
    // any numeric element type
    val lps = args(2).dataType match {
      case ArrayType(et, _) =>
        (0 until arr.numElements()).map { i =>
          et match {
            case DoubleType => arr.getDouble(i)
            case FloatType => arr.getFloat(i).toDouble
            case dt: DecimalType => arr.getDecimal(i, dt.precision, dt.scale).toDouble
            case IntegerType => arr.getInt(i).toDouble
            case LongType => arr.getLong(i).toDouble
            case other => throw new IllegalArgumentException(
              s"graft_unigram_encode: logprob element type $other is not numeric")
          }
        }
      case other => throw new IllegalArgumentException(
        s"graft_unigram_encode: logprobs must be an array, got $other")
    }
    require(pieces.length == lps.length,
      s"graft_unigram_encode: ${pieces.length} pieces vs ${lps.length} logprobs")
    val maxLen = intLitArg("graft_unigram_encode", args, 4, 3, "maxPieceLen")
    graft.functions.UnigramEncodeText(args(0), pieces.zip(lps), maxLen, graft.ops.Unigram.Unk)
  }

  /** SQL builder for [[graft.functions.MmrSelect]]: lambda must be a
    * foldable numeric literal (SQL `0.7` parses as DECIMAL — any numeric
    * type is accepted), k a foldable INT.
    */
  private[graft] def mmrSelect(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.types._
    val k = intLitArg("graft_mmr_select", args, 3, 2, "k")
    val le = args(1)
    require(le.foldable, "graft_mmr_select: lambda must be a numeric literal")
    val lam = (le.dataType, le.eval()) match {
      case (DoubleType, v: java.lang.Double) => v.doubleValue
      case (FloatType, v: java.lang.Float) => v.doubleValue
      case (dt: DecimalType, v: org.apache.spark.sql.types.Decimal) => v.toDouble
      case (IntegerType, v: java.lang.Integer) => v.doubleValue
      case (LongType, v: java.lang.Long) => v.doubleValue
      case (dt, _) => throw new IllegalArgumentException(
        s"graft_mmr_select: lambda must be numeric, got $dt")
    }
    graft.functions.MmrSelect(args(0), lam, k)
  }
}

/** Same registrations for an ALREADY-RUNNING session (tests, REPL). */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    put("graft_dot", args => DotProduct(args(0), args(1)))
    put("graft_simhash64", args => SimHash64(args.head))
    put("graft_minhash_sig", args => MinHashSig(args(0), GraftExtensions.intLitArg("graft_minhash_sig", args, 2, 1, "k")))
    put("graft_shingle_hash", args => ShingleHash(args(0), GraftExtensions.intLitArg("graft_shingle_hash", args, 2, 1, "k")))
    put("graft_lsh_sig", args => LshSignature(args(0), GraftExtensions.intLitArg("graft_lsh_sig", args, 2, 1, "planes")))
    put("graft_stopword_count", GraftExtensions.stopwordCount)
    put("graft_lang_id", args => LangIdExpr(args.head, graft.ops.TextAnalysis.LangTable))
    put("graft_word_ngrams", args => WordNgrams(args(0), GraftExtensions.intLitArg("graft_word_ngrams", args, 2, 1, "n")))
    put("graft_intersect_count_sorted", args => IntersectCountSorted(args(0), args(1)))
    put("graft_char_entropy", args => CharEntropy(args.head))
    put("graft_bpe_encode", GraftExtensions.bpeEncode)
    put("graft_wordpiece_encode", GraftExtensions.wordpieceEncode)
    put("graft_unigram_encode", GraftExtensions.unigramEncode)
    put("graft_mmr_select", GraftExtensions.mmrSelect)
  }
}
