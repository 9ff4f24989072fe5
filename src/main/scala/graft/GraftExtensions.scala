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
    val arr = args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val words = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    StopwordCount(args(0), words)
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
  }
}
