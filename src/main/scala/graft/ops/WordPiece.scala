package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WordPiece-style subword vocabulary + greedy longest-match encoding
  * (Wu et al. 2016, "Google's Neural Machine Translation System"; the
  * BERT tokenizer family — public method). Complements [[Bpe]]: BPE
  * *replays ranked merges*, WordPiece *greedily longest-matches against a
  * vocabulary*, with `##`-prefixed continuation pieces and whole-word
  * `[UNK]` fallback.
  *
  * Vocabulary selection here is the frequency-ranked variant (score =
  * summed occurrence count of each piece across the distinct-word
  * frequency table) — deterministic and fully relational, so the DuckDB
  * oracle recomputes it; the likelihood-EM refinement of the original
  * paper changes scores, not the pipeline shape.
  *
  * Scale shape: the corpus is touched ONCE ([[Bpe.wordCounts]]); piece
  * candidate generation explodes the distinct-word table by
  * O(len × maxPieceLen) — vocabulary-sized, not corpus-sized — and the
  * ranking window runs over the bounded post-minCount piece set, exactly
  * like [[TextAnalysis.buildVocab]]. Encoding is the corpus-scale hot
  * path and lives in the native codegen'd
  * [[graft.functions.WordPieceEncodeText]].
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Build the piece vocabulary from a (word, n) frequency table:
    * every substring of every distinct word (up to `maxPieceLen` chars)
    * becomes a candidate — word-initial substrings as-is, word-internal
    * ones `##`-prefixed — scored by the summed count of the words that
    * contain them (once per position). Pieces below `minCount` drop; the
    * survivors rank by (freq desc, piece asc) and the top `maxVocab`
    * win. Returns (piece, piece_id, freq), piece_id 1-based in rank
    * order.
    */
  def buildVocab(
      words: DataFrame,
      maxPieceLen: Int = 6,
      maxVocab: Int = 2048,
      minCount: Long = 5L): DataFrame = {
    require(maxPieceLen >= 1 && maxVocab >= 1)
    val cand = words
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word"), col("n"), col("p"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("p") + col("l") - 1 <= length(col("word")))
      .select(
        when(col("p") === 1, expr("substr(word, p, l)"))
          .otherwise(concat(lit("##"), expr("substr(word, p, l)"))).as("piece"),
        col("n"))
    cand.groupBy("piece").agg(sum("n").as("freq"))
      .filter(col("freq") >= minCount)
      .withColumn("piece_id",
        row_number().over(Window.orderBy(col("freq").desc, col("piece"))).cast("int"))
      .filter(col("piece_id") <= maxVocab)
      .select("piece", "piece_id", "freq")
  }
}
