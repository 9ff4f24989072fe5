package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (north-star surface,
  * BASELINE.json): remove training documents that share any word n-gram
  * with an evaluation/benchmark set, the standard guard against test-set
  * leakage in pretraining pipelines (public practice: GPT-3 App. C /
  * Gopher-style 8-to-13-gram overlap checks).
  *
  * Scale shape: the benchmark side is SMALL by nature (eval suites are
  * thousands of documents, the corpus is billions), so its distinct n-gram
  * set is collected into a broadcast hash relation — the corpus side then
  * streams map-side through explode → broadcast-join → group, with ONE
  * shuffle keyed by doc id for the per-document hit count (or none at all
  * for the semi/anti-join forms). The corpus is never self-joined and the
  * n-gram space is never materialized globally.
  *
  * N-grams are space-joined word STRINGS (not hashes) so an external SQL
  * engine computes the identical overlap — the exactness contract is
  * cross-engine-checkable, unlike xxhash shingles.
  */
object Decontaminate {

  /** Word n-grams of a whitespace-tokenized text column, as strings.
    * Documents shorter than `n` tokens yield no n-grams (they cannot
    * contain a full window; mirrors the benchmark-overlap convention of
    * skipping fragments). Native codegen'd single pass
    * ([[graft.functions.WordNgrams]]); [[wordNgramsHof]] is the interpreted
    * cross-check oracle.
    */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.TextFunctions.word_ngrams(text, n)

  /** Pure-HOF reference formulation of [[wordNgrams]] — interpreted, kept
    * as the cross-check oracle for the native expression (they must agree
    * exactly; see DecontaminateSpec). Tokenization on RE2's \s class
    * (`[ \t\n\f\r]+` — NOT Java's \s, which adds vertical tab; the DuckDB
    * oracle's string_split_regex('\s+') is RE2) + empty-token filter:
    * repeated/leading/trailing whitespace must not produce empty grams
    * (they'd spuriously match across unrelated documents).
    */
  def wordNgramsHof(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val toks = filter(split(text, "[ \t\n\f\r]+"), t => t =!= "")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
  }

  /** Per-document contamination hits: (id, n_hits) for every corpus
    * document sharing ≥1 distinct word n-gram with the benchmark set.
    * Clean documents are absent from the result.
    */
  def contaminationHits(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .distinct()
    corpus
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** Gram-level contamination forensics: the (id, gram) pairs behind
    * [[contaminationHits]] — WHICH benchmark n-grams each contaminated
    * document shares, the report an eval-integrity audit actually reads.
    * Same broadcast shape as the hit count (bench grams broadcast, corpus
    * map-side); output is hit-bounded, one row per distinct shared gram.
    */
  def contaminationGrams(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .distinct()
    corpus
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select(col(idCol), col("gram"))
  }

  /** The decontaminated corpus: documents with NO word-n-gram overlap with
    * the benchmark set. The contaminated-id set is produced by a broadcast
    * join on the exploded grams (map-side) and distinct'd directly — no
    * per-document hit-count aggregation — then removed with an anti-join
    * keyed by doc id: shuffles carry only ID-width rows, never documents.
    */
  def decontaminate(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .distinct()
    val contaminatedIds = corpus
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select(idCol).distinct()
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] behind a Bloom-filter prefilter — the form for when
    * the benchmark-gram set is too large to broadcast as an exact hash
    * relation (dozens of eval suites × 8..13-gram windows reach 10⁸–10⁹
    * distinct grams, tens of GB of strings; a Bloom filter over their
    * xxhash64 keys at 1% fpp is ~1.2 GB — broadcastable where the strings
    * are not).
    *
    * Exactness is preserved: the Bloom pass only PREFILTERS. The corpus
    * gram stream is probed map-side (`might_contain` — same codegen'd
    * expression Spark's runtime row-level filtering injects); survivors
    * (true hits + ~fpp false positives, a vanishing fraction of corpus
    * grams) are confirmed with an exact semi-join against the real gram
    * set — deliberately NOT broadcast-hinted, because this join sees only
    * the survivor sliver and a plain shuffle join keyed on the gram is the
    * form that still works when the bench side is broadcast-hostile. The
    * final corpus is bit-identical to [[decontaminate]] (asserted in
    * DecontaminateSpec), so the DuckDB oracle is the exact recomputation.
    *
    * The one action is collecting the built sketch itself (single binary
    * row, size chosen by `fpp` — the same bounded-by-construction class as
    * the IVF codebook collects); the build is a distributed
    * `bloom_filter_agg` over the bench grams, not a driver loop.
    */
  def bloomDecontaminate(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val benchGrams = bench
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .distinct()
    // sketch sizing needs the distinct-gram cardinality; exact count is a
    // cheap aggregate of the (already shuffled-distinct) bench side
    val nGrams = benchGrams.count()
    if (nGrams == 0L) return corpus
    // standard Bloom sizing: m = -n·ln(p)/ln(2)², floor 64 bits
    val numBits = math.max(64L,
      math.ceil(-nGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloom = benchGrams
      .agg(graft.functions.TextFunctions.bloom_filter_agg(
        xxhash64(col("gram")), nGrams, numBits))
      .head().getAs[Array[Byte]](0)
    val candidate = corpus
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .filter(graft.functions.TextFunctions.might_contain(
        lit(bloom), xxhash64(col("gram"))))
    val contaminatedIds = candidate
      .join(benchGrams, Seq("gram"), "left_semi")
      .select(idCol).distinct()
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /** Embedding-space contamination: corpus rows whose nearest benchmark
    * embedding has cosine ≥ `threshold`, with that benchmark id as
    * evidence — the semantic complement of the n-gram [[contaminationHits]]
    * (public practice: paraphrased benchmark leakage survives exact-gram
    * checks; SemDeDup-style cosine matching catches it).
    *
    * Output: (idCol, bench_id, cosine) — one row per contaminated corpus
    * doc, its argmax benchmark neighbor (ties → lowest bench id), cosine
    * rounded 4 dp.
    *
    * Scale shape: the benchmark side is suite-sized (thousands of rows,
    * KB–MB of vectors) → broadcast nested-loop against the corpus scan,
    * which is touched ONCE, map-side; the only shuffle is the per-corpus-id
    * argmax aggregate, id-width. No corpus self-join, no index build —
    * for a benchmark set small enough to broadcast, brute force IS the
    * scale path.
    */
  def semanticContamination(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchVecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.{vec_dot, vec_norm}
    require(threshold > 0 && threshold <= 1, s"bad cosine threshold: $threshold")
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
      vec_norm(col(vecCol)).as("__cn"))
    val b = bench.select(col(benchIdCol).as("bench_id"), col(benchVecCol).as("__bv"),
      vec_norm(col(benchVecCol)).as("__bn"))
    c.crossJoin(broadcast(b))
      .withColumn("__cos",
        round(vec_dot(col("__cv"), col("__bv")) / (col("__cn") * col("__bn")), 4))
      .filter(col("__cos") >= threshold)
      .groupBy(col("__cid"))
      .agg(max_by(struct(col("__cos"), (-col("bench_id")).as("__nb")),
        struct(col("__cos"), (-col("bench_id")).as("__nb"))).as("__best"))
      .select(col("__cid").as(idCol),
        (-col("__best.__nb")).as("bench_id"),
        col("__best.__cos").as("cosine"))
  }
}
