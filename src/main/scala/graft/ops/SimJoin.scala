package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (SSJoin/PPJoin
  * family — Chaudhuri, Ganti & Kaushik, ICDE'06; Xiao, Wang, Lin & Yu,
  * WWW'08). The scalable counterpart of [[Dedup.ngramJaccardPairs]]:
  * that anchor is an O(n²) cross join (allowlisted, slice-bounded);
  * this produces the IDENTICAL pair set — every pair with Jaccard ≥ t,
  * guaranteed complete, same shingle identities ([[Dedup.shingles]]) —
  * through a linear-shuffle plan with no cross join at all. Where the
  * MinHash/LSH leg trades recall for speed (audited by
  * `dedup_oversized_buckets`), prefix filtering pays exactness with a
  * candidate aggregation whose posting lists the rarity order keeps
  * short by construction.
  *
  * Principle: order each document's distinct shingles by GLOBAL rarity
  * (corpus frequency ascending, shingle ascending as tie-break — a
  * total order). If `J(x,y) ≥ t` then `|x∩y| ≥ t·|x∪y| ≥ ⌈t·|x|⌉`, and
  * two sets sharing ≥ α elements must share one inside their first
  * `|·| − α + 1` elements under ANY common total order — so candidates
  * need only agree on one shingle of each side's `|x| − ⌈t·|x|⌉ + 1`
  * prefix. The rarity order puts the RAREST shingles in prefixes: the
  * boilerplate shingle shared by half the corpus sorts last and never
  * enters a posting list unless a doc is nearly all boilerplate.
  *
  * Plan shape (100 TB): one shingle-frequency aggregate, one doc-keyed
  * aggregate to sort/slice prefixes, one groupBy-shingle candidate
  * aggregation with [[Dedup.orderedPairsOf]] pair explosion (the
  * bucket-list pattern — no self-join), a Jaccard length-bound filter
  * before the pair distinct, two slim id-keyed joins to re-attach
  * shingle sets, codegen'd sorted-merge intersection verify
  * ([[graft.functions.TextFunctions.intersect_count_sorted]]). Reference behavior
  * spec: the dedup surface of SURVEY.md §7.5 (the reference itself has
  * only pandas `drop_duplicates` — exact-equality — at
  * `Template-to-*` ingest).
  */
object SimJoin {

  /** Slack subtracted from the prefix-length and length-bound products:
    * `t·n` in binary fp can land one ulp ABOVE the exact value at
    * integer boundaries (e.g. t = 0.6, n = 5), which would shorten the
    * prefix / reject a pair whose true Jaccard equals the threshold.
    * Both uses are candidate LOWER bounds, so loosening by 1e-9 keeps
    * the completeness guarantee at any representable threshold (the
    * exact Jaccard verify still filters on the unrounded value).
    */
  private[ops] val BoundEps = 1e-9

  /** (id, distinct shingle hash) rows — the shared gram shape of every
    * prefix-filter leg ([[prefixJaccard]], [[incrementalPairs]],
    * [[SimJoinIndex]]).
    */
  private[ops] def gramsOf(
      df: DataFrame, idCol: String, textCol: String, shingleK: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(Dedup.shingleHashes(col(textCol), shingleK))).as("h"))

  /** Per doc, from ONE aggregate under the given df table: the
    * rarity-ordered array (prefix source — array_sort's natural struct
    * order IS the rarity order, so no vocabulary-wide window/rank is
    * ever materialized), the value-sorted array
    * (intersect_count_sorted's input contract) and the set size.
    * `joinType = "left"` freezes the order for a batch side: unseen
    * shingles take df 0 and sort first without reordering any indexed
    * shingle.
    */
  private[ops] def sortedUnder(
      g: DataFrame, freq: DataFrame, joinType: String): DataFrame = g
    .join(freq, Seq("h"), joinType)
    .withColumn("freq", coalesce(col("freq"), lit(0L)))
    .groupBy("id")
    .agg(array_sort(collect_list(struct(col("freq"), col("h")))).as("st"))
    .select(col("id"),
      transform(col("st"), s => s.getField("h")).as("pref_order"),
      array_sort(transform(col("st"), s => s.getField("h"))).as("set"),
      size(col("st")).as("n"))

  /** Prefix posting rows (id, n, h): each doc's first n − ⌈t·n⌉ + 1
    * (≥ 1) rarity-ordered shingles.
    */
  private[ops] def prefixRows(side: DataFrame, threshold: Double): DataFrame = {
    val prefixLen =
      col("n") - ceil(lit(threshold) * col("n") - lit(BoundEps)).cast("int") + 1
    side.select(col("id"), col("n"),
      explode(slice(col("pref_order"), lit(1), greatest(prefixLen, lit(1)))).as("h"))
  }

  /** All pairs `(id_a < id_b, jaccard)` with word-`shingleK`-gram Jaccard
    * ≥ `threshold` (filtered on the unrounded value; `jaccard` reported
    * rounded to 4). Shingle identities match [[Dedup.shingles]]: texts
    * shorter than `shingleK` tokens contribute their whole text as the
    * single set element.
    */
  def prefixJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")

    // (id, shingle-hash) distinct — hashed shingles keep the whole
    // pipeline on array<long> (the dedup family's verification
    // convention: same set identities as the strings short of a 2^-64
    // collision, an order of magnitude cheaper to intersect)
    val grams = gramsOf(df, idCol, textCol, shingleK)

    // global rarity: corpus document-frequency asc, hash asc
    val freq = grams.groupBy("h").agg(count(lit(1)).as("freq"))

    // localCheckpoint: three consumers below (prefixes + both verify
    // sides) would otherwise re-run the freq join and the aggregate
    val sorted = sortedUnder(grams, freq, "inner").localCheckpoint()

    // prefix of length n − ⌈t·n⌉ + 1 (≥ 1), rarest shingles first
    val prefixes = prefixRows(sorted, threshold)

    // candidates: ids sharing a prefix shingle, oriented pairs from each
    // posting list (no self-join); the Jaccard length bound
    // min(|a|,|b|) ≥ t·max(|a|,|b|) prunes before the pair distinct
    val pairIds = prefixes
      .groupBy("h")
      .agg(collect_list(struct(col("id"), col("n"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(Dedup.orderedPairsOf(col("ids"))).as("p"))
      .select(col("p.id_a.id").as("id_a"), col("p.id_a.n").as("n_a"),
        col("p.id_b.id").as("id_b"), col("p.id_b.n").as("n_b"))
      .filter(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")) - lit(BoundEps))
      .select("id_a", "id_b")
      .distinct()

    // exact verify on the full (value-sorted) shingle-hash sets
    val sets = sorted.select(col("id"), col("set"))
    pairIds
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("set", "set_a"), Seq("id_a"))
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("set", "set_b"), Seq("id_b"))
      .withColumn("__inter",
        graft.functions.TextFunctions.intersect_count_sorted(
          col("set_a"), col("set_b")).cast("double"))
      .withColumn("__j",
        col("__inter") / (size(col("set_a")) + size(col("set_b")) - col("__inter")))
      .filter(col("__j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
  }

  /** Incremental EXACT similarity join: every batch↔corpus pair with
    * Jaccard ≥ `threshold` (no corpus self-pairs, no batch self-pairs —
    * the [[Dedup.minhashLshIncremental]] contract, but complete instead
    * of LSH-recall). Returns (batch_id, corpus_id, jaccard).
    *
    * The rarity order is FROZEN from the corpus: batch shingles unseen
    * by the corpus take document-frequency 0 and sort first (rarest).
    * The prefix-filtering proof needs only A common total order over
    * both sides' shingles, and (corpus-df, hash) extended by df-0
    * newcomers is one — newcomers slot in without reordering any corpus
    * shingle, so the corpus prefixes stay valid AS BUILT. That is what
    * makes this O(|batch|) per increment: at 100 TB the corpus posting
    * lists (prefix shingle → ids) and sorted sets are the natural
    * precomputed index, stored bucketed by shingle hash, and each daily
    * batch equi-joins against them — the corpus is re-read, never
    * re-paired, and never self-joined.
    */
  def incrementalPairs(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")

    val corpusGrams = gramsOf(corpus, idCol, textCol, shingleK)
    // vocabulary-sized; checkpointed because BOTH sides' rarity sorts
    // consume it — lazily it would re-run the corpus gram scan twice
    val freq = corpusGrams.groupBy("h").agg(count(lit(1)).as("freq"))
      .localCheckpoint()

    // rarity-sorted arrays under the FROZEN corpus order; the batch
    // left-joins the frozen df table (unseen → 0)
    val corpusSorted = sortedUnder(corpusGrams, freq, "inner").localCheckpoint()
    val batchSorted =
      sortedUnder(gramsOf(batch, idCol, textCol, shingleK), freq, "left")
        .localCheckpoint()

    // candidates: ONE equi-join batch-prefix ↔ corpus-prefix on the
    // shingle hash (at scale: batch side small, corpus side the stored
    // index), then the Jaccard length bound before the distinct
    val pairIds = prefixRows(batchSorted, threshold)
      .select(col("h"), col("id").as("batch_id"), col("n").as("n_b"))
      .join(prefixRows(corpusSorted, threshold)
        .select(col("h"), col("id").as("corpus_id"), col("n").as("n_c")), Seq("h"))
      .filter(least(col("n_b"), col("n_c")) >=
        lit(threshold) * greatest(col("n_b"), col("n_c")) - lit(BoundEps))
      .select("batch_id", "corpus_id")
      .distinct()

    pairIds
      .join(batchSorted.select(col("id").as("batch_id"), col("set").as("set_b")),
        Seq("batch_id"))
      .join(corpusSorted.select(col("id").as("corpus_id"), col("set").as("set_c")),
        Seq("corpus_id"))
      .withColumn("__inter",
        graft.functions.TextFunctions.intersect_count_sorted(
          col("set_b"), col("set_c")).cast("double"))
      .withColumn("__j",
        col("__inter") / (size(col("set_b")) + size(col("set_c")) - col("__inter")))
      .filter(col("__j") >= threshold)
      .select(col("batch_id"), col("corpus_id"), round(col("__j"), 4).as("jaccard"))
  }
}
