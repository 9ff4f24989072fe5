package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.PinnedOracles
import graft.etl.{FileLoads, Loads, Sanitize, Tables, Windows}
import graft.ops.{Bpe, Dedup, Multimodal, Pca, Similarity, TextAnalysis}
import graft.schema.Ddl
import graft.queries.Fixtures._
import graft.queries.OracleCtes._

/** sampling, splits, mixture weighting/packing order and
  * anonymization / differential privacy.
  *
  * One registry slice of [[graft.SparkEntry]] (split r14 — the single
  * 6.6k-line file was the bottleneck): `queries` feeds the driver's
  * Verify/Bench maps, `oracles` the DuckDB compare. Keys and bodies are
  * unchanged from the pre-split registry.
  */
object SamplingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // l-diversity audit over the k-anonymous release: a k-anonymous group
    // whose members all share one sensitive value still leaks it
    // (homogeneity attack) — per quasi group, size + distinct sensitive
    // count for the caller's l threshold. Sensitive stand-in: the
    // doc-length bucket.
    "anonymize_ldiversity" -> ((s, dir) =>
      graft.ops.Anonymize.lDiversityAudit(
          graft.ops.Anonymize.kAnonymize(
            Tables.documents(s, dir), Seq("lang", "source"), k = 5)
            .withColumn("len_bucket", (col("n_chars") % 16).cast("int")),
          Seq("lang", "source"), "len_bucket")
        .orderBy("lang", "source")),


    // ε-DP released counts (Laplace-mechanism SIMULATION — the seeded
    // noise is deterministic BY DESIGN so the full DuckDB oracle replays
    // it; see the loud caveat on Anonymize.dpCounts): per-event-type
    // counts with ε=0.5 noise and the mechanism's 95th-percentile error
    // bound beside each value
    "dp_counts" -> ((s, dir) =>
      graft.ops.Anonymize.dpCounts(
          Tables.events(s, dir), "event_type", epsilon = 0.5, seed = "dp0")
        .orderBy("event_type")),


    // Sequential-composition DP ledger (Dwork & Roth Thm 3.14): three
    // scheduled count releases against the same events table, each row
    // tagged with its release's ε and the RUNNING Σε — the accounting a
    // re-releasing pipeline must keep (privacy spend adds; a daily
    // release at ε=0.5 burns 3.5/week). Full DuckDB oracle (deterministic
    // simulation noise, per-release seeds); composition property
    // first-principles in AnonymizeSpec.
    "dp_ledger" -> ((s, dir) =>
      graft.ops.Anonymize.dpLedger(
          Tables.events(s, dir), "event_type", Seq(
            graft.ops.Anonymize.DpRelease("r1_mon", 0.5, "dpa"),
            graft.ops.Anonymize.DpRelease("r2_tue", 0.5, "dpb"),
            graft.ops.Anonymize.DpRelease("r3_weekly", 1.0, "dpc")))
        .orderBy("release_id", "event_type")),


    // Clamped DP sum + two-query DP mean (Dwork & Roth §3.3/3.5; same
    // deterministic-simulation caveat): values clamp into [0,100] BEFORE
    // aggregation — bounded contribution caps the sum's sensitivity at
    // 100, the step that keeps required noise finite under wild rows —
    // sum on ε=1, mean as noisy-sum/noisy-count each on ε/2. Full oracle.
    "dp_sum_mean" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.ops.Anonymize.dpSum(ev, "event_type", "value",
          lo = 0.0, hi = 100.0, epsilon = 1.0, seed = "dps")
        .join(graft.ops.Anonymize.dpMean(ev, "event_type", "value",
            lo = 0.0, hi = 100.0, epsilon = 1.0, seed = "dpm")
          .select(col("event_type"), col("mean_noisy"), col("n_noisy")),
          Seq("event_type"))
        .orderBy("event_type")
    }),


    // Weighted source interleave: the training-order materialization of a
    // mixture — per-source md5 shuffle, then stride-scheduled merge
    // ((rank-0.5)/weight sort key) so a 3.0-weight source appears 3× as
    // often at every stream prefix. BOTH the in-source rank and the
    // global positions ride the bucketed two-level prefix sum — no
    // single-partition sort, not even for one giant source.
    "mix_interleave" -> ((s, dir) =>
      graft.ops.Sampling.interleaveSources(
          Tables.documents(s, dir).select("doc_id", "source"),
          "source", "doc_id", Map("src0" -> 3.0, "src1" -> 0.5))
        .orderBy("pos")),


    // Deterministic contrastive negative sampling over the labeled
    // embedding corpus: k=4 off-label negatives per anchor from a
    // hash-bucketed candidate slice (never the full corpus), ranked by
    // md5(seed:anchor:cand) — reproducible and engine-recomputable.
    "negative_sample" -> ((s, dir) =>
      graft.ops.Sampling.negativeSample(
          Tables.embeddings(s, dir).select("vec_id", "label"),
          "vec_id", "label", k = 4, numBuckets = 16)
        .orderBy("anchor_id", "neg_rank")),


    // the SCALE-SAFE form (Sampling.negativeSampleAuto): bucket count
    // derived as max(16, ⌈n/512⌉), holding the per-anchor candidate
    // slice ≈512 rows at any corpus size — the fixed-16-bucket query
    // above is O(n²/16) and the r18 ×100 sweep measured exactly that
    // (a ~15-billion-row join; killed after an hour). At sf0.01 the
    // derivation lands on 16, so this serves the IDENTICAL sample set;
    // the oracle recomputes the same count-derived modulus.
    "negative_sample_auto" -> ((s, dir) =>
      graft.ops.Sampling.negativeSampleAuto(
          Tables.embeddings(s, dir).select("vec_id", "label"),
          "vec_id", "label", k = 4, sliceTarget = 512, minBuckets = 16)
        .orderBy("anchor_id", "neg_rank")),


    // deterministic global training-order shuffle: dense 0-based pos =
    // rank under md5(seed:id) — the shuffle-before-sharding step of an
    // epoch pipeline; positions via the two-level range-bucketed prefix
    // sum, so NO global single-partition sort (md5, not xxhash64, so the
    // permutation recomputes in DuckDB — full oracle, not pinned)
    "shuffle_order" -> ((s, dir) =>
      graft.ops.Sampling.shuffleOrder(
          Tables.documents(s, dir).select("doc_id"), "doc_id", seed = "epoch0")
        .orderBy("pos")),


    // Curriculum training order (Bengio et al. 2009): unigram-NLL
    // difficulty → 4 percentile tiers (easy first) → deterministic
    // in-tier md5 shuffle → global position via the bucketed prefix sum.
    // One broadcast percentile aggregate + map-side tier assignment; the
    // whole order is plain SQL, so the oracle replays it end to end
    "curriculum_order" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val nll = TextAnalysis.nllScore(docs, "doc_id", "text",
        TextAnalysis.unigramModel(docs, "text"))
      graft.ops.Sampling.curriculumOrder(nll, "doc_id", col("nll"), tiers = 4)
        .orderBy("pos")
    }),


    // deterministic hash split — pinned VALUES oracle (Spark-side
    // xxhash64; driver-side recomputation in SamplingSpec)
    "train_test_split" -> ((s, dir) =>
      graft.ops.Sampling.trainTestSplit(Tables.documents(s, dir), 0.2, col("doc_id"))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split")),


    // GROUP-integrity split: all of a user's events land in one split
    // (no train/eval leakage across an entity); the query carries its own
    // leak audit — `leaked_groups` counts users seen in BOTH splits and
    // must be 0 by construction. md5-keyed → full SQL oracle
    "grouped_split" -> ((s, dir) => {
      val sp = graft.ops.Sampling.groupedSplit(
        Tables.events(s, dir), testFraction = 0.25, col("user_id"), seed = "split0")
      val leak = sp.groupBy("user_id")
        .agg(count_distinct(col("split")).as("__k"))
        .agg(sum(when(col("__k") > 1, 1L).otherwise(0L)).as("leaked_groups"))
      sp.groupBy("split")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_id")).as("n_groups"))
        .crossJoin(broadcast(leak))
        .orderBy("split")
    }),


    // EXACT stratified split: exactly round(0.25·n_s) docs per source go
    // to test (the hash-threshold forms are only ~proportional) — rank by
    // md5(seed:id) within source via the bucketed prefix sum, counts
    // broadcast. Full DuckDB oracle replays the assignment row for row
    "exact_stratified_split" -> ((s, dir) =>
      graft.ops.Sampling.exactStratifiedSplit(
          Tables.documents(s, dir).select("doc_id", "source"),
          "doc_id", col("source"), testFraction = 0.25)
        .orderBy("doc_id")),


    // deterministic per-stratum sampling (hash salted by the stratum) —
    // pinned VALUES oracle; driver-side recomputation in SamplingSpec
    "stratified_sample" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSample(
          Tables.documents(s, dir), col("lang"), 0.1, col("doc_id"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),


    // Per-stratum Efraimidis–Spirakis weighted sample: the k=5 smallest
    // ES keys WITHIN EACH source — in-stratum rank via the bucketed
    // prefix sum (no per-source single-task window). Pinned (xxhash ES
    // keys); driver-side ES recomputation in SamplingSpec
    "weighted_sample_per_stratum" -> ((s, dir) =>
      graft.ops.Sampling.weightedSamplePerStratum(
          Tables.documents(s, dir), col("source"), k = 5,
          col("n_chars"), col("doc_id"))
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("bigint").as("n_chars"),
          round(col("sample_key"), 6).as("sample_key"))
        .orderBy("doc_id")),


    // Efraimidis–Spirakis weighted sample (k=50 by char length): map-side
    // ES keys + global top-k heaps — no corpus sort, no shuffle
    "weighted_sample" -> ((s, dir) =>
      graft.ops.Sampling.weightedSample(
          Tables.documents(s, dir), 50, col("n_chars"), col("doc_id"))
        .select(col("doc_id"), col("n_chars").cast("bigint").as("n_chars"),
          round(col("sample_key"), 6).as("sample_key"))
        .orderBy("doc_id")),


    // per-source token-budget cap: greedy doc_id-ordered prefix per source
    // under an 800-token budget (SQL-recomputable order; the hash-ordered
    // unbiased form is the operator's documented default)
    "source_token_budget" -> ((s, dir) =>
      graft.ops.Sampling.tokenBudget(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"),
              TextAnalysis.tokenCount(col("text")).cast("bigint").as("tokens")),
          col("source"), col("tokens"), budget = 800, col("doc_id"))
        .orderBy("doc_id")),


    // k-anonymity suppression: only rows whose (lang, source) group has
    // >= 5 members are released — one count window keyed by the quasi
    // tuple (one shuffle, no second corpus scan)
    "anonymize_k" -> ((s, dir) =>
      graft.ops.Anonymize.kAnonymize(
          Tables.documents(s, dir), Seq("lang", "source"), k = 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),


    // rare-value generalization: sources with < 8 docs fold into 'other';
    // released as the per-source histogram (the release-audit view)
    "anonymize_generalize" -> ((s, dir) =>
      graft.ops.Anonymize.generalizeRare(
          Tables.documents(s, dir), "source", k = 8)
        .groupBy("source").agg(count(lit(1)).as("n"))
        .orderBy("source")),


    // temperature-weighted source mixing: drop src0, halve src1, 2x src2,
    // 2.5x src3 (hash-deterministic fractional copies) — pinned VALUES
    // oracle (Spark-side xxhash64; recomputed driver-side in SamplingSpec)
    "source_mix" -> ((s, dir) =>
      graft.ops.Sampling.mixSources(Tables.documents(s, dir), col("source"),
        Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.0, "src3" -> 2.5),
        defaultRate = 1.0, col("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n"))
        .orderBy("source")),


    // Source-mix divergence between the even- and odd-doc_id corpus
    // halves (ops/Stats.distributionDivergence): KL both ways + JS, the
    // mixture-drift read-out beside drift_psi. Two count aggregates, a
    // category-sized join, one row out.
    "mix_divergence" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Stats.distributionDivergence(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "source")
    }),


    // Largest-remainder budget apportionment: per-source token weights →
    // EXACT integer allocations summing to the 100k budget (each source
    // within 1 of its real quota — the Hamilton guarantee). All-integer
    // div/mod arithmetic, so the full SQL oracle is bit-exact; the
    // remainder-rank window spans #sources rows, never the corpus.
    "mix_allocation" -> ((s, dir) => {
      val perSource = Tables.documents(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("bigint").as("__t"))
        .groupBy("source").agg(sum("__t").as("n_tokens"))
      graft.ops.Sampling.allocateBudget(perSource, col("source"), col("n_tokens"),
          budget = 100000L)
        .withColumnRenamed("stratum", "source")
        .withColumnRenamed("weight", "n_tokens")
        .orderBy("source")
    }),


    // DoReMi-style domain reweighting (Sampling.domainReweight — the
    // published recipe's exponentiated-gradient loop on the domain
    // simplex against per-domain EXCESS loss over the mixture baseline,
    // uniform-smoothed; public method, Xie et al. 2023). The loss signal
    // is the repo's unigram-NLL quality score per source (one corpus
    // pass + one domain aggregate); the 20-step loop runs on the
    // domain-sized collected vector (the attribution_markov convention)
    // and the oracle unrolls the SAME 20 steps as a recursive CTE over
    // the same per-domain aggregates.
    "mix_doremi" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val nll = graft.ops.TextAnalysis.nllScore(docs, "doc_id", "text",
        graft.ops.TextAnalysis.unigramModel(docs, "text"))
      val perDomain = docs.select(col("doc_id"), col("source"))
        .join(nll, "doc_id")
        .groupBy(col("source").as("domain"))
        .agg(count(lit(1)).as("n_docs"), round(avg("nll"), 6).as("loss"))
      graft.ops.Sampling.domainReweight(perDomain,
          steps = 20, eta = 1.0, smoothing = 0.01)
        .withColumnRenamed("domain", "source")
        .orderBy("source")
    }),


    // The DoReMi mixture MATERIALIZED: domainReweight's upsample factors
    // feed the same epoch expansion mix_epochs uses (floor(f) full copies
    // + md5-thresholded fractional copy per doc) — "train on this
    // mixture" as data, not just weights. Reported as per-(source, epoch)
    // counts; the oracle composes the doremi recursive CTE with the
    // mix_epochs expansion on the shared 6-dp factors.
    "mix_doremi_epochs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val nll = graft.ops.TextAnalysis.nllScore(docs, "doc_id", "text",
        graft.ops.TextAnalysis.unigramModel(docs, "text"))
      val perDomain = docs.select(col("doc_id"), col("source"))
        .join(nll, "doc_id")
        .groupBy(col("source").as("domain"))
        .agg(count(lit(1)).as("n_docs"), round(avg("nll"), 6).as("loss"))
      val w = graft.ops.Sampling.domainReweight(perDomain,
          steps = 20, eta = 1.0, smoothing = 0.01)
        .withColumnRenamed("domain", "source")
      graft.ops.Sampling.mixEpochs(
          docs.join(broadcast(w.select(col("source"), col("upsample_factor"))),
            "source"),
          "doc_id", col("source"), col("upsample_factor"), seed = "doremi0")
        .groupBy("source", "epoch").agg(count(lit(1)).as("n"))
        .orderBy("source", "epoch")
    }),


    // Temperature-flattened mixture weights (p_i ∝ n_i^τ, τ=0.7) over
    // per-source char mass — one source-keyed aggregate + broadcast
    // totals, never corpus-wide state
    "mix_temperature_weights" -> ((s, dir) =>
      graft.ops.Sampling.temperatureWeights(
          Tables.documents(s, dir), col("source"), col("n_chars"), tau = 0.7)
        .select(col("source"), col("n_size").cast("bigint").as("n_size"),
          round(col("p_natural"), 6).as("p_natural"),
          round(col("p_temperature"), 6).as("p_temperature"),
          round(col("upsample_factor"), 6).as("upsample_factor"))
        .orderBy("source")),


    // temperature weights MATERIALIZED: τ=0.5 factors → epoch-expanded
    // corpus (floor(f) full copies + md5-thresholded fractional copy, so
    // big sources downsample and small ones upsample deterministically);
    // reported as per-(source, epoch) counts. Pure map-side explode.
    "mix_epochs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = graft.ops.Sampling.temperatureWeights(
        docs, col("source"), col("n_chars"), tau = 0.5)
      graft.ops.Sampling.mixEpochs(
          docs.join(broadcast(w.select(col("source"), col("upsample_factor"))),
            "source"),
          "doc_id", col("source"), col("upsample_factor"), seed = "mix0")
        .groupBy("source", "epoch").agg(count(lit(1)).as("n"))
        .orderBy("source", "epoch")
    }),


    // RefinedWeb-style per-source doc cap: keep the 10 lowest-id docs per
    // source (SQL-recomputable order; hashWeight gives the unbiased form)
    // — rank via the bucketed two-level prefix sum: no window partition
    // wider than one range bucket, so a giant source caps in parallel
    "cap_per_stratum" -> ((s, dir) =>
      graft.ops.Sampling.capPerStratum(
          Tables.documents(s, dir).select("doc_id", "source"),
          col("source"), k = 10, col("doc_id"))
        .orderBy("doc_id")),
  )

  val oracles: Map[String, String] = Map(

    "anonymize_ldiversity" ->
      ("WITH rel AS (SELECT lang, source, n_chars FROM (" +
        "SELECT d.*, count(*) OVER (PARTITION BY lang, source) AS gn FROM documents d) t " +
        "WHERE gn >= 5) " +
        "SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(DISTINCT CAST(n_chars % 16 AS INTEGER)) AS BIGINT) AS n_sensitive " +
        "FROM rel GROUP BY lang, source ORDER BY lang, source"),


    // replays the deterministic Laplace simulation bit-for-bit: u from
    // the 32-bit md5 prefix of 'dp0:<group>' (hex parsed via the 0x
    // cast), inverse CDF −b·sign(u−½)·ln(1−2|u−½|) with b = 1/ε = 2
    "dp_counts" ->
      ("WITH g AS (SELECT event_type, count(*) AS n, " +
        "(CAST('0x' || substr(md5('dp0:' || event_type), 1, 8) AS BIGINT) + 0.5) " +
        "/ 4294967296.0 AS u FROM events GROUP BY event_type) " +
        "SELECT event_type, round(n + (-2.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4) " +
        "AS n_noisy, CAST(0.5 AS DOUBLE) AS epsilon, round(2.0 * ln(20), 4) AS err95 " +
        "FROM g ORDER BY event_type"),


    // the dp_counts replay once per scheduled release (per-release seed
    // and b = 1/ε), tagged with the running Σε of sequential composition
    "dp_ledger" ->
      (Seq(("r1_mon", "dpa", 0.5, 0.5), ("r2_tue", "dpb", 0.5, 1.0),
          ("r3_weekly", "dpc", 1.0, 2.0)).map { case (id, seed, eps, cum) =>
        val b = 1.0 / eps
        s"SELECT '$id' AS release_id, event_type, " +
          s"round(n + (-$b) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4) AS n_noisy, " +
          s"CAST($eps AS DOUBLE) AS epsilon, round($b * ln(20), 4) AS err95, " +
          s"round(CAST($cum AS DOUBLE), 4) AS eps_cumulative " +
          s"FROM (SELECT event_type, count(*) AS n, " +
          s"(CAST('0x' || substr(md5('$seed:' || event_type), 1, 8) AS BIGINT) + 0.5) " +
          s"/ 4294967296.0 AS u FROM events GROUP BY event_type) g"
      }.mkString("", " UNION ALL ", " ORDER BY release_id, event_type")),


    // clamped sum (sensitivity 100, b = 100) + two-query mean (sum and
    // count legs each on ε/2 → b = 200 and 2, sub-seeds :sum / :cnt)
    "dp_sum_mean" ->
      ("WITH lap AS (SELECT event_type, " +
        "sum(greatest(0.0, least(100.0, value))) AS s, count(*) AS n, " +
        "(CAST('0x' || substr(md5('dps:' || event_type), 1, 8) AS BIGINT) + 0.5) / 4294967296.0 AS us, " +
        "(CAST('0x' || substr(md5('dpm:sum:' || event_type), 1, 8) AS BIGINT) + 0.5) / 4294967296.0 AS ums, " +
        "(CAST('0x' || substr(md5('dpm:cnt:' || event_type), 1, 8) AS BIGINT) + 0.5) / 4294967296.0 AS umc " +
        "FROM events GROUP BY event_type), " +
        "r AS (SELECT event_type, " +
        "round(s + (-100.0) * sign(us - 0.5) * ln(1 - 2 * abs(us - 0.5)), 4) AS sum_noisy, " +
        "s + (-200.0) * sign(ums - 0.5) * ln(1 - 2 * abs(ums - 0.5)) AS msn, " +
        "n + (-2.0) * sign(umc - 0.5) * ln(1 - 2 * abs(umc - 0.5)) AS mnn " +
        "FROM lap) " +
        "SELECT event_type, sum_noisy, CAST(1.0 AS DOUBLE) AS epsilon, " +
        "round(100.0 * ln(20), 4) AS err95, " +
        "round(msn / greatest(mnn, 1.0), 4) AS mean_noisy, round(mnn, 4) AS n_noisy " +
        "FROM r ORDER BY event_type"),


    "mix_interleave" ->
      ("WITH r AS (SELECT doc_id, source, CAST(row_number() OVER (" +
        "PARTITION BY source ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS DOUBLE) AS rk " +
        "FROM documents), " +
        "k AS (SELECT doc_id, source, (rk - 0.5) / " +
        "(CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 0.5 ELSE 1.0 END) AS sk FROM r) " +
        "SELECT doc_id, source, CAST(row_number() OVER (ORDER BY sk, source, doc_id) - 1 AS BIGINT) AS pos " +
        "FROM k ORDER BY pos"),


    // same pipeline with the count-derived modulus (max(16, ceil(n/512)))
    "negative_sample_auto" ->
      ("WITH nb AS (SELECT GREATEST(16, CAST(ceil(count(*) / 512.0) AS BIGINT)) AS m FROM embeddings), " +
        "cand AS (SELECT vec_id AS neg_id, label AS neg_label, " +
        "(vec_id * 2654435761) % nb.m AS b FROM embeddings, nb), " +
        "anch AS (SELECT vec_id AS anchor_id, label AS anchor_label, " +
        "(vec_id * 2654435761 + 1) % nb.m AS b FROM embeddings, nb), " +
        "ranked AS (SELECT anchor_id, anchor_label, neg_id, neg_label, " +
        "CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY " +
        "md5('neg:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(neg_id AS VARCHAR)), neg_id) AS INT) AS neg_rank " +
        "FROM anch JOIN cand USING (b) " +
        "WHERE neg_label <> anchor_label AND neg_id <> anchor_id) " +
        "SELECT anchor_id, anchor_label, neg_rank, neg_id, neg_label " +
        "FROM ranked WHERE neg_rank <= 4 ORDER BY anchor_id, neg_rank"),

    "negative_sample" ->
      ("WITH cand AS (SELECT vec_id AS neg_id, label AS neg_label, " +
        "(vec_id * 2654435761) % 16 AS b FROM embeddings), " +
        "anch AS (SELECT vec_id AS anchor_id, label AS anchor_label, " +
        "(vec_id * 2654435761 + 1) % 16 AS b FROM embeddings), " +
        "ranked AS (SELECT anchor_id, anchor_label, neg_id, neg_label, " +
        "CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY " +
        "md5('neg:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(neg_id AS VARCHAR)), neg_id) AS INT) AS neg_rank " +
        "FROM anch JOIN cand USING (b) " +
        "WHERE neg_label <> anchor_label AND neg_id <> anchor_id) " +
        "SELECT anchor_id, anchor_label, neg_rank, neg_id, neg_label " +
        "FROM ranked WHERE neg_rank <= 4 ORDER BY anchor_id, neg_rank"),


    "anonymize_k" ->
      ("SELECT doc_id, lang, source FROM documents " +
        "WHERE (lang, source) IN (SELECT (lang, source) FROM documents " +
        "GROUP BY lang, source HAVING count(*) >= 5) ORDER BY doc_id"),


    "anonymize_generalize" ->
      ("WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1) " +
        "SELECT CASE WHEN n < 8 THEN 'other' ELSE source END AS source, " +
        "CAST(sum(n) AS BIGINT) AS n FROM c GROUP BY 1 ORDER BY source"),


    // unrolls the SAME 20 exponentiated-gradient steps the Spark loop
    // runs, as a recursive CTE over the identical per-domain aggregates
    // (per-doc nll 4dp → per-domain loss 6dp → weights 12dp per step —
    // the rounding ladder that makes both sides agree at the output's
    // 6dp regardless of FP summation order). The recursive term GROUPs
    // over the recursive reference crossed with the static domain table
    // (the attribution_markov pattern); the base CASTs w to DOUBLE (the
    // DECIMAL-typing trap).
    "mix_doremi" ->
      ("WITH RECURSIVE tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token), " +
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq), " +
        "docnll AS (SELECT doc_id, round(avg(-ln(c / n)), 4) AS nll " +
        "FROM tok JOIN freq USING (token), tot GROUP BY doc_id), " +
        "dl AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, round(avg(x.nll), 6) AS loss " +
        "FROM documents d JOIN docnll x USING (doc_id) GROUP BY d.source), " +
        "td AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS t, CAST(count(*) AS BIGINT) AS k FROM dl), " +
        "it AS (SELECT 0 AS stp, source, round(CAST(n_docs AS DOUBLE) / (SELECT t FROM td), 12) AS w FROM dl " +
        "UNION ALL " +
        "SELECT i.stp + 1, d.source, " +
        "round(sum(CASE WHEN i.source = d.source THEN i.w END) * " +
        "exp(1.0 * greatest(0.0, d.loss - round(sum(i.w * li.loss) / sum(i.w), 12))), 12) " +
        "FROM it i JOIN dl li ON li.source = i.source CROSS JOIN dl d " +
        "WHERE i.stp < 20 GROUP BY i.stp, d.source, d.loss), " +
        "fin AS (SELECT source, w FROM it WHERE stp = 20), " +
        "sw AS (SELECT sum(w) AS s FROM fin) " +
        "SELECT dl.source, dl.n_docs, dl.loss, " +
        "round(CAST(dl.n_docs AS DOUBLE) / (SELECT t FROM td), 6) AS p_natural, " +
        "round(0.99 * f.w / (SELECT s FROM sw) + 0.01 / (SELECT k FROM td), 6) AS alpha, " +
        "round((0.99 * f.w / (SELECT s FROM sw) + 0.01 / (SELECT k FROM td)) / " +
        "(CAST(dl.n_docs AS DOUBLE) / (SELECT t FROM td)), 6) AS upsample_factor " +
        "FROM dl JOIN fin f USING (source) ORDER BY source"),


    // the doremi CTE chain (same 20 unrolled steps) feeding the
    // mix_epochs expansion on the shared 6-dp upsample factors
    "mix_doremi_epochs" ->
      ("WITH RECURSIVE tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token), " +
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq), " +
        "docnll AS (SELECT doc_id, round(avg(-ln(c / n)), 4) AS nll " +
        "FROM tok JOIN freq USING (token), tot GROUP BY doc_id), " +
        "dl AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, round(avg(x.nll), 6) AS loss " +
        "FROM documents d JOIN docnll x USING (doc_id) GROUP BY d.source), " +
        "td AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS t, CAST(count(*) AS BIGINT) AS k FROM dl), " +
        "it AS (SELECT 0 AS stp, source, round(CAST(n_docs AS DOUBLE) / (SELECT t FROM td), 12) AS w FROM dl " +
        "UNION ALL " +
        "SELECT i.stp + 1, d.source, " +
        "round(sum(CASE WHEN i.source = d.source THEN i.w END) * " +
        "exp(1.0 * greatest(0.0, d.loss - round(sum(i.w * li.loss) / sum(i.w), 12))), 12) " +
        "FROM it i JOIN dl li ON li.source = i.source CROSS JOIN dl d " +
        "WHERE i.stp < 20 GROUP BY i.stp, d.source, d.loss), " +
        "fin AS (SELECT source, w FROM it WHERE stp = 20), " +
        "sw AS (SELECT sum(w) AS s FROM fin), " +
        "wf AS (SELECT dl.source, " +
        "round((0.99 * fw.w / (SELECT s FROM sw) + 0.01 / (SELECT k FROM td)) / " +
        "(CAST(dl.n_docs AS DOUBLE) / (SELECT t FROM td)), 6) AS f " +
        "FROM dl JOIN fin fw USING (source)), " +
        "j AS (SELECT d.doc_id, d.source, wf.f FROM documents d JOIN wf USING (source)), " +
        "e AS (SELECT doc_id, source, f, unnest(range(CAST(floor(f) AS BIGINT) + 1)) AS epoch FROM j), " +
        "k2 AS (SELECT * FROM e WHERE epoch < CAST(floor(f) AS BIGINT) " +
        "OR substr(md5('doremi0:' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "lpad(lower(to_hex(CAST(floor((f - floor(f)) * 4294967296) AS BIGINT))), 8, '0')) " +
        "SELECT source, CAST(epoch AS BIGINT) AS epoch, CAST(count(*) AS BIGINT) AS n " +
        "FROM k2 GROUP BY 1, 2 ORDER BY 1, 2"),


    "mix_epochs" ->
      ("WITH per AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS n FROM documents GROUP BY 1), " +
        "tot AS (SELECT sum(n) AS tn, sum(pow(n, 0.5)) AS tt FROM per), " +
        "w AS (SELECT source, (pow(n, 0.5) / tt) / (n / tn) AS f FROM per, tot), " +
        "j AS (SELECT d.doc_id, d.source, w.f FROM documents d JOIN w USING (source)), " +
        "e AS (SELECT doc_id, source, f, unnest(range(CAST(floor(f) AS BIGINT) + 1)) AS epoch FROM j), " +
        "k AS (SELECT * FROM e WHERE epoch < CAST(floor(f) AS BIGINT) " +
        "OR substr(md5('mix0:' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "lpad(lower(to_hex(CAST(floor((f - floor(f)) * 4294967296) AS BIGINT))), 8, '0')) " +
        "SELECT source, CAST(epoch AS BIGINT) AS epoch, CAST(count(*) AS BIGINT) AS n " +
        "FROM k GROUP BY 1, 2 ORDER BY 1, 2"),


    "shuffle_order" ->
      ("SELECT doc_id, CAST(row_number() OVER (ORDER BY " +
        "md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos " +
        "FROM documents ORDER BY pos"),


    // full replay of the group-keyed assignment: the 32-bit md5 prefix of
    // 'split0:<user>' against floor(0.25·2³²) = 1073741824, the leak
    // audit (groups seen in both splits — 0 by construction since the
    // hash keys ONLY the group), and the per-split rollup
    "grouped_split" ->
      ("WITH s AS (SELECT user_id, CASE WHEN " +
        "CAST('0x' || substr(md5('split0:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) " +
        "< 1073741824 THEN 'test' ELSE 'train' END AS split FROM events), " +
        "leak AS (SELECT CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaked_groups " +
        "FROM (SELECT user_id, count(DISTINCT split) AS k FROM s GROUP BY 1) z) " +
        "SELECT split, count(*) AS n_rows, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_groups, leaked_groups " +
        "FROM s, leak GROUP BY split, leaked_groups ORDER BY split"),


    "exact_stratified_split" ->
      ("WITH r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source " +
        "ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk, " +
        "count(*) OVER (PARTITION BY source) AS n FROM documents) " +
        "SELECT doc_id, source, CASE WHEN rk <= CAST(round(n * 0.25) AS BIGINT) " +
        "THEN 'test' ELSE 'train' END AS split FROM r ORDER BY doc_id"),


    // full replay: NLL difficulty, percentile cuts (4-dp on both sides —
    // Spark `percentile` ≡ DuckDB `quantile_cont`), strictly-below tier
    // count, md5 in-tier shuffle, global row_number position
    "curriculum_order" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token), " +
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq), " +
        "sc AS (SELECT doc_id, round(avg(-ln(c / n)), 4) AS nll " +
        "FROM tok JOIN freq USING (token), tot GROUP BY doc_id), " +
        "cuts AS (SELECT list_transform(quantile_cont(nll, [0.25, 0.5, 0.75]), " +
        "c -> round(c, 4)) AS qs FROM sc), " +
        "t AS (SELECT doc_id, nll, CAST(len(list_filter(qs, c -> nll > c)) AS INT) AS tier " +
        "FROM sc, cuts) " +
        "SELECT doc_id, nll, tier, CAST(row_number() OVER (ORDER BY tier, " +
        "md5('cur:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos " +
        "FROM t ORDER BY pos"),


    "source_token_budget" ->
      ("SELECT doc_id, source, tokens, cum_tokens FROM (" +
        "SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens, " +
        "CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_tokens " +
        "FROM documents) t WHERE cum_tokens <= 800 ORDER BY doc_id"),


    "mix_temperature_weights" ->
      ("WITH per AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS n_size FROM documents GROUP BY source), " +
        "tot AS (SELECT sum(n_size) AS tn, sum(pow(n_size, 0.7)) AS tt FROM per) " +
        "SELECT source, CAST(n_size AS BIGINT) AS n_size, " +
        "round(n_size / tn, 6) AS p_natural, " +
        "round(pow(n_size, 0.7) / tt, 6) AS p_temperature, " +
        "round((pow(n_size, 0.7) / tt) / (n_size / tn), 6) AS upsample_factor " +
        "FROM per, tot ORDER BY source"),


    // all-integer div/mod replay of the Hamilton apportionment — no
    // float anywhere, so the compare is bit-exact by construction
    "mix_allocation" ->
      ("WITH wsrc AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens " +
        "FROM documents GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS w FROM wsrc), " +
        "q AS (SELECT source, n_tokens, CAST((100000 * n_tokens) // w AS BIGINT) AS base, " +
        "(100000 * n_tokens) % w AS rem FROM wsrc CROSS JOIN t), " +
        "sp AS (SELECT CAST(sum(base) AS BIGINT) AS spent FROM q), " +
        "r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q) " +
        "SELECT source, n_tokens, " +
        "CAST(base + CASE WHEN rk <= 100000 - spent THEN 1 ELSE 0 END AS BIGINT) AS alloc " +
        "FROM r CROSS JOIN sp ORDER BY source"),


    "cap_per_stratum" ->
      ("SELECT doc_id, source, stratum_rank FROM (" +
        "SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS stratum_rank " +
        "FROM documents) t WHERE stratum_rank <= 10 ORDER BY doc_id"),


    // replays distributionDivergence over the doc_id-parity halves:
    // shares from exact integer counts, eps clamp, natural log
    "mix_divergence" ->
      ("WITH p AS (SELECT source, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS ps " +
        "FROM documents WHERE doc_id % 2 = 0 GROUP BY 1), " +
        "q AS (SELECT source, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS qs " +
        "FROM documents WHERE doc_id % 2 = 1 GROUP BY 1), " +
        "j AS (SELECT greatest(coalesce(ps, 0), 1e-6) AS ps, greatest(coalesce(qs, 0), 1e-6) AS qs " +
        "FROM p FULL OUTER JOIN q USING (source)) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_categories, " +
        "round(sum(ps * ln(ps / qs)), 6) AS kl_pq, " +
        "round(sum(qs * ln(qs / ps)), 6) AS kl_qp, " +
        "round(sum(ps * ln(ps / ((ps + qs) / 2)) / 2 + qs * ln(qs / ((ps + qs) / 2)) / 2), 6) AS js " +
        "FROM j"),
  )
}
