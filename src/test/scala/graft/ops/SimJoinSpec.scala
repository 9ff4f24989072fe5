package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class SimJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  // 1-grams make the shingle set the word set — Jaccards are hand-sized.
  // d1 {a,b,c,d,e}, d2 {a,b,c,d,f}: 4/6 = 0.6667. d3 = d1: 1.0.
  // d4 {x,y,z}: below threshold with everything (d4∩d5 = {x}: 1/4).
  private def crafted = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f"),
      (3L, "a b c d e"),
      (4L, "x y z"),
      (5L, "x q")).toDF("doc_id", "text")
  }

  test("hand-computed pairs at threshold 0.6, nothing else") {
    val got = SimJoin.prefixJaccard(crafted, "doc_id", "text",
        shingleK = 1, threshold = 0.6)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.6667), (1L, 3L, 1.0), (2L, 3L, 0.6667)))
  }

  test("length bound alone cannot admit a sub-threshold pair") {
    // d4/d5 pass no prefix-shingle collision above threshold 0.5:
    // jaccard {x,y,z}/{x,q} = 1/4 — must NOT be emitted even though the
    // sets share a token.
    val got = SimJoin.prefixJaccard(crafted, "doc_id", "text",
        shingleK = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((4L, 5L)))
  }

  // Completeness: the prefix-filtered join must return EXACTLY the
  // brute-force all-pairs result (Dedup.ngramJaccardPairs — the O(n²)
  // anchor) on a corpus of sliding token windows, where pair Jaccard
  // decays smoothly with window distance and many pairs sit right at
  // the threshold boundary.
  test("matches the exhaustive anchor exactly on sliding-window docs") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, (i until i + 12).map(j => s"t${j % 60}").mkString(" "))
    }.toDF("doc_id", "text")

    for (t <- Seq(0.4, 0.6, 0.8)) {
      val fast = SimJoin.prefixJaccard(docs, "doc_id", "text",
        shingleK = 3, threshold = t)
      val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = t)
      assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
        s"prefix-filter result diverged from exhaustive at t=$t")
    }
  }

  test("short texts fall back to the whole-text shingle like the anchor") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "ab"), (3L, "cd ef")).toDF("doc_id", "text")
    val got = SimJoin.prefixJaccard(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("incrementalPairs matches brute bipartite, batch grams unseen by corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus: sliding windows over t0..t59; batch: overlapping windows
    // PLUS docs of entirely new tokens (u*) — the frozen-order df-0 path
    val corpus = (0 until 30).map { i =>
      (i.toLong, (i until i + 12).map(j => s"t${j % 60}").mkString(" "))
    }.toDF("doc_id", "text")
    val batch = ((0 until 10).map { i =>
      (1000L + i, (i * 3 until i * 3 + 12).map(j => s"t${j % 60}").mkString(" "))
    } ++ Seq((2000L, (0 until 12).map(j => s"u$j").mkString(" ")),
             (2001L, ((0 until 6).map(j => s"u$j") ++ (0 until 6).map(j => s"t$j")).mkString(" "))))
      .toDF("doc_id", "text")

    for (t <- Seq(0.4, 0.7)) {
      val got = SimJoin.incrementalPairs(corpus, batch, "doc_id", "text",
        shingleK = 3, threshold = t)
      // brute bipartite reference (test-only cross join)
      val cs = corpus.select(col("doc_id").as("corpus_id"),
        array_sort(array_distinct(Dedup.shingleHashes(col("text"), 3))).as("sc"))
      val bs = batch.select(col("doc_id").as("batch_id"),
        array_sort(array_distinct(Dedup.shingleHashes(col("text"), 3))).as("sb"))
      val brute = bs.crossJoin(cs)
        .withColumn("__i", graft.functions.TextFunctions
          .intersect_count_sorted(col("sb"), col("sc")).cast("double"))
        .withColumn("__j", col("__i") / (size(col("sb")) + size(col("sc")) - col("__i")))
        .filter(col("__j") >= t)
        .select(col("batch_id"), col("corpus_id"), round(col("__j"), 4).as("jaccard"))
      assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
        s"incremental diverged from brute bipartite at t=$t")
    }
  }

  test("incrementalPairs emits no self-side pairs") {
    import spark.implicits._
    val docs = (0 until 10).map { i =>
      (i.toLong, (i until i + 5).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val ids = SimJoin.incrementalPairs(docs, docs, "doc_id", "text",
        shingleK = 1, threshold = 0.9)
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // identical frames on both sides: only identity cross-pairs appear,
    // never a corpus↔corpus or batch↔batch pair with distinct ids beyond
    // what true bipartite similarity dictates
    assert(ids.nonEmpty && ids.forall { case (b, c) => b == c })
  }

  test("threshold domain is validated") {
    intercept[IllegalArgumentException](
      SimJoin.prefixJaccard(crafted, "doc_id", "text", threshold = 0.0))
    intercept[IllegalArgumentException](
      SimJoin.prefixJaccard(crafted, "doc_id", "text", threshold = 1.1))
  }

  test("exact-threshold pair survives fp round-up at the length bound") {
    // 0.28 · 25 = 7.000000000000001 in binary fp (one ulp ABOVE the
    // exact 7): without the BoundEps slack the length bound
    // least(7,25) >= t·greatest rejects this pair and ceil(t·n) = 8
    // shortens the big doc's prefix — both on a pair whose TRUE Jaccard
    // is exactly the threshold. A ⊂ B, |A| = 7, |B| = 25: J = 7/25 = 0.28.
    import spark.implicits._
    val big = (0 until 25).map(i => s"w$i").mkString(" ")
    val small = (0 until 7).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val got = SimJoin.prefixJaccard(docs, "doc_id", "text",
        shingleK = 1, threshold = 0.28)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.28)))
  }

  test("SimJoinIndex round-trip serves exactly incrementalPairs; tighter " +
      "thresholds complete; looser rejected; corpus never re-read at serve") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus goes through PARQUET so the serve plan can be audited for
    // its absence (the index must be the only corpus-derived input)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sjidx").toString
    val corpusPath = s"$tmp/corpus.parquet"
    (0 until 30).map { i =>
      (i.toLong, (i until i + 12).map(j => s"t${j % 60}").mkString(" "))
    }.toDF("doc_id", "text").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch = ((0 until 10).map { i =>
      (1000L + i, (i * 3 until i * 3 + 12).map(j => s"t${j % 60}").mkString(" "))
    } ++ Seq((2000L, (0 until 12).map(j => s"u$j").mkString(" ")),
             (2001L, ((0 until 6).map(j => s"u$j") ++ (0 until 6).map(j => s"t$j")).mkString(" "))))
      .toDF("doc_id", "text")
    SimJoinIndex.write(
      SimJoinIndex.build(corpus, "doc_id", "text", shingleK = 3, threshold = 0.4),
      s"$tmp/index")
    val idx = SimJoinIndex.read(spark, s"$tmp/index")
    assert(idx.shingleK == 3 && idx.threshold == 0.4)
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // build-threshold serve == the per-run incremental computation
    val served = SimJoinIndex.pairs(idx, batch, "doc_id", "text")
    assert(pairsOf(served) == pairsOf(
      SimJoin.incrementalPairs(corpus, batch, "doc_id", "text",
        shingleK = 3, threshold = 0.4)))
    // tighter threshold stays complete off the same stored prefixes
    assert(pairsOf(SimJoinIndex.pairs(idx, batch, "doc_id", "text", threshold = 0.7)) ==
      pairsOf(SimJoin.incrementalPairs(corpus, batch, "doc_id", "text",
        shingleK = 3, threshold = 0.7)))
    // looser than built = incomplete prefixes -> loud rejection
    intercept[IllegalArgumentException](
      SimJoinIndex.pairs(idx, batch, "doc_id", "text", threshold = 0.3))
    // PLAN AUDIT: the serve plan reads the index dirs, never the corpus
    // source — the whole point of persisting the prefix state
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("corpus.parquet"),
      "serve plan re-read the corpus source")
    assert(plan.contains("prefixes"), "serve plan must probe the stored postings")
    // APPEND under the frozen order is exact: the maintained index
    // serves the full-corpus pair set
    val firstHalf = corpus.filter(col("doc_id") < 15)
    val appended = SimJoinIndex.append(
      SimJoinIndex.build(firstHalf, "doc_id", "text",
        shingleK = 3, threshold = 0.4),
      corpus.filter(col("doc_id") >= 15), "doc_id", "text")
    assert(pairsOf(SimJoinIndex.pairs(appended, batch, "doc_id", "text")) ==
      pairsOf(served))
    // ERASE is exact: the erased index serves the rebuild WITHOUT the
    // victims, and its plan touches only index frames + the batch
    val victims = corpus.filter(col("doc_id") % 4 === 1).select("doc_id")
    val erasedServe = SimJoinIndex.pairs(
      SimJoinIndex.erase(idx, victims), batch, "doc_id", "text")
    assert(pairsOf(erasedServe) == pairsOf(
      SimJoin.incrementalPairs(corpus.filter(col("doc_id") % 4 =!= 1), batch,
        "doc_id", "text", shingleK = 3, threshold = 0.4)))
    intercept[IllegalArgumentException](
      SimJoinIndex.erase(idx, victims.withColumn("extra", col("doc_id"))))
  }

  test("pairsCapped: generous cap serves the identical pair set; tight cap " +
      "keeps at most N verified candidates per doc; audit arithmetic holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = (0 until 40).map { i =>
      (i.toLong, (i until i + 10).map(j => s"w${j % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val batch = (0 until 12).map { i =>
      (900L + i, (i * 2 until i * 2 + 10).map(j => s"w${j % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val idx = SimJoinIndex.build(corpus, "doc_id", "text",
      shingleK = 2, threshold = 0.3)
    def setOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = setOf(SimJoinIndex.pairs(idx, batch, "doc_id", "text"))
    assert(full.nonEmpty)
    // a cap at the corpus size cannot drop anything
    assert(setOf(SimJoinIndex.pairsCapped(idx, batch, "doc_id", "text",
      maxCandidatesPerDoc = 40)) == full)
    // a tight cap serves a SUBSET with at most N pairs per batch doc
    val capped = setOf(SimJoinIndex.pairsCapped(idx, batch, "doc_id", "text",
      maxCandidatesPerDoc = 1))
    assert(capped.subsetOf(full))
    assert(capped.groupBy(_._1).forall(_._2.size <= 1))
    // the audit's arithmetic matches the two serves it compares
    val a = SimJoinIndex.cappedLossAudit(idx, batch, "doc_id", "text",
      maxCandidatesPerDoc = 1).head()
    assert(a.getLong(0) == full.size && a.getLong(1) == capped.size)
    assert(a.getLong(2) == full.size - capped.size)
    intercept[IllegalArgumentException](
      SimJoinIndex.pairsCapped(idx, batch, "doc_id", "text", 0))
  }

  test("pairsBudgeted: generous posting budget serves the identical pair " +
      "set; tight budget serves a subset; audit arithmetic holds") {
    import spark.implicits._
    val corpus = (0 until 40).map { i =>
      (i.toLong, (i until i + 10).map(j => s"w${j % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val batch = (0 until 12).map { i =>
      (900L + i, (i * 2 until i * 2 + 10).map(j => s"w${j % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val idx = SimJoinIndex.build(corpus, "doc_id", "text",
      shingleK = 2, threshold = 0.3)
    def setOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = setOf(SimJoinIndex.pairs(idx, batch, "doc_id", "text"))
    assert(full.nonEmpty)
    // budgets at/above corpus size cannot drop anything
    assert(setOf(SimJoinIndex.pairsBudgeted(idx, batch, "doc_id", "text",
      maxPostingsPerShingle = 40, maxCandidatesPerDoc = 40)) == full)
    // a tight posting budget serves a SUBSET (candidate generation can
    // only lose rows relative to the unbudgeted probe) with the verify
    // cap still bounding pairs per batch doc
    val budgeted = setOf(SimJoinIndex.pairsBudgeted(idx, batch, "doc_id",
      "text", maxPostingsPerShingle = 1, maxCandidatesPerDoc = 2))
    assert(budgeted.subsetOf(full))
    assert(budgeted.groupBy(_._1).forall(_._2.size <= 2))
    // audit arithmetic matches the two serves it compares
    val a = SimJoinIndex.probeBudgetLossAudit(idx, batch, "doc_id", "text",
      maxPostingsPerShingle = 1, maxCandidatesPerDoc = 2).head()
    assert(a.getLong(0) == full.size && a.getLong(1) == budgeted.size)
    assert(a.getLong(2) == full.size - budgeted.size)
    intercept[IllegalArgumentException](
      SimJoinIndex.pairsBudgeted(idx, batch, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](
      SimJoinIndex.pairsBudgeted(idx, batch, "doc_id", "text", 1, 0))
  }

  test("pruneAudit measures frozen-order decay; rebuildFromSets re-freezes " +
      "without changing the pair set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // a SKEWED first slice freezes a rarity order the grown corpus
    // disagrees with: slice A repeats tokens the full corpus makes common
    val sliceA = (0 until 8).map { i =>
      (i.toLong, (0 until 12).map(j => s"c${(i + j) % 14}").mkString(" "))
    }.toDF("doc_id", "text")
    val sliceB = (100 until 160).map { i =>
      (i.toLong, (i until i + 12).map(j => s"c${j % 14} x${j % 97}").mkString(" "))
    }.toDF("doc_id", "text")
    val frozen = SimJoinIndex.append(
      SimJoinIndex.build(sliceA, "doc_id", "text", shingleK = 3, threshold = 0.4),
      sliceB, "doc_id", "text")
    val batch = (0 until 20).map { i =>
      (5000L + i, (i * 2 until i * 2 + 12).map(j => s"c${j % 14} x${j % 97}").mkString(" "))
    }.toDF("doc_id", "text")
    val audit = SimJoinIndex.pruneAudit(frozen, batch, "doc_id", "text").head()
    val (nFro, nFre, ratio, nPairs) =
      (audit.getLong(0), audit.getLong(1), audit.getDouble(2), audit.getLong(3))
    // candidates are a superset of true pairs under EITHER order, and the
    // ratio is the two counts' quotient
    assert(nFro >= nPairs && nFre >= nPairs)
    assert(math.abs(ratio - nFro.toDouble / math.max(nFre, 1L)) < 1e-3)
    // the fresh order must prune at least as well as the drifted frozen
    // one on this fixture (that decay is what the audit measures)
    assert(nFro >= nFre, s"frozen $nFro vs fresh $nFre")
    // re-freeze: identical pair set, and its OWN candidates equal the
    // audit's fresh count (rebuildFromSets IS the fresh order)
    val refrozen = SimJoinIndex.rebuildFromSets(frozen)
    assert(pairsOf(SimJoinIndex.pairs(refrozen, batch, "doc_id", "text")) ==
      pairsOf(SimJoinIndex.pairs(frozen, batch, "doc_id", "text")),
      "re-freezing must never change the served pair set")
    val auditRe = SimJoinIndex.pruneAudit(refrozen, batch, "doc_id", "text").head()
    assert(auditRe.getLong(0) == nFre,
      "the re-frozen index's frozen-order candidates must equal the fresh count")
  }
}
