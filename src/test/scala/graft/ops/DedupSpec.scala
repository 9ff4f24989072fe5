package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class DedupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, GraftSpark.Sf0001)

  test("exact: keeps the min-id row per duplicate key") {
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y")).toDF("id", "t")
    val out = Dedup.exact(df, Seq("t"), "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("shingles: k-grams over tokens; short docs yield whole text") {
    val df = Seq(("a b c d", 1), ("a b", 2)).toDF("t", "id")
    val out = df.select(Dedup.shingles(col("t"), 3).as("s")).orderBy(lit(1)).collect()
    val all = df.orderBy("id").select(Dedup.shingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(all(0) == Seq("a b c", "b c d"))
    assert(all(1) == Seq("a b"))
  }

  test("minhashLsh finds all exact-duplicate injected pairs with jaccard 1.0") {
    val dups = docs.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val out = Dedup.minhashLsh(docs.unionByName(dups), "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.8)
    val found = out.filter(col("id_b") - col("id_a") === 1000000L && col("jaccard") === 1.0)
    assert(found.count() == 20)
  }

  test("minhashLsh recall matches brute-force ngram jaccard on fixture docs") {
    val slice = docs.filter(col("doc_id") < 200)
    val brute = Dedup.ngramJaccardPairs(slice, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(slice, "doc_id", "text",
      bands = 16, rowsPerBand = 4, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute) // precision exact by construction; recall must hold here
  }

  test("minhashLshIncremental: batch-vs-corpus pairs only, matches brute-force cross Jaccard") {
    val batch = docs.filter(col("doc_id").between(100, 149))
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val got = Dedup.minhashLshIncremental(docs, batch, "doc_id", "text",
      bands = 8, rowsPerBand = 2, threshold = 0.8)
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair crosses the batch/corpus boundary
    assert(got.forall { case (b, c) => b >= 1000000L && c < 1000000L })
    // brute-force cross oracle: batch × corpus exact Jaccard
    val brute = Dedup.ngramJaccardPairs(docs.unionByName(batch), "doc_id", "text",
        threshold = 0.8)
      .filter(col("id_b") >= 1000000L && col("id_a") < 1000000L)
      .select("id_b", "id_a").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.exists { case (b, c) => b - 1000000L == c }) // re-crawled copies found
  }

  test("simhash: identical docs have identical fingerprints; hamming 0") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence with many other words")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("ngramJaccardPairs blockBy restricts pairs to equal blocks") {
    val df = Seq(
      (1L, "a b c d e", "en"), (2L, "a b c d e", "en"),
      (3L, "a b c d e", "es")).toDF("doc_id", "text", "lang")
    val blocked = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      threshold = 0.9, blockBy = Some("lang")).collect()
    // 1-2 same block and identical; 1-3/2-3 cross-block: excluded
    assert(blocked.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val unblocked = Dedup.ngramJaccardPairs(df, "doc_id", "text", threshold = 0.9)
    assert(unblocked.count() == 3)
  }

  test("removeNearDuplicates drops greater pair members, keeps the rest") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, 1.0)).toDF("id_a", "id_b", "jaccard")
    val out = Dedup.removeNearDuplicates(df, pairs, "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("native SimHash64 matches the HOF reference formulation bit-for-bit") {
    val sample = docs.limit(200)
    val native = sample.select(Dedup.simhash64("text")).collect().map(_.getLong(0))
    val hof = sample.select(Dedup.simhash64Hof("text")).collect().map(_.getLong(0))
    assert(native.toSeq == hof.toSeq)
  }

  test("simhash: near-identical docs within small hamming distance") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val variant = base.replace("tok30", "changed")
    val df = Seq((1L, base), (2L, variant)).toDF("doc_id", "text")
    val fps = df.select(Dedup.simhash64("text")).collect().map(_.getLong(0))
    val dist = java.lang.Long.bitCount(fps(0) ^ fps(1))
    assert(dist <= 16, s"hamming $dist too large for near-identical docs")
  }

  test("embeddingCosinePairs banded LSH matches the all-pairs baseline (recall)") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val dups = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
      // perturb one dim so the duplicate is NEAR-identical, not identical —
      // full-signature matching (the round-1 form) misses these
      .withColumn("embedding",
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.05f)).otherwise(x)))
    val aug = emb.unionByName(dups)
    val exact = Dedup.embeddingCosinePairs(aug, "vec_id", "embedding", threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.count { case (a, b) => b - a == 1000000L } == 10,
      "fixture assumption broken: perturbed dups should stay >= 0.95 cosine")
    val banded = Dedup.embeddingCosinePairs(aug, "vec_id", "embedding", threshold = 0.95,
      lshPlanes = 4, lshBands = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact,
      s"banded LSH missed ${(exact -- banded).size} true pairs / false ${(banded -- exact).size}")
  }

  test("minhashLsh maxBucket cap prevents degenerate-bucket pair explosion") {
    // 200 identical docs: every band bucket holds all 200 ids (19,900 pairs)
    val degenerate = spark.range(200)
      .select(col("id").as("doc_id"), lit("same text every single time here").as("text"))
    val capped = Dedup.minhashLsh(degenerate, "doc_id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.8, maxBucket = 100)
    assert(capped.count() == 0, "oversized buckets must be dropped, not exploded")
    // and the audit query surfaces exactly what was dropped
    val audit = Dedup.oversizedBuckets(degenerate, "doc_id", "text",
      bands = 4, rowsPerBand = 2, maxBucket = 100).collect()
    assert(audit.nonEmpty && audit.forall(_.getAs[Long]("n_ids") == 200L))
    // default is finite
    assert(Dedup.DefaultMaxBucket < Int.MaxValue)
  }

  test("connectedComponents: chain needs multiple propagation rounds, star and singleton pairs resolve") {
    // chain 1-2-3-4-5-6 (diameter 5 exercises the iteration), star 10-{11,12,13}, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(comps(_) == 10L))
    assert(comps(20L) == 20L && comps(21L) == 20L)
    assert(comps.size == 12)
  }

  test("connectedComponentsIncremental equals from-scratch on the merged pair set") {
    // old graph {1-2, 3-4} → labels {1→1, 2→1, 3→3, 4→3}; a new batch
    // pair 2-3 bridges the two old components, 5-6 is brand new
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(oldPairs)
    val newPairs = Seq((2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val inc = Dedup.connectedComponentsIncremental(labels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Dedup.connectedComponents(
        oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == scratch, "label-carried merge must equal the from-scratch components")
    assert((1L to 4L).forall(inc(_) == 1L), "the bridge merges both old components to min id 1")
    assert(inc(5L) == 5L && inc(6L) == 5L)
  }

  test("connectedComponentsIncremental with no new pairs reproduces the old labels") {
    val oldPairs = Seq((7L, 8L), (8L, 9L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(oldPairs)
    val inc = Dedup.connectedComponentsIncremental(labels,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("connectedComponents keeps native id types (string corpora) and fails loudly on non-convergence") {
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"))
    // a 4-hop chain cannot converge in 1 round — must throw, not mislabel
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 1)
    }
  }

  test("removeNearDuplicatesCC keeps one representative per cluster where greedy keeps several") {
    // a~c, b~c: one transitive cluster {1,2,3}
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z"), (9L, "solo")).toDF("doc_id", "t")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val greedy = Dedup.removeNearDuplicates(df, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val cc = Dedup.removeNearDuplicatesCC(df, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(greedy.toSeq == Seq(1L, 2L, 9L)) // greedy keeps both 1 and 2
    assert(cc.toSeq == Seq(1L, 9L))         // CC keeps exactly min(cluster)
  }

  test("canonicalByQuality keeps the best-scoring member per cluster, min-id on ties") {
    // cluster {1,2,3} via a~c, b~c; scores: 2 wins on quality; 4,5 tie → min id 4
    val df = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.7), (5L, 0.7), (9L, 0.1))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 3L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalByQuality(df, pairs, "doc_id", col("q"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((2L, 3L, 0.9), (4L, 2L, 0.7), (9L, 1L, 0.1)))
  }

  test("canonicalByQuality works on string ids (URL-hash corpora), min-id ties lexicographic") {
    val df = Seq(("u1", 0.2), ("u2", 0.9), ("u3", 0.9), ("u9", 0.1)).toDF("url", "q")
    val pairs = Seq(("u1", "u3"), ("u2", "u3")).toDF("id_a", "id_b")
    val out = Dedup.canonicalByQuality(df, pairs, "url", col("q"))
      .orderBy("url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("u2", 3L, 0.9), ("u9", 1L, 0.1)))
  }

  test("dedupSpans: first occurrence survives, later spans cut, docs reassembled") {
    // spanTokens=2 → doc 1: [a b][c d]; doc 2: [a b][x y]; doc 3: [c d]
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d")).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "a b c d", 0L), // owns the first occurrence of both its spans
      (2L, "x y", 1L),     // "a b" already seen in doc 1
      (3L, "", 1L)))       // its only span seen in doc 1 — empty, not dropped
  }

  test("dedupSpans: partial tail span is its own unit; intra-doc repeats cut") {
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    // spans: [a b][a b][a] — second "a b" is a later occurrence; tail "a"
    // is a distinct 1-token span
    val out = Dedup.dedupSpans(df, "doc_id", "text", spanTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "a b a", 1L)))
  }

  test("dedupSpans: adversarial same-prefix spans stay distinct under the 128-bit hash key") {
    // spans sharing long prefixes / differing only in the last token must
    // not merge windows (each distinct span text keeps its own winner)
    val df = Seq(
      (1L, "p p p p p p p p p a"),  // spans (k=5): [p p p p p][p p p p a]
      (2L, "p p p p p p p p p b"),  // [p p p p p](dup) [p p p p b]
      (3L, "p p p p a"),            // dup of doc 1's 2nd span
      (4L, "p p p p b")             // dup of doc 2's 2nd span
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, "doc_id", "text", spanTokens = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "p p p p p p p p p a", 0L),
      (2L, "p p p p b", 1L),
      (3L, "", 1L),
      (4L, "", 1L)))
  }

  test("dedupSpans: NULL text is total — treated as empty, accounting non-null") {
    val df = Seq((1L, "x y"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // null → '' → single '' span; docs 2 and 3 share it, doc 2 wins it
    assert(out.toSeq == Seq((1L, "x y", 0L), (2L, "", 0L), (3L, "", 1L)))
  }

  test("dedupSpans preserves every input row and total span accounting") {
    val slice = docs.filter(col("doc_id") < 100)
    val out = Dedup.dedupSpans(slice, "doc_id", "text", spanTokens = 10)
    assert(out.count() == slice.count())
    // spans kept + dropped == total spans of the input
    val totalSpans = slice
      .select(ceil(size(split(col("text"), " ")) / 10.0).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    val kept = out.select(
      (ceil(size(split(col("text"), " ")) / 10.0).cast("long") * when(col("text") =!= "", 1L).otherwise(0L)).as("k"),
      col("n_spans_dropped"))
    val agg = kept.agg(sum("k"), sum("n_spans_dropped")).head()
    assert(agg.getLong(0) + agg.getLong(1) == totalSpans)
  }

  test("substringPairs: shared 6-token runs counted per pair, hand-checked") {
    val df = Seq(
      (1L, "a b c d e f g h"), // grams: abcdef bcdefg cdefgh
      (2L, "x a b c d e f y"), // shares "a b c d e f" with 1 and 4
      (3L, "p q r s t u v w"), // no overlap
      (4L, "a b c d e f g z")  // shares 2 grams with 1, 1 with 2
    ).toDF("doc_id", "text")
    val out = Dedup.substringPairs(df, "doc_id", "text", n = 6)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (1L, 4L, 2L), (2L, 4L, 1L)))
  }

  test("substringPairs: boilerplate grams above maxDf are dropped, at maxDf kept") {
    val boiler = "one two three four five six"
    val df = (1L to 5L).map(i => (i, boiler)).toDF("doc_id", "text")
    assert(Dedup.substringPairs(df, "doc_id", "text", n = 6, maxDf = 4).isEmpty)
    assert(Dedup.substringPairs(df, "doc_id", "text", n = 6, maxDf = 5).count() == 10L)
  }

  test("substringPairs matches brute-force gram-set intersection on fixture docs") {
    val slice = docs.filter(col("doc_id") < 150)
    val grams = slice.select(col("doc_id"),
      array_distinct(Decontaminate.wordNgramsHof(col("text"), 5)).as("g"))
    val brute = grams.select(col("doc_id").as("id_a"), col("g").as("ga"))
      .crossJoin(grams.select(col("doc_id").as("id_b"), col("g").as("gb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("n_shared", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .filter(col("n_shared") >= 1L)
      .select("id_a", "id_b", "n_shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Dedup.substringPairs(slice, "doc_id", "text", n = 5, maxDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("containmentPairs: embedded short doc scores 1.0 where Jaccard stays low") {
    val host = "h1 h2 h3 h4 a b c d e f g h t1 t2 t3 t4"
    val embedded = "a b c d e f g h" // 3 distinct 6-grams, all inside host
    val df = Seq((1L, host), (2L, embedded), (3L, "p q r s t u v w x y"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
      n = 6, minContainment = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    // the same pair under Jaccard: 3 shared of (11 + 3 - 3) grams ≈ 0.27
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      shingleK = 6, threshold = 0.8)
    assert(jac.isEmpty)
  }

  test("boilerplateGrams ranks repeated 3-grams by doc frequency with deterministic ties") {
    val df = Seq(
      (1L, "legal header text body one"),
      (2L, "legal header text body two"),
      (3L, "legal header text other stuff"),
      (4L, "unique content entirely here")).toDF("doc_id", "text")
    val out = Dedup.boilerplateGrams(df, "text", n = 3, minDf = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // df=3: "legal header text"; df=2: "header text body"; ties sort by gram
    assert(out.head == (("legal header text", 3L)))
    assert(out.toSeq.contains(("header text body", 2L)))
    assert(out.forall(_._2 >= 2L))
    val dfs = out.map(_._2)
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
  }

  test("semanticPairs maxCluster rail drops oversized clusters; oversizedClusters audits them") {
    def jit(i: Int): Array[Float] =
      Array(1.0f + 0.01f * (i % 3), 0.01f * (i % 5), 0.0f, 0.0f)
    val df = (0 until 10).map(i => (i.toLong, jit(i))).toDF("vec_id", "embedding")
    // nlist=1: every row lands in the single cluster of 10 rows
    val capped = Dedup.semanticPairs(df, "vec_id", "embedding",
      threshold = 0.9, nlist = 1, maxCluster = 5)
    assert(capped.isEmpty) // the only cluster is oversized -> all pairs dropped
    val audit = Dedup.oversizedClusters(df, "vec_id", "embedding",
      nlist = 1, maxCluster = 5).collect()
    assert(audit.length == 1 && audit(0).getLong(1) == 10L)
    val uncapped = Dedup.semanticPairs(df, "vec_id", "embedding",
      threshold = 0.9, nlist = 1, maxCluster = 100)
    assert(uncapped.count() == 45L) // all 10-choose-2 pairs are near-identical
  }

  test("semanticPairs: exact-duplicate regime equals brute force (dups always co-cluster)") {
    val emb = Tables.embeddings(spark, GraftSpark.Sf0001)
    val dups = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val aug = emb.unionByName(dups)
    val sem = Dedup.semanticPairs(aug, "vec_id", "embedding", threshold = 0.95, nlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Dedup.embeddingCosinePairs(aug, "vec_id", "embedding",
        threshold = 0.95, lshPlanes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sem == brute && sem.size == 10)
  }

  test("semanticPairs: approximate regime — precision 1.0, recall bounded below on clustered data") {
    // two well-separated direction clusters; within-cluster cosine is high,
    // cross-cluster near zero — the k-means seeds (first 2 ids) land one
    // per cluster, so intra-cluster pairs are all recovered
    def jit(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => x + 0.05f * (((i * 7 + d * 3) % 5) - 2) }
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 1.0f, 0.0f, 0.0f)
    // interleave ids so the deterministic seeds (first 2 ids) land one per
    // cluster
    val rows = (0 until 20).map(i => (i.toLong, jit(if (i % 2 == 0) a else b, i)))
    val df = rows.toDF("vec_id", "embedding")
    val brute = Dedup.embeddingCosinePairs(df, "vec_id", "embedding",
        threshold = 0.9, lshPlanes = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticPairs(df, "vec_id", "embedding", threshold = 0.9, nlist = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(brute))          // exact cosine verify ⇒ no false pair
    assert(brute.nonEmpty)
    assert(sem.size.toDouble / brute.size >= 0.9) // separated clusters ⇒ near-full recall
  }
}
