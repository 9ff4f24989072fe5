package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("tokenCount / subTokenCount") {
    val df = Seq(("hello world", 1), ("a,b.c", 2)).toDF("t", "id")
    val out = df.orderBy("id").select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.subTokenCount(col("t"))).collect()
    assert(out(0).getInt(0) == 2)
    assert(out(0).getInt(1) == 2)
    assert(out(1).getInt(0) == 1)      // no spaces
    assert(out(1).getInt(1) == 5)      // a , b . c
  }

  test("qualityScore is bounded in [0,1] and penalizes degenerate docs") {
    val df = Seq(
      ("the cat sat on the mat and it is a fine day for all of us", 1), // good
      ("x x x x x x x x x x x x x x x x x x x x", 2),                   // no diversity-ish
      ("!!! ??? ### $$$ %%%", 3)).toDF("t", "id")                       // punct soup
    val out = df.orderBy("id").select(TextAnalysis.qualityScore(col("t"))).collect()
      .map(_.getDouble(0))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(0) > out(2), s"good ${out(0)} should beat punct soup ${out(2)}")
  }

  test("langId picks the dominant stopword language, deterministic tie-break") {
    val df = Seq(
      ("the cat and the dog is in the house", 1),
      ("el perro y la casa de que un gato se", 2),
      ("le chat et le chien les des du", 3),
      ("der hund und die katze das ist von", 4),
      ("zzz qqq www", 5)).toDF("t", "id")
    val out = df.orderBy("id").select(TextAnalysis.langId(col("t"))).collect()
      .map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "fr", "de", "und"))
  }

  test("native langId agrees with the composed-HOF reference on fixture docs") {
    val docs = graft.etl.Tables.documents(spark, graft.GraftSpark.Sf0001)
    val mismatches = docs.select(
        TextAnalysis.langId(col("text")).as("native"),
        TextAnalysis.langIdHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("native stopword_count agrees with the filter-HOF form on fixture docs") {
    import graft.functions.TextFunctions.stopword_count
    val docs = graft.etl.Tables.documents(spark, graft.GraftSpark.Sf0001)
    val tokens = split(col("text"), " ")
    val mismatches = docs.select(
        stopword_count(tokens, TextAnalysis.StopwordsEn).as("native"),
        size(filter(tokens, t => t.isin(TextAnalysis.StopwordsEn.map(lit): _*))).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(("a b c", 1), ("c b a", 2), ("a b c", 3)).toDF("t", "id")
    val fps = df.orderBy("id").select(TextAnalysis.fingerprint("t")).collect()
      .map(_.getLong(0))
    assert(fps(0) != fps(1))
    assert(fps(0) == fps(2))
  }

  test("fingerprint matches a driver-side xxhash64-chain recomputation on fixture docs") {
    // first-principles check backing the pinned text_fingerprint oracle:
    // re-derive the hash chain with catalyst's interpreted XxHash64 (a
    // different code path from the whole-stage-codegen'd query)
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def step(acc: Long, t: String): Long = {
      val h = XxHash64Function.hash(acc, LongType, 42L)
      XxHash64Function.hash(UTF8String.fromString(t), StringType, h)
    }
    val docs = graft.etl.Tables.documents(spark, graft.GraftSpark.Sf0001)
      .filter(col("doc_id") < 50)
    val got = docs.select(col("doc_id"), TextAnalysis.fingerprint("text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).foldLeft(0L)(step)).toMap
    assert(got.size == 50)
    assert(got == want)
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val df = Seq(("  Hello,   WORLD!! 42 ", 1)).toDF("t", "id")
    assert(df.select(TextAnalysis.normalize(col("t"))).head().getString(0) == "hello world 42")
  }

  test("repetitionRatio: 0 for all-distinct grams, high for repeated text") {
    val distinct = (1 to 20).map(i => s"w$i").mkString(" ")
    val repeated = Seq.fill(10)("a b c").mkString(" ")
    val df = Seq((distinct, 1), (repeated, 2)).toDF("t", "id")
    val out = df.orderBy("id").select(TextAnalysis.repetitionRatio(col("t"))).collect()
      .map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(out(1) > 0.8)
  }

  test("textStats columns are consistent") {
    val df = Seq(("aa bb aa", 0L)).toDF("text", "doc_id")
    val r = TextAnalysis.textStats(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_uniq_tokens") == 2L)
    assert(r.getAs[Long]("n_chars_obs") == 8L)
    assert(r.getAs[Double]("mean_token_len") == 2.0)
  }

  test("tfidfTopTerms: hand-computed fixture, k bound, rank order") {
    // 3 docs; 'rare' appears only in doc 0, 'shared' in all three
    val df = Seq(
      (0L, "rare shared shared"),
      (1L, "shared other other"),
      (2L, "shared unique")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    // doc 0: 'rare' tf=1 df=1 → ln(3)=1.0986; 'shared' tf=2 df=3 → 0
    val d0 = out.filter(_.getLong(0) == 0L)
    assert(d0.map(_.getString(1)).toSeq == Seq("rare", "shared"))
    assert(d0.head.getDouble(4) == math.floor(math.log(3.0) * 10000 + 0.5) / 10000)
    assert(d0(1).getDouble(4) == 0.0)
    // every doc emits at most k rows, ranks are 1..n
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 2)
      assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("bm25TopK: hand-computed scores, rare-term boost, k bound, non-matching docs absent") {
    // corpus: 4 docs; 'rare' only in doc 3; 'common' in all but doc 3
    val docs = Seq(
      (0L, "common common filler filler"),
      (1L, "common filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "rare filler")).toDF("doc_id", "text")
    val qs = Seq((1L, "common"), (1L, "rare")).toDF("q_id", "term")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, "q_id", "term", k = 3)
      .orderBy("q_id", "rank").collect()

    def bm25(tf: Double, df: Double, dl: Double): Double = {
      val n = 4.0; val avgdl = (4 + 2 + 6 + 2) / 4.0
      val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // expected per-doc scores for the one query
    val want = Map(
      0L -> r4(bm25(2, 3, 4)),  // common tf=2
      1L -> r4(bm25(1, 3, 2)),
      2L -> r4(bm25(1, 3, 6)),
      3L -> r4(bm25(1, 1, 2)))  // rare tf=1 df=1 → biggest idf
    assert(out.length == 3)                       // k=3 bound (4 matching docs)
    assert(out.forall(_.getLong(0) == 1L))
    val got = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    got.foreach { case (id, sc) => assert(math.abs(sc - want(id)) < 1e-9, s"doc $id") }
    // the rare-term doc outranks every common-term doc (idf dominance)
    assert(out.head.getLong(2) == 3L)
    // ranks are 1..3 and descending in score
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out.sliding(2).forall(p => p(0).getDouble(3) >= p(1).getDouble(3)))
  }

  test("tfidfTopTerms: idf of a universal term is 0 regardless of tf") {
    val docs = graft.etl.Tables.documents(spark, graft.GraftSpark.Sf0001).limit(50)
    val n = docs.count()
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 1000)
    val universal = out.filter(col("df") === n)
    assert(universal.filter(col("tfidf") =!= 0.0).isEmpty)
  }

  test("nllScore: hand-computed unigram NLL; OOV floor scores frozen-model batches") {
    import spark.implicits._
    // corpus: tokens a a a b -> p(a)=3/4, p(b)=1/4
    val corpus = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val model = TextAnalysis.unigramModel(corpus, "text")
    assert(model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 3L, "b" -> 1L))
    val scored = TextAnalysis.nllScore(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lnA = -math.log(3.0 / 4.0)
    val lnB = -math.log(1.0 / 4.0)
    assert(math.abs(scored(1L) - math.rint(lnA * 1e4) / 1e4) < 1e-9)
    assert(math.abs(scored(2L) - math.rint((lnA + lnB) / 2 * 1e4) / 1e4) < 1e-9)
    // frozen model scores an unseen token via the add-one OOV floor (1/4)
    val batch = Seq((9L, "z z")).toDF("doc_id", "text")
    val oov = TextAnalysis.nllScore(batch, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(oov(9L) - math.rint(lnB * 1e4) / 1e4) < 1e-9)
  }

  test("qualityFilter: first failed rule wins, kept docs pass all") {
    val df = Seq(
      (0L, "short"),                                      // < 3 tokens
      (1L, ("x y z " * 20).trim),                         // long but repetitive
      (2L, "the quick brown fox jumps over the lazy dog again and again for good measure today indeed truly")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(df, "text",
        minTokens = 10, maxRepetition = 0.2, minQuality = 0.1)
      .select("doc_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "too_short")
    assert(out(1L) == "repetitive")
    assert(out(2L) == "kept")
  }

  test("bigramNllScore: hand-computed interpolated probabilities on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNllScore(docs, "doc_id", "text",
        TextAnalysis.bigramModel(docs, "text"),
        TextAnalysis.unigramModel(docs, "text"), lambda = 0.7)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // c12: (a,b)=2, (b,a)=1; ctx: a=2, b=1; unigrams a=3 b=2, N=5
    // doc1: -ln(.7*2/2+.3*2/5), -ln(.7*1/1+.3*3/5) -> mean(.19845,.12783)=.1631
    // doc2: -ln(0.82) = .1985
    assert(out.toSeq == Seq((1L, 0.1631), (2L, 0.1985)))
  }

  test("bigramNllScore is total under FROZEN models (OOV pairs back off, OOV tokens floored)") {
    val ref = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val bg = TextAnalysis.bigramModel(ref, "text")
    val uni = TextAnalysis.unigramModel(ref, "text")
    val newDocs = Seq((9L, "zz qq zz")).toDF("doc_id", "text") // fully OOV
    val out = TextAnalysis.bigramNllScore(newDocs, "doc_id", "text", bg, uni)
      .collect()
    assert(out.length == 1)
    val nll = out(0).getDouble(1)
    assert(!nll.isNaN && !nll.isInfinite && nll > 0)
    // single-token docs have no pairs and are absent
    val single = TextAnalysis.bigramNllScore(
      Seq((3L, "word")).toDF("doc_id", "text"), "doc_id", "text", bg, uni)
    assert(single.isEmpty)
  }

  test("sketch profile (HLL++ distinct, approx percentiles) tracks the exact aggregates") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val approx = docs.groupBy("source").agg(
        approx_count_distinct(col("text"), 0.02).as("ad"),
        element_at(percentile_approx(col("n_chars"), array(lit(0.5)), lit(10000)), 1).as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = docs.groupBy("source").agg(
        countDistinct(col("text")).as("d"),
        expr("percentile(n_chars, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (src, (d, p50)) =>
      val (ad, ap50) = approx(src)
      // rsd 0.02 is the asymptotic bound; tiny strata (tens of values)
      // wobble a few counts — allow max(3, 10%)
      assert(math.abs(ad - d).toDouble <= math.max(3.0, 0.10 * d),
        s"$src HLL err: $ad vs $d")
      // KLL percentile at high accuracy lands within one observed value
      assert(math.abs(ap50 - p50) <= math.max(2.0, p50 * 0.05), s"$src p50: $ap50 vs $p50")
    }
  }

  test("winnowFingerprints: selection equals a driver-side sliding-window-min over the gram hashes") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001).limit(40)
    val k = 4; val w = 5
    val rows = docs.select(
        col("doc_id"),
        graft.functions.TextFunctions.shingle_hash(split(col("text"), " "), k).as("grams"),
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("fps"))
      .collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val grams = r.getSeq[Long](1)
      val want = (0 to math.max(grams.length - w, 0))
        .map(i => grams.slice(i, i + w).min).toSet
      assert(r.getSeq[Long](2).toSet == want, s"doc ${r.getLong(0)}")
    }
  }

  test("winnowing guarantee: a shared run of window+k-1 tokens yields a shared fingerprint") {
    val k = 4; val w = 5
    // the shared run is w+k-1 = 8 tokens, embedded at different positions
    val run = "q1 q2 q3 q4 q5 q6 q7 q8"
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"$run zeta eta theta iota kappa lambda")).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)
    // and winnowPairs surfaces the pair at minShared = 1
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", k, w,
        maxDf = 100, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("native winnow_select agrees with the HOF form bit-for-bit on fixture docs") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val mismatches = docs.select(
        TextAnalysis.winnowFingerprints(col("text"), 4, 5).as("native"),
        TextAnalysis.winnowFingerprintsHof(col("text"), 4, 5).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("gopherRules: each rule fires on its crafted violator and not on the clean doc") {
    val clean = (1 to 30).map(i => if (i % 3 == 0) "the" else if (i % 3 == 1) "and" else s"word$i").mkString(" ")
    val docs = Seq(
      (1L, clean),
      (2L, "too short"),                                        // word count
      (3L, (1 to 30).map(_ => "a").mkString(" ")),              // mean word len < 3
      (4L, (1 to 30).map(i => s"#t$i").mkString(" ")),          // symbol ratio
      (5L, (1 to 30).map(i => s"$i"). mkString(" ")),           // alpha ratio
      (6L, (1 to 30).map(i => s"w$i").mkString(" "))            // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "text")
      .orderBy("doc_id").collect()
    def v(r: org.apache.spark.sql.Row, c: String) = r.getAs[Boolean](c)
    val cleanRow = out(0)
    assert(!v(cleanRow, "viol_word_count") && !v(cleanRow, "viol_mean_wordlen") &&
      !v(cleanRow, "viol_symbol_ratio") && !v(cleanRow, "viol_alpha_ratio") &&
      !v(cleanRow, "viol_stopwords"))
    assert(v(out(1), "viol_word_count"))
    assert(v(out(2), "viol_mean_wordlen"))
    assert(v(out(3), "viol_symbol_ratio"))
    assert(v(out(4), "viol_alpha_ratio"))
    assert(v(out(5), "viol_stopwords"))
  }

  test("buildVocab ranks by count desc then token, dense ids from 1, minCount/maxVocab honored") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b rare"),
      (3L, "a c")).toDF("doc_id", "text")
    // counts: a=4, b=4, c=2, rare=1
    val v = TextAnalysis.buildVocab(docs, "text", minCount = 2L, maxVocab = 10)
      .orderBy("token_id").collect()
    assert(v.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq(("a", 1, 4L), ("b", 2, 4L), ("c", 3, 2L)))   // tie a/b broken by token asc
    // maxVocab truncates the tail, ids stay the rank prefix
    val v1 = TextAnalysis.buildVocab(docs, "text", minCount = 1L, maxVocab = 2)
      .orderBy("token_id").collect()
    assert(v1.map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("encodeTokens emits one row per position, OOV -> 0, decode round-trips in-vocab tokens") {
    val docs = Seq((1L, "a b zzz a")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", minCount = 2L, maxVocab = 10)
    val enc = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocab)
      .orderBy("pos").collect()
    assert(enc.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((0, 1), (1, 0), (2, 0), (3, 1)))  // a=1 (count 2); b, zzz OOV
    // decoding the in-vocab positions restores the original tokens
    val decoded = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocab)
      .join(vocab, Seq("token_id")).orderBy("pos")
      .select("token").as[String].collect()
    assert(decoded.toSeq == Seq("a", "a"))
  }

  test("qualityPercentileBySource: pct is a within-source percent_rank of q") {
    val docs = graft.etl.Tables.documents(spark, GraftSpark.Sf0001)
    val got = TextAnalysis.qualityPercentileBySource(docs, "doc_id", "text", "source")
    assert(got.count() == docs.count())
    val rows = got.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // bounds + per-source extremes: min-q docs at 0.0, max-q docs at 1.0
    assert(rows.forall { case (_, _, _, p) => p >= 0.0 && p <= 1.0 })
    rows.groupBy(_._1).foreach { case (src, grp) =>
      val minQ = grp.map(_._3).min
      val maxQ = grp.map(_._3).max
      assert(grp.filter(_._3 == minQ).forall(_._4 == 0.0), s"$src min-q pct != 0")
      // percent_rank gives a tie group its FIRST row's rank: the max-q
      // group sits at (n - |ties|) / (n - 1), which is 1.0 iff unique
      if (grp.length > 1 && maxQ > minQ) {
        val nTies = grp.count(_._3 == maxQ)
        val want = math.rint((grp.length - nTies) / (grp.length - 1.0) * 1e4) / 1e4
        assert(grp.filter(_._3 == maxQ).forall(_._4 == want),
          s"$src max-q pct != $want")
      }
      // pct is monotone in q within the source; equal q → equal pct
      grp.sortBy(r => (r._3, r._4)).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 <= b._4)
          if (a._3 == b._3) assert(a._4 == b._4, s"$src tie group split")
        case _ =>
      }
    }
    // a uniform top-fraction cut keeps the same share of EVERY source
    val kept = rows.filter(_._4 >= 0.8).groupBy(_._1).view.mapValues(_.length).toMap
    val tot = rows.groupBy(_._1).view.mapValues(_.length).toMap
    tot.foreach { case (src, n) =>
      val share = kept.getOrElse(src, 0).toDouble / n
      assert(share > 0.05 && share < 0.45, s"$src kept share $share far from 0.2")
    }
  }

  test("compressionRatio: repetitive < prose < random; deterministic; null/empty safe") {
    import spark.implicits._
    val rep = "spam " * 400
    val prose = (1 to 80).map(i => s"word$i token$i mix${i % 7}").mkString(" ")
    val rnd = {
      var z = 42L
      (1 to 2000).map { _ =>
        z = z * 6364136223846793005L + 1442695040888963407L
        ((z >>> 40) % 94 + 33).toChar
      }.mkString
    }
    val df = Seq((1L, Some(rep)), (2L, Some(prose)), (3L, Some(rnd)),
      (4L, Some("")), (5L, None)).toDF("id", "text")
    val out = TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L)._3.get < out(2L)._3.get, "repetition must compress below prose")
    assert(out(2L)._3.get < out(3L)._3.get, "prose must compress below random")
    assert(out(4L)._1 == 0L && out(4L)._3.isEmpty, "empty text: 0 raw bytes, NULL ratio")
    assert(out(5L)._1 == 0L && out(5L)._3.isEmpty, "null text: 0 bytes, NULL ratio")
    // determinism (fixed zlib): byte counts identical across runs
    val again = TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }

  test("zipfFit: exact power law recovers slope -1 with r2 = 1; topN cut applies") {
    import spark.implicits._
    // counts 12/6/4/3 = 12/rank exactly: ln f = ln 12 − 1·ln r → perfect fit
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs, "text").head()
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    // topN = 2 keeps only the head ranks (freq DESC, token tiebreak)
    val top2 = TextAnalysis.zipfFit(docs, "text", topN = 2).head()
    assert(top2.getAs[Long]("n_terms") == 2L)
    assert(math.abs(top2.getAs[Double]("slope") + 1.0) < 1e-9)
    intercept[IllegalArgumentException](TextAnalysis.zipfFit(docs, "text", topN = 1))
  }

  test("readability: hand-computed Flesch / FK grade on a two-sentence text") {
    // "Hello world. This is fun!": 5 words, 2 sentences, 6 vowel groups
    // (he-llo has e+o, world o, this i, is i, fun u) →
    //   flesch = 206.835 − 1.015·2.5 − 84.6·1.2 = 102.7775
    //   grade  = 0.39·2.5 + 11.8·1.2 − 15.59   = −0.455
    val df = Seq((1L, "Hello world. This is fun!")).toDF("doc_id", "text")
    val r = df.select(col("doc_id") +: TextAnalysis.readability(col("text")): _*)
      .collect().head
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    assert(r.getAs[Double]("flesch") == 102.7775)
    assert(r.getAs[Double]("fk_grade") == -0.455)
  }

  test("readability: no sentence terminator counts as one sentence; longer words score harder") {
    val df = Seq(
      (1L, "see the cat run"),
      (2L, "extraordinarily sophisticated terminological considerations")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id") +: TextAnalysis.readability(col("text")): _*)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_sentences") == 1L)
    assert(got(1).getAs[Long]("n_sentences") == 1L)
    assert(got(0).getAs[Double]("flesch") > got(1).getAs[Double]("flesch"),
      "simple monosyllables must read easier than sesquipedalian prose")
    assert(got(0).getAs[Double]("fk_grade") < got(1).getAs[Double]("fk_grade"))
  }

  test("readability: empty / whitespace-only documents stay finite (no NaN)") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = df.select(col("doc_id") +: TextAnalysis.readability(col("text")): _*)
      .orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_words") == 0L)
      assert(!r.getAs[Double]("flesch").isNaN && !r.getAs[Double]("flesch").isInfinite)
      assert(!r.getAs[Double]("fk_grade").isNaN && !r.getAs[Double]("fk_grade").isInfinite)
    }
  }
}
