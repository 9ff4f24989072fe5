package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark
import graft.etl.Tables

class PackingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def docs = Tables.documents(spark, GraftSpark.Sf0001)
  private val C = 512L

  private def packed(bucketWidth: Long) =
    Packing.packChunks(docs, "doc_id", TextAnalysis.tokenCount(col("text")), C, bucketWidth)

  test("start_tok is the exact prefix sum of token counts in doc_id order") {
    val rows = packed(bucketWidth = 64).orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_tok").collect()
    var running = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == running, s"doc ${r.getLong(0)} start_tok")
      running += r.getLong(1)
    }
  }

  test("chunk range is start/end token div chunk size") {
    packed(bucketWidth = 64).collect().foreach { r =>
      val (tok, start, cs, ce) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cs == start / C)
      assert(ce == (start + tok - 1) / C)
      assert(ce >= cs)
    }
  }

  test("result is invariant to bucketWidth (the distributed prefix sum is exact)") {
    val a = packed(bucketWidth = 7)
    val b = packed(bucketWidth = 1L << 20) // one bucket: the naive global window
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("chunkManifest tiles every chunk exactly (full chunks sum to chunkTokens)") {
    val man = Packing.chunkManifest(packed(64), "doc_id", C)
    val perChunk = man.groupBy("chunk")
      .agg(sum(col("doc_to") - col("doc_from")).as("covered"),
        min("chunk_offset").as("first_off"))
      .orderBy("chunk").collect()
    val lastChunk = perChunk.map(_.getLong(0)).max
    perChunk.foreach { r =>
      assert(r.getLong(2) == 0L, s"chunk ${r.getLong(0)} must start at offset 0")
      if (r.getLong(0) < lastChunk)
        assert(r.getLong(1) == C, s"chunk ${r.getLong(0)} covered ${r.getLong(1)} != $C")
      else
        assert(r.getLong(1) <= C)
    }
  }

  test("chunkDocuments: windows, overlap, short docs, reconstruction") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than window
      (3L, "")                                        // empty text = 1 empty token
    ).toDF("doc_id", "text")
    val out = Packing.chunkDocuments(df, "doc_id", "text", maxTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // stride 3: starts 0,3,6 cover t1..t10 with 1-token overlap; start 9 would
    // add only already-covered tokens ⇒ lastStart = 10-1-1 = 8 → starts 0,3,6
    assert(d1.map(_.getString(2)).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L))
    // overlap: each consecutive pair shares exactly 1 token
    d1.map(_.getString(2).split(" ").toSeq).sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(1) == b.take(1))
      case _ =>
    }
    // short and empty docs still emit exactly one chunk
    assert(out.filter(_.getLong(0) == 2L).map(_.getString(2)).toSeq == Seq("a b"))
    assert(out.filter(_.getLong(0) == 3L).length == 1)
    // every token of every doc appears in some chunk (coverage)
    val fixture = Tables.documents(spark, GraftSpark.Sf0001)
    val covered = Packing.chunkDocuments(fixture, "doc_id", "text", 64, 16)
      .groupBy("doc_id")
      .agg(sum(col("n_chunk_tokens")).as("chunked"),
        max(col("chunk_idx")).as("max_idx"))
    val bad = covered
      .join(fixture.select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens")), Seq("doc_id"))
      // sum of chunk sizes = n_tokens + overlap × n_overlapping_boundaries
      .filter(col("chunked") =!= col("n_tokens") + lit(16L) * col("max_idx"))
    assert(bad.isEmpty)
  }

  test("chunkManifest doc spans are within the doc and contiguous across its chunks") {
    val man = Packing.chunkManifest(packed(64), "doc_id", C)
      .orderBy("doc_id", "chunk").collect()
    man.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      assert(sorted.head.getLong(2) == 0L)                   // doc_from starts at 0
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.getLong(3) == y.getLong(2)) // to == next from
        case _ =>
      }
    }
  }

  test("assembleConversations sorts turns inside the aggregate (input order irrelevant)") {
    import spark.implicits._
    // deliberately out of order, scattered across partitions
    val turns = Seq((1L, 3L, "c"), (1L, 1L, "a"), (2L, 1L, "x"), (1L, 2L, "b"))
      .toDF("user_id", "turn", "txt").repartition(3)
    val out = Packing.assembleConversations(turns,
        keyCols = Seq("user_id"), orderCols = Seq("turn"), textCol = "txt", sep = "|")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((3L, 1L, 3L, "a|b|c")))
    assert(out(2L) == ((1L, 1L, 1L, "x")))
  }

  test("assembleConversations renders NULL-text turns as empty (n_turns stays in sync)") {
    import spark.implicits._
    val turns = Seq((1L, 1L, "a"), (1L, 2L, null.asInstanceOf[String]), (1L, 3L, "c"))
      .toDF("user_id", "turn", "txt")
    val out = Packing.assembleConversations(turns,
        keyCols = Seq("user_id"), orderCols = Seq("turn"), textCol = "txt", sep = "|")
      .collect().head
    assert(out.getLong(1) == 3L, "the NULL-text turn still counts")
    assert(out.getString(4) == "a||c", "the NULL-text turn holds its slot as empty")
  }

  test("batchByLength: full batches, length-monotone, and padding beats naive id-order batching") {
    val lens = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.tokenCount(col("text")).cast("bigint").as("len"))
    val out = Packing.batchByLength(lens, "doc_id", col("len"), batchSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    val byBatch = out.groupBy(_._3)
    // every batch full except possibly the last
    byBatch.foreach { case (b, xs) =>
      assert(xs.length == 32 || b == (n - 1) / 32, s"batch $b size ${xs.length}")
    }
    // batches are length-monotone: batch b's max <= batch b+1's min
    val stats = byBatch.toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.map(_._2).min, xs.map(_._2).max) }
    stats.zip(stats.tail).foreach { case ((b, _, mx), (_, mn2, _)) =>
      assert(mx <= mn2, s"batch $b max $mx exceeds next min $mn2") }
    // padding (pad-to-batch-max) strictly improves on naive id-order batches
    def padding(assign: Seq[(Long, Long)]): Long =
      assign.grouped(32).map(g => g.map(_._2).max * g.length - g.map(_._2).sum).sum
    val sorted = out.sortBy(_._3).map(x => (x._1, x._2)).toSeq
    val naive = out.sortBy(_._1).map(x => (x._1, x._2)).toSeq
    assert(padding(sorted) < padding(naive),
      s"sorted ${padding(sorted)} not below naive ${padding(naive)}")
  }

  test("prefixGroups: hand-computed grouping and the (n−1)·prefix_len savings formula") {
    import spark.implicits._
    val prompts = Seq(
      (1L, "summarize this text about cats"), // group "summarize this": 3 prompts
      (2L, "summarize this text about dogs"),
      (3L, "summarize this report"),
      (4L, "translate to french hello"),      // group "translate to": 2 prompts
      (5L, "translate to german goodbye"),
      (6L, "hi")).toDF("doc_id", "text")      // 1-token prompt: groups by full text
    val got = Packing.prefixGroups(prompts, "text", prefixTokens = 2, topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // savings = (n_docs − 1) · prefix_len: the prefill a RadixAttention-
    // style cache computes once per group instead of once per prompt
    assert(got("summarize this") == ((3L, 2L, 13L, 4L)))
    assert(got("translate to") == ((2L, 2L, 8L, 2L)))
    // the short prompt's shared length is its own (1-token) length
    assert(got("hi") == ((1L, 1L, 1L, 0L)))
    got.foreach { case (p, (n, plen, _, saved)) =>
      assert(saved == (n - 1) * plen, s"savings formula broken for '$p'")
    }
    intercept[IllegalArgumentException](Packing.prefixGroups(prompts, "text", 0, 10))
    intercept[IllegalArgumentException](Packing.prefixGroups(prompts, "text", 2, 0))
  }

  test("prefixGroups ranks by savings and honors topK with deterministic ties") {
    val out = Packing.prefixGroups(docs, "text", prefixTokens = 2, topK = 20).collect()
    assert(out.length <= 20)
    val saved = out.map(_.getLong(4)).toSeq
    assert(saved == saved.sortBy(-_), "must be ranked by saved_tokens desc")
  }
}
