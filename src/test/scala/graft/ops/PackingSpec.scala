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
}
