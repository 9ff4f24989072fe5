package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.Tables

/** Shared fixture plumbing and pinned date cuts for the query registries
  * (moved verbatim out of SparkEntry in the r14 registry split).
  */
object Fixtures {
  /** Fixture "service" pages for the S9/S10 paged DSv2 source, materialized
    * from the events table ONCE per (machine, sf-dir) — on-disk reuse keyed
    * by the sf dir, in-JVM memoized. Round 1 collected the events table to
    * the driver and wrote a fresh leaked temp dir on EVERY invocation of the
    * declared query (so the bench timed driver serialization and the query
    * closure contained a `.collect()` — both called out in the verdict);
    * now the declared query body is only the DSv2 read + aggregation.
    */
  object PagedFixture {
    private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

    def pagesDir(s: SparkSession, dir: String): String =
      memo.computeIfAbsent(dir, _ => materialize(s, dir))

    private def materialize(s: SparkSession, dir: String): String = {
      import java.nio.file.{Files, Path, Paths, StandardCopyOption}
      // v2: pages carry ts_str (ISO-micros transaction time) so the
      // Method-2 date-window $filter has a wire-format column to push —
      // the name bump invalidates pre-r7 on-disk fixtures without it
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_pages_v2_" + Integer.toHexString(dir.hashCode))
      val pages = base.resolve("pages")
      val marker = base.resolve("_SUCCESS")
      if (!Files.exists(marker)) {
        // pages are deterministic (ordered by event_id), so a lost
        // cross-JVM race just builds identical content; the atomic move
        // publishes whole dirs only
        val tmp = Files.createTempDirectory("graft_pages_build")
        val tmpPages = Files.createDirectory(tmp.resolve("pages"))
        val recs = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
          .orderBy("event_id").toJSON.collect()
        recs.grouped(2000).zipWithIndex.foreach { case (page, i) =>
          Files.writeString(tmpPages.resolve(f"page_$i%05d.json"), page.mkString("\n"))
        }
        Files.createFile(tmp.resolve("_SUCCESS"))
        try Files.move(tmp, base, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException |
               _: java.nio.file.FileSystemException =>
            // another JVM published first — use theirs, drop ours
            def rm(p: Path): Unit = {
              if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
              Files.deleteIfExists(p)
            }
            rm(tmp)
        }
      }
      pages.toString
    }

    private val corruptMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** A CORRUPTED page service for the raw-mode quarantine boundary:
      * documents-table records serialized as page lines with the SAME
      * doc_id-arithmetic mangles as the `jsonl_quarantine` fixture —
      * %11==3 truncated mid-record (malformed), %11==7 n_chars mangled to
      * a string (schema_mismatch with a partial parse) — so the DuckDB
      * oracle replays every lane and value from the base table.
      */
    def corruptPagesDir(s: SparkSession, dir: String): String =
      corruptMemo.computeIfAbsent(dir, _ => materializeCorrupt(s, dir))

    private def materializeCorrupt(s: SparkSession, dir: String): String = {
      import java.nio.file.{Files, Path, Paths, StandardCopyOption}
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_pages_corrupt_v1_" + Integer.toHexString(dir.hashCode))
      val pages = base.resolve("pages")
      val marker = base.resolve("_SUCCESS")
      if (!Files.exists(marker)) {
        val tmp = Files.createTempDirectory("graft_cpages_build")
        val tmpPages = Files.createDirectory(tmp.resolve("pages"))
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          coalesce(col("n_chars"), lit(-1L)).as("n_chars"))
        val jsonLine = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
        val recs = docs
          .withColumn("line",
            when(col("doc_id") % 11 === 3,
                jsonLine.substr(lit(1), length(jsonLine) - lit(2)))
              .when(col("doc_id") % 11 === 7, regexp_replace(jsonLine,
                lit("\"n_chars\":(-?[0-9]+)"), lit("\"n_chars\":\"x$1\"")))
              .otherwise(jsonLine))
          .orderBy("doc_id").select("line").collect().map(_.getString(0))
        recs.grouped(200).zipWithIndex.foreach { case (page, i) =>
          Files.writeString(tmpPages.resolve(f"page_$i%05d.json"), page.mkString("\n"))
        }
        Files.createFile(tmp.resolve("_SUCCESS"))
        try Files.move(tmp, base, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException |
               _: java.nio.file.FileSystemException =>
            def rm(p: Path): Unit = {
              if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
              Files.deleteIfExists(p)
            }
            rm(tmp)
        }
      }
      pages.toString
    }
  }

  /** Persisted-index fixtures for the build-once/serve-many declared
    * queries: each index is built and written ONCE per (machine, sf-dir)
    * — on-disk reuse with an atomic publish (same protocol as
    * [[PagedFixture]]), in-JVM memoized — so the DECLARED query body is
    * the serving path (read → query), exactly the deployment shape. Index
    * builds are deterministic, so a lost cross-JVM race produces identical
    * content. The `kind` tag carries a version suffix: bump it in the same
    * commit as any index-format/maths change to invalidate stale fixtures.
    */
  object IndexFixture {
    private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

    def dir(kind: String, sfDir: String)(build: String => Unit): String = {
      // NOT computeIfAbsent: fixture builders NEST (ivfpqRebuildFixture's
      // build calls ivfpqStreamFixture on this same map), and a mapping
      // function that inserts into the map it runs under throws
      // IllegalStateException("Recursive update") whenever both keys are
      // cold — which is exactly the first run on a fresh machine (the ×10
      // r18 gate caught knn_maintained_rebuild failing this way; sf0.01
      // only ever passed because the on-disk markers short-circuited the
      // nested build). A plain get/putIfAbsent memo is nesting-safe; a
      // concurrent intra-JVM double-build is harmless because materialize
      // already carries the cross-JVM atomic-publish protocol.
      val key = kind + ":" + sfDir
      val cached = memo.get(key)
      if (cached != null) cached
      else {
        val v = materialize(kind, sfDir, build)
        memo.putIfAbsent(key, v)
        v
      }
    }

    private def materialize(kind: String, sfDir: String, build: String => Unit): String = {
      import java.nio.file.{Files, Path, Paths, StandardCopyOption}
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_idx_${kind}_" + Integer.toHexString(sfDir.hashCode))
      val marker = base.resolve("_GRAFT_DONE")
      if (!Files.exists(marker)) {
        val tmp = Files.createTempDirectory(s"graft_idx_${kind}_build")
        build(tmp.toString)
        Files.createFile(tmp.resolve("_GRAFT_DONE"))
        try Files.move(tmp, base, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException |
               _: java.nio.file.FileSystemException =>
            def rm(p: Path): Unit = {
              if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
              Files.deleteIfExists(p)
            }
            rm(tmp)
        }
      }
      base.toString
    }
  }

  /** Stateful-stream shuffle width derived from source size: ~1 partition
    * per 16 MB of input, clamped to [2, defaultParallelism]. Keeps tiny
    * fixtures from paying 32 partitions × 4 state-store commits per batch
    * while still widening with the data at cluster scale.
    */
  def statePartitionsFor(s: SparkSession, path: String): Int = {
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      } catch { case _: java.io.IOException => 0L }
    val byInput = (bytes / (16L << 20)).toInt
    math.min(math.max(2, byInput), s.sparkContext.defaultParallelism)
  }

  /** Pinned reference dates (fixture data is historical — FIXTURES.md §C). */
  val LineitemRef = LocalDate.parse("2001-11-04") // max l_shipdate
  val OrdersRef = LocalDate.parse("2001-08-01")   // max o_orderdate
  val WindowDays = 30

  // cutoffs as SQL literals (UTC midnight)
  val LiCut = "2001-10-05 00:00:00"  // LineitemRef - 30d
  val OrdCut = "2001-07-02 00:00:00" // OrdersRef - 30d
  // events fixture spans 2024-01-01..30; the Method-2 refresh window is the
  // trailing week, as an ISO-micros literal (lexicographic = chronological)
  val EventsCut = "2024-01-24 00:00:00"
  val EventsCutIso = EventsCut + ".000000"
}
