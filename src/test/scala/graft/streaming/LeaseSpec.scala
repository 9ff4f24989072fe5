package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

/** A FileSystem shim simulating an S3-class object store WITHOUT atomic
  * create-no-overwrite: `create(f, overwrite = false)` never throws on an
  * existing object — a plain PUT replaces it silently (the worst case of
  * the HEAD-then-PUT connectors Incremental.withRootLease's object-store
  * branch defends against). With `intrudeOnClose` set, every PUT is
  * immediately followed by a concurrent contender's PUT landing on the
  * same key — the deterministic form of the last-writer-overwrite race
  * the read-back-verify must catch.
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockobj:///")

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    wrap(super.create(f, true, bufferSize, replication, blockSize, progress), f)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    wrap(super.create(f, permission, true, bufferSize, replication,
      blockSize, progress), f)

  private def wrap(out: FSDataOutputStream, f: Path): FSDataOutputStream =
    if (!MockObjectStoreFs.intrudeOnClose) out
    else new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      private var intruded = false
      override def close(): Unit = {
        super.close()
        // a concurrent PUT lands right after ours on the same key
        if (!intruded) {
          intruded = true
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(f.toUri.getPath),
            MockObjectStoreFs.IntruderToken)
          // with failAfterIntruderPut: this contender's close then FAILS
          // (connector-side PUT error) — the cleanup path now runs with
          // the WINNER's token stored under the lease key
          if (MockObjectStoreFs.failAfterIntruderPut)
            throw new java.io.IOException("simulated close failure")
        }
      }
    }, null)
}

object MockObjectStoreFs {
  @volatile var intrudeOnClose: Boolean = false
  @volatile var failAfterIntruderPut: Boolean = false
  val IntruderToken = "holder=intruder pid=0 nonce=fixed"
}

/** An object store WITH the conditional put (S3 If-None-Match; Hadoop
  * 3.4.1+ `fs.s3a.create.conditional.enabled`): `create(overwrite=false)`
  * throws atomically on an existing object. With `intrudeOnCreate` set,
  * an intruder's PUT lands immediately BEFORE the create evaluates — the
  * overlapping-window race the non-atomic branch can only narrow; here
  * the conditional create must lose it loudly AT CREATE TIME.
  */
class MockConditionalStoreFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockcond:///")

  private def intrude(f: Path, overwrite: Boolean): Unit =
    if (!overwrite && MockConditionalStoreFs.intrudeOnCreate)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f.toUri.getPath),
        MockObjectStoreFs.IntruderToken)

  // RawLocalFileSystem.create(overwrite=false) already throws
  // FileAlreadyExistsException on an existing file — the shim only
  // injects the racing PUT in front of that atomic decision
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    intrude(f, overwrite)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    intrude(f, overwrite)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}

object MockConditionalStoreFs {
  @volatile var intrudeOnCreate: Boolean = false
}

/** The object-store leg of the root mutator lease (r18): on stores
  * without an atomic create-no-overwrite, withRootLease must still make
  * the LOSER fail loudly — via the explicit exists-check plus the
  * read-back-verify — and must never delete a lease another contender
  * ended up holding.
  */
class LeaseSpec extends AnyFunSuite {

  private def objConf(): Configuration = {
    val conf = new Configuration() // with defaults: the shim FS reads them
    conf.set("fs.mockobj.impl", classOf[MockObjectStoreFs].getName)
    conf.set("graft.lease.objectstore.schemes", "mockobj")
    conf.setLong("graft.lease.settle.ms", 1L)
    // don't serve a cached instance built from another test's conf
    conf.setBoolean("fs.mockobj.impl.disable.cache", true)
    conf
  }

  private def mockPath(local: String): Path =
    new Path(new URI("mockobj", null, local, null, null))

  test("object-store lease: a held lease fails the second mutator loudly " +
      "even though the store's create silently overwrites") {
    val conf = objConf()
    val root = mockPath(
      java.nio.file.Files.createTempDirectory("graft_objlease").toString)
    val fs = root.getFileSystem(conf)
    assert(fs.isInstanceOf[MockObjectStoreFs])
    // the shim really is non-atomic: create(overwrite=false) on an
    // existing object replaces it without FileAlreadyExistsException
    val probe = new Path(root, "probe")
    fs.create(probe, false).close()
    fs.create(probe, false).close() // would throw on a correct store
    var bodyRan = false
    Incremental.withRootLease(conf, fs, root, "test index", "A") {
      bodyRan = true
      val e = intercept[IllegalStateException](
        Incremental.withRootLease(conf, fs, root, "test index", "B") {
          fail("the losing mutator must never reach its body")
        })
      assert(e.getMessage.contains("LEASED"), e.getMessage)
      assert(e.getMessage.contains("holder=A"), e.getMessage)
      // the loser did not touch the winner's lease
      val lease = new Path(root, "_graft_lease")
      assert(fs.exists(lease))
    }
    assert(bodyRan)
    // released on exit
    assert(!fs.exists(new Path(root, "_graft_lease")))
  }

  test("object-store lease: read-back-verify catches the overwrite race — " +
      "the contender whose PUT lost fails loudly and leaves the winner's " +
      "lease in place") {
    val conf = objConf()
    val root = mockPath(
      java.nio.file.Files.createTempDirectory("graft_objrace").toString)
    val fs = root.getFileSystem(conf)
    MockObjectStoreFs.intrudeOnClose = true
    try {
      val e = intercept[IllegalStateException](
        Incremental.withRootLease(conf, fs, root, "test index", "C") {
          fail("the race loser must never reach its body")
        })
      assert(e.getMessage.contains("LEASED"), e.getMessage)
      assert(e.getMessage.contains("intruder"), e.getMessage)
    } finally MockObjectStoreFs.intrudeOnClose = false
    // the winner's lease (the intruder's PUT) survives the loser's exit
    val lease = new Path(root, "_graft_lease")
    assert(fs.exists(lease))
    val held = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lease.toUri.getPath)), "UTF-8").trim
    assert(held == MockObjectStoreFs.IntruderToken, held)
  }

  test("hdfs-class and local schemes never take the object-store branch; " +
      "unknown schemes stay on the hdfs-class atomic create") {
    // regression pin for the dispatch: the conf-extensible scheme set
    // contains the documented stores plus nothing else by default
    val conf = new Configuration(false)
    val base = Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb",
      "wasbs", "oss", "cos", "cosn", "swift")
    assert(Incremental.leaseObjectStoreSchemes(conf) == base)
    conf.set("graft.lease.objectstore.schemes", "mockobj, minio")
    assert(Incremental.leaseObjectStoreSchemes(conf) ==
      base ++ Set("mockobj", "minio"))
  }

  test("conditional-create detection: s3a advertises via the Hadoop key, " +
      "other connectors opt in via the graft seam, default is off") {
    val conf = new Configuration(false)
    assert(!Incremental.leaseConditionalCreate(conf, "s3a"))
    assert(!Incremental.leaseConditionalCreate(conf, "gs"))
    conf.setBoolean("fs.s3a.create.conditional.enabled", true)
    assert(Incremental.leaseConditionalCreate(conf, "s3a"))
    // the Hadoop key is the s3a connector's — it must not leak to others
    assert(!Incremental.leaseConditionalCreate(conf, "s3"))
    conf.set("graft.lease.conditional.schemes", "mockcond, ozone")
    assert(Incremental.leaseConditionalCreate(conf, "mockcond"))
    assert(Incremental.leaseConditionalCreate(conf, "ozone"))
    assert(!Incremental.leaseConditionalCreate(conf, "gs"))
  }

  private def condConf(): Configuration = {
    val conf = new Configuration()
    conf.set("fs.mockcond.impl", classOf[MockConditionalStoreFs].getName)
    // the scheme is an object store AND advertises the conditional create
    conf.set("graft.lease.objectstore.schemes", "mockcond")
    conf.set("graft.lease.conditional.schemes", "mockcond")
    // POISON: if the dispatch ever routed mockcond to the non-atomic
    // branch, its unconditional settle sleep would hang the test — fast
    // completion IS the proof the read-back-verify path never runs
    conf.setLong("graft.lease.settle.ms", 600000L)
    conf.setBoolean("fs.mockcond.impl.disable.cache", true)
    conf
  }

  private def condPath(local: String): Path =
    new Path(new URI("mockcond", null, local, null, null))

  test("conditional-create store: routed to the atomic branch — acquire " +
      "and release never touch the exists-check/verify/settle machinery") {
    val conf = condConf()
    val root = condPath(
      java.nio.file.Files.createTempDirectory("graft_condlease").toString)
    val fs = root.getFileSystem(conf)
    assert(fs.isInstanceOf[MockConditionalStoreFs])
    var bodyRan = false
    val t0 = System.nanoTime()
    Incremental.withRootLease(conf, fs, root, "test index", "A") {
      bodyRan = true
      // a second mutator still fails loudly (create throws atomically)
      val e = intercept[IllegalStateException](
        Incremental.withRootLease(conf, fs, root, "test index", "B") {
          fail("the losing mutator must never reach its body")
        })
      assert(e.getMessage.contains("LEASED"), e.getMessage)
      assert(e.getMessage.contains("holder=A"), e.getMessage)
    }
    assert(bodyRan)
    assert(!fs.exists(new Path(root, "_graft_lease")))
    // well under the poisoned 600 s settle — the verify path never ran
    assert((System.nanoTime() - t0) < 60L * 1000 * 1000 * 1000)
  }

  test("conditional-create store: the overlapping-PUT race loser fails AT " +
      "CREATE TIME — the conditional put closes the race the non-atomic " +
      "branch can only narrow, and the verify never fires") {
    val conf = condConf()
    val root = condPath(
      java.nio.file.Files.createTempDirectory("graft_condrace").toString)
    val fs = root.getFileSystem(conf)
    MockConditionalStoreFs.intrudeOnCreate = true
    try {
      val e = intercept[IllegalStateException](
        Incremental.withRootLease(conf, fs, root, "test index", "C") {
          fail("the race loser must never reach its body")
        })
      assert(e.getMessage.contains("LEASED"), e.getMessage)
      assert(e.getMessage.contains("intruder"), e.getMessage)
      // lost at the create itself, not at a read-back
      assert(e.getCause.isInstanceOf[
        org.apache.hadoop.fs.FileAlreadyExistsException], e.getCause)
      assert(!String.valueOf(e.getCause.getMessage)
        .contains("read-back-verify"), e.getCause.getMessage)
    } finally MockConditionalStoreFs.intrudeOnCreate = false
    // the intruder (winner)'s lease survives the loser's exit untouched
    val lease = new Path(root, "_graft_lease")
    assert(fs.exists(lease))
    val held = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lease.toUri.getPath)), "UTF-8").trim
    assert(held == MockObjectStoreFs.IntruderToken, held)
  }

  test("object-store branch guarded cleanup: a failed PUT must not evict " +
      "a concurrent winner's lease") {
    // drive writeTokenOrCleanUp's failure path on the silent-overwrite
    // store: our close "fails" after the intruder's PUT replaced the
    // object — the cleanup must read back, see a foreign token, and leave
    // the winner's lease in place (orphan handling is breakRootLease's)
    val conf = objConf()
    val root = mockPath(
      java.nio.file.Files.createTempDirectory("graft_objclean").toString)
    val fs = root.getFileSystem(conf)
    MockObjectStoreFs.intrudeOnClose = true
    MockObjectStoreFs.failAfterIntruderPut = true
    try {
      // the close-time PUT failure is NOT an already-exists: it surfaces
      // as itself (withRootLease converts only the lease-held signals)
      val e = intercept[java.io.IOException](
        Incremental.withRootLease(conf, fs, root, "test index", "D") {
          fail("the failed-PUT contender must never reach its body")
        })
      assert(e.getMessage.contains("simulated close failure"), e.getMessage)
    } finally {
      MockObjectStoreFs.intrudeOnClose = false
      MockObjectStoreFs.failAfterIntruderPut = false
    }
    val lease = new Path(root, "_graft_lease")
    assert(fs.exists(lease), "the winner's lease was deleted by the loser")
    val held = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lease.toUri.getPath)), "UTF-8").trim
    assert(held == MockObjectStoreFs.IntruderToken, held)
  }
}
