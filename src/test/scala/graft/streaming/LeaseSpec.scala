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
      override def close(): Unit = {
        super.close()
        // a concurrent PUT lands right after ours on the same key
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f.toUri.getPath),
          MockObjectStoreFs.IntruderToken)
      }
    }, null)
}

object MockObjectStoreFs {
  @volatile var intrudeOnClose: Boolean = false
  val IntruderToken = "holder=intruder pid=0 nonce=fixed"
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
}
