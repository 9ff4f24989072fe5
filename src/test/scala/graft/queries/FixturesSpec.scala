package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-memo contract (r18): index-fixture builders NEST — the rebuilt
  * IVF-PQ generation's builder materializes the maintained-root fixture it
  * rebuilds FROM — so the in-JVM memo must tolerate a dir() call inside a
  * dir() build on COLD keys. The former computeIfAbsent memo threw
  * IllegalStateException("Recursive update") there, which only ever
  * surfaced on a machine with no on-disk fixtures (the ×10 r18 gate).
  */
class FixturesSpec extends AnyFunSuite {

  test("IndexFixture.dir tolerates nested builds on cold keys and memoizes " +
      "both levels") {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    var innerBuilds = 0
    var outerBuilds = 0
    def inner(): String =
      Fixtures.IndexFixture.dir(s"spec_inner_$nonce", s"/spec/$nonce") { tmp =>
        innerBuilds += 1
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(tmp, "inner.txt"), "inner")
      }
    val outer =
      Fixtures.IndexFixture.dir(s"spec_outer_$nonce", s"/spec/$nonce") { tmp =>
        outerBuilds += 1
        // the nested cold-key call that used to throw "Recursive update"
        val in = inner()
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(in, "inner.txt"),
          java.nio.file.Paths.get(tmp, "copied.txt"))
      }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(outer, "copied.txt")))
    assert(outerBuilds == 1 && innerBuilds == 1)
    // both levels memoized: repeat calls re-run no builder
    assert(inner() == inner())
    assert(Fixtures.IndexFixture.dir(s"spec_outer_$nonce", s"/spec/$nonce") {
      _ => fail("memoized fixture must not rebuild") } == outer)
    assert(outerBuilds == 1 && innerBuilds == 1)
    // the nonce makes these dirs single-use (never reused like the real
    // fixtures) — delete them instead of accreting two per test run
    Seq(outer, inner()).foreach { d =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(x => java.nio.file.Files.deleteIfExists(x))
    }
  }
}
