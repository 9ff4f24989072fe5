package graft.notify

import org.scalatest.funsuite.AnyFunSuite

class NotifierSpec extends AnyFunSuite {

  class Recording extends Notifier {
    var successes = List.empty[(String, Long)]
    var failures = List.empty[String]
    def success(p: String, n: Long): Unit = successes ::= (p, n)
    def failure(p: String, e: Throwable): Unit = failures ::= e.getMessage
  }

  test("O4/O6: retry wrapper retries then rethrows, notifying each failure") {
    val n = new Recording
    var attempts = 0
    val e = intercept[RuntimeException] {
      Run.withRetry("p", n, retries = 1) { attempts += 1; throw new RuntimeException(s"boom$attempts") }
    }
    assert(attempts == 2)
    assert(e.getMessage == "boom2")
    assert(n.failures.toSet == Set("boom1", "boom2"))
  }

  test("O4: success on retry returns the value") {
    val n = new Recording
    var attempts = 0
    val out = Run.withRetry("p", n, retries = 2) {
      attempts += 1
      if (attempts < 2) throw new RuntimeException("flaky")
      42
    }
    assert(out == 42 && attempts == 2)
    assert(n.failures.size == 1)
  }
}
