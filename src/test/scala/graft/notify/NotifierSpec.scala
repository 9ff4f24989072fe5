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

  class RecordingMail extends MailTransport {
    var sent = List.empty[(SmtpConfig, String)]
    def send(c: SmtpConfig, m: String): Unit = sent ::= (c, m)
  }

  private val cfg = SmtpConfig("mail.host.test", 25,
    from = "etl@host.test", to = Seq("ops@host.test", "team@host.test"))
  private val fixedClock = () => java.time.Instant.parse("2026-08-12T00:00:00Z")

  test("O5 SMTP: success email renders recipient envelope, subject, and record count") {
    val mail = new RecordingMail
    new SmtpNotifier(cfg, mail, fixedClock).success("orders_daily", 15000L)
    val (c, msg) = mail.sent.head
    assert(c == cfg)
    val lines = msg.split("\r\n")
    assert(lines.contains("From: etl@host.test"))
    assert(lines.contains("To: ops@host.test, team@host.test"))
    assert(lines.contains("Subject: [graft] orders_daily succeeded"))
    assert(lines.contains("Date: Wed, 12 Aug 2026 00:00:00 GMT"))
    assert(msg.contains("Records loaded: 15000"))
    // headers separated from body by exactly one blank line
    assert(msg.contains("charset=utf-8\r\n\r\nPipeline orders_daily"))
  }

  test("O6 SMTP: failure email carries error class and message") {
    val mail = new RecordingMail
    new SmtpNotifier(cfg, mail, fixedClock)
      .failure("orders_daily", new IllegalStateException("target unreachable"))
    val msg = mail.sent.head._2
    assert(msg.contains("Subject: [graft] orders_daily FAILED"))
    assert(msg.contains("Error: java.lang.IllegalStateException: target unreachable"))
  }

  test("O6: catch -> notify -> raise wiring composes with the SMTP notifier") {
    val mail = new RecordingMail
    val n = new SmtpNotifier(cfg, mail, fixedClock)
    intercept[RuntimeException] {
      Run.withRetry("p", n, retries = 0) { throw new RuntimeException("boom") }
    }
    assert(mail.sent.size == 1 && mail.sent.head._2.contains("FAILED"))
  }
}
