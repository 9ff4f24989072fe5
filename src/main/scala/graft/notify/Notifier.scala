package graft.notify

import org.apache.spark.sql.SparkSession

/** O5/O6: pipeline outcome notification (SURVEY.md §2.7).
  *
  * The reference emails on every success (with record count) and every
  * failure via raw smtplib (`Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:35-46`,
  * calls at :61,86-88). Here notification is a trait: the engine reports
  * through whatever impl is plugged in; [[LogNotifier]] is the default (no
  * SMTP egress in this environment), and the run wrapper reproduces
  * catch → notify → rethrow (O6).
  */
trait Notifier {
  def success(pipeline: String, records: Long): Unit
  def failure(pipeline: String, error: Throwable): Unit
}

object LogNotifier extends Notifier {
  def success(pipeline: String, records: Long): Unit =
    Console.err.println(s"[graft] $pipeline succeeded: $records records")
  def failure(pipeline: String, error: Throwable): Unit =
    Console.err.println(s"[graft] $pipeline FAILED: ${error.getMessage}")
}

/** SMTP connection/envelope settings. `user` empty ⇒ no AUTH (the
  * reference's open relay); `ssl` ⇒ implicit TLS (port 465 style).
  */
case class SmtpConfig(
    host: String,
    port: Int = 25,
    from: String = "",
    to: Seq[String] = Nil,
    user: String = "",
    password: String = "",
    ssl: Boolean = false)

/** Transport seam below [[SmtpNotifier]]: delivery of one rendered RFC-5322
  * message to the config's recipients. Tests inject a recorder; production
  * uses [[SocketMailTransport]].
  */
trait MailTransport {
  def send(config: SmtpConfig, message: String): Unit
}

/** Raw-socket SMTP client (JDK-only — HELO/AUTH LOGIN/MAIL FROM/RCPT
  * TO/DATA with dot-stuffing), the counterpart of the reference's bare
  * `smtplib.SMTP` usage (`Template-to-MySQL/BigQuery-to-MySQL-Method-1
  * .py:41-46`). Cannot be exercised in this zero-egress harness; every
  * rendering/notification decision lives above the [[MailTransport]] seam
  * where NotifierSpec covers it.
  */
object SocketMailTransport extends MailTransport {
  override def send(config: SmtpConfig, message: String): Unit = {
    val socket =
      if (config.ssl)
        javax.net.ssl.SSLSocketFactory.getDefault.createSocket(config.host, config.port)
      else new java.net.Socket(config.host, config.port)
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(socket.getInputStream, "UTF-8"))
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8"))
      def expect(codes: Int*): Unit = {
        var line = in.readLine()
        while (line != null && line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        val code = if (line != null && line.length >= 3) line.take(3).toInt else -1
        if (!codes.contains(code)) throw new java.io.IOException(s"SMTP: unexpected '$line'")
      }
      def cmd(s: String, codes: Int*): Unit = {
        out.write(s); out.write("\r\n"); out.flush(); expect(codes: _*)
      }
      val b64 = java.util.Base64.getEncoder
      expect(220)
      cmd(s"EHLO graft", 250)
      if (config.user.nonEmpty) {
        cmd("AUTH LOGIN", 334)
        cmd(b64.encodeToString(config.user.getBytes("UTF-8")), 334)
        cmd(b64.encodeToString(config.password.getBytes("UTF-8")), 235)
      }
      cmd(s"MAIL FROM:<${config.from}>", 250)
      config.to.foreach(rcpt => cmd(s"RCPT TO:<$rcpt>", 250, 251))
      cmd("DATA", 354)
      // dot-stuff body lines per RFC 5321 §4.5.2
      val stuffed = message.replace("\r\n", "\n").split("\n", -1)
        .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
      out.write(stuffed); out.write("\r\n.\r\n"); out.flush(); expect(250)
      cmd("QUIT", 221)
    } finally socket.close()
  }
}

/** O5 physical: email notification — the reference emails every success
  * (with the loaded record count) and every failure
  * (`Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:35-46`, calls at
  * :61,86-88). Rendering is deterministic given `clock` (injectable for
  * tests).
  */
class SmtpNotifier(
    config: SmtpConfig,
    transport: MailTransport = SocketMailTransport,
    clock: () => java.time.Instant = () => java.time.Instant.now()) extends Notifier {

  private[notify] def render(subject: String, body: String): String = {
    val date = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC).format(clock())
    Seq(
      s"From: ${config.from}",
      s"To: ${config.to.mkString(", ")}",
      s"Subject: $subject",
      s"Date: $date",
      "MIME-Version: 1.0",
      "Content-Type: text/plain; charset=utf-8",
      "",
      body).mkString("\r\n")
  }

  override def success(pipeline: String, records: Long): Unit =
    transport.send(config, render(
      s"[graft] $pipeline succeeded",
      s"Pipeline $pipeline completed successfully.\nRecords loaded: $records\n"))

  override def failure(pipeline: String, error: Throwable): Unit =
    transport.send(config, render(
      s"[graft] $pipeline FAILED",
      s"Pipeline $pipeline failed.\nError: ${error.getClass.getName}: ${error.getMessage}\n"))
}

object Run {
  /** O4/O6: retrying run wrapper — reference `retries: 1,
    * retry_delay: 5 min` (`…/BigQuery-to-MySQL-Method-1.py:13-19`) with
    * catch → notify → raise semantics.
    */
  def withRetry[T](pipeline: String, notifier: Notifier, retries: Int = 1, delayMs: Long = 0)(
      body: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try return body
      catch {
        case e: Throwable =>
          last = e
          notifier.failure(pipeline, e)
          attempt += 1
          if (attempt <= retries && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw last
  }

  /** Success-count notification: the reference emails `len(df)`
    * (`…/BigQuery-to-MySQL-Method-1.py:86`) → `df.count()`.
    */
  def notifySuccess(notifier: Notifier, pipeline: String, df: org.apache.spark.sql.DataFrame): Long = {
    val n = df.count()
    notifier.success(pipeline, n)
    n
  }
}
