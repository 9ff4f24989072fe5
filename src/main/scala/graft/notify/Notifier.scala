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
