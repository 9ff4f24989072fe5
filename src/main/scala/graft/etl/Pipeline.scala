package graft.etl

import org.apache.spark.sql.DataFrame

import graft.notify.{Notifier, Run}

/** O2/O4/O5/O6: pipeline composition (SURVEY.md §2.7).
  *
  * The reference composes extract → transform → load as Airflow tasks with
  * XCom hand-off (whole DataFrame pickled through the metadata DB between
  * worker processes, `Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:
  * 76-82`). Here stages compose LAZILY into one Catalyst plan — the
  * process boundaries, and both serialization round-trips, disappear
  * (SURVEY.md §3.1-3.2). Retries and outcome notification wrap the single
  * materializing action.
  */
final case class Pipeline(
    name: String,
    extract: () => DataFrame,
    transforms: Seq[DataFrame => DataFrame] = Nil,
    notifier: Notifier = graft.notify.LogNotifier,
    retries: Int = 1,
    retryDelayMs: Long = 0) {

  /** Add a transform stage (still lazy). */
  def transform(t: DataFrame => DataFrame): Pipeline =
    copy(transforms = transforms :+ t)

  /** The composed lazy plan (no execution). */
  def plan(): DataFrame = transforms.foldLeft(extract())((df, t) => t(df))

  /** Execute with a load action; retries + catch→notify→rethrow, success
    * notification with the record count (reference `len(df)` email,
    * `…/BigQuery-to-MySQL-Method-1.py:86`).
    */
  def run(load: DataFrame => Unit): Long =
    Run.withRetry(name, notifier, retries, retryDelayMs) {
      val df = plan()
      load(df)
      Run.notifySuccess(notifier, name, df)
    }
}
