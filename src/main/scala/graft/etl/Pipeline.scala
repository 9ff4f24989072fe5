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

object Pipeline {

  /** Single-pass per-stage row metrics via Spark's `Observation` API: each
    * stage's output is wrapped in `observe(count)`, the composed plan runs
    * ONCE under `action`, and every stage's row count is harvested from
    * the observation listeners afterwards — zero extra passes.
    *
    * The reference (and its naive Spark port) answers "how many rows
    * survived each task?" with one `count()` action per stage — N extra
    * full evaluations of ever-longer plan prefixes. `observe` attaches
    * accumulator-backed metrics to the one materializing action instead,
    * which is the difference between O(stages × scan) and O(scan) on a
    * 100 TB input.
    *
    * Returns (stageName → rows) in stage order plus the final DataFrame's
    * completed action result.
    */
  def observedStages[A](
      stages: Seq[(String, DataFrame => DataFrame)],
      input: DataFrame)(action: DataFrame => A): (Seq[(String, Long)], A) = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    // a duplicate stage name would silently collapse to ONE Observation
    // attached to two observe() calls — which fails at runtime
    // (Observation is single-use) or reports the wrong stage's count
    require(stages.map(_._1).distinct.size == stages.size,
      s"observedStages requires unique stage names: ${stages.map(_._1)}")
    val observations = stages.map { case (n, _) => n -> Observation(s"graft_$n") }.toMap
    val composed = stages.foldLeft(input) { case (df, (n, t)) =>
      t(df).observe(observations(n), count(lit(1)).as("n_rows"))
    }
    val result = action(composed)
    val metrics = stages.map { case (n, _) =>
      n -> observations(n).get("n_rows").asInstanceOf[Long]
    }
    (metrics, result)
  }
}
