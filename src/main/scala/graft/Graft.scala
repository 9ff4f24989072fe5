package graft

import org.apache.spark.sql.SparkSession

/** Library front door: a SparkSession wired the way the engine expects —
  * UTC session time, AQE on, graft SQL functions registered, sane local
  * shuffle parallelism. A reference user switching to this library starts
  * here (MIGRATION.md).
  */
object Graft {

  def sessionBuilder(master: String = "local[*]", shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .withExtensions(new GraftExtensions)
    shufflePartitions.fold(b)(n => b.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Build (or reuse) the session and ensure graft SQL functions exist even
    * when an earlier session was created without the extensions.
    */
  def session(master: String = "local[*]", shufflePartitions: Option[Int] = None): SparkSession = {
    val s = sessionBuilder(master, shufflePartitions).getOrCreate()
    GraftFunctions.register(s)
    s
  }
}
