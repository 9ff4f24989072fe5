package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (test scope only): runs declared queries at the
  * bench config and prints a PER-JOB breakdown — wall time, stage/task
  * counts, summed task time — so job-count overhead (scheduling, eager
  * checkpoints, driver actions) separates from real executor compute.
  * Usage: `Test/runMain graft.tools.ProfJobs <query> [<query>...]`
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_PROF_REPS).
  */
object ProfJobs {
  private final class JobTally extends SparkListener {
    case class Job(var desc: String, var submitted: Long = 0L,
        var completed: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var taskTimeMs: Long = 0L)
    // the listener bus mutates on its own thread while main clears/reads:
    // every access goes through `lock`, and `enabled` is volatile so the
    // bus thread sees the per-rep flip promptly
    private val lock = new Object
    val jobs = mutable.LinkedHashMap[Int, Job]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    @volatile var enabled = false
    def clear(): Unit = lock.synchronized { jobs.clear(); stageToJob.clear() }
    def snapshot(): Seq[(Int, Job)] = lock.synchronized { jobs.toSeq.map {
      case (id, j) => (id, j.copy()) } }
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) lock.synchronized {
      val j = Job(Option(e.properties).map { p =>
        Seq("spark.job.description", "callSite.short")
          .flatMap(k => Option(p.getProperty(k))).mkString(" | ")
      }.getOrElse(""))
      j.submitted = e.time
      j.stages = e.stageIds.size
      jobs(e.jobId) = j
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = lock.synchronized {
      jobs.get(e.jobId).foreach(_.completed = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += 1
        if (e.taskInfo != null) j.taskTimeMs += e.taskInfo.duration
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)

    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()

    args.toSeq.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        tally.clear(); tally.enabled = true
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        tally.enabled = false
        // settle: async job-end events race the action's return
        Thread.sleep(200)
        val js = tally.snapshot()
        val jobWall = js.map(j => math.max(0L, j._2.completed - j._2.submitted)).sum / 1e3
        val persisted = spark.sparkContext.getPersistentRDDs.size
        println(f"PROFJOBS $name%-28s run$i wall=$wall%7.2f s jobs=${js.size}%3d " +
          f"jobWall=$jobWall%7.2f s gap=${wall - jobWall}%6.2f s persistedRDDs=$persisted")
        js.foreach { case (id, j) =>
          val d = math.max(0L, j.completed - j.submitted) / 1e3
          println(f"  job$id%-4d ${d}%7.3f s stages=${j.stages}%3d tasks=${j.tasks}%4d " +
            f"taskSum=${j.taskTimeMs / 1e3}%8.3f s  ${j.desc.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
