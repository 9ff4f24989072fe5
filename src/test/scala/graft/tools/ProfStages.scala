package graft.tools
import scala.collection.mutable
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
/** Dev profiling: per-stage metrics (run/cpu/gc time, shuffle bytes) for
  * declared queries. Test/runMain graft.tools.ProfStages <query>...
  */
object ProfStages {
  private final class Tally extends SparkListener {
    case class S(name: String, tasks: Int, wallMs: Long, runMs: Long,
        cpuMs: Long, gcMs: Long, deserMs: Long, srBytes: Long, swBytes: Long)
    val stages = mutable.ArrayBuffer[S]()
    var enabled = false
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (enabled) {
      val si = e.stageInfo; val m = si.taskMetrics
      val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(0L)
      stages += S(si.name.take(60), si.numTasks, wall, m.executorRunTime,
        m.executorCpuTime / 1000000, m.jvmGCTime, m.executorDeserializeTime,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
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
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()
    args.toSeq.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        tally.stages.clear(); tally.enabled = true
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        tally.enabled = false; Thread.sleep(300)
        val ss = tally.stages.toSeq
        println(f"PROFSTAGES $name%-26s run$i wall=$wall%7.2f s stages=${ss.size}%3d " +
          f"stageWall=${ss.map(_.wallMs).sum / 1e3}%7.2f run=${ss.map(_.runMs).sum / 1e3}%8.2f " +
          f"cpu=${ss.map(_.cpuMs).sum / 1e3}%8.2f gc=${ss.map(_.gcMs).sum / 1e3}%6.2f " +
          f"deser=${ss.map(_.deserMs).sum / 1e3}%6.2f")
        if (i == reps) ss.foreach { s =>
          println(f"  ${s.wallMs / 1e3}%7.3f s tasks=${s.tasks}%4d run=${s.runMs / 1e3}%8.3f " +
            f"cpu=${s.cpuMs / 1e3}%8.3f gc=${s.gcMs / 1e3}%6.3f deser=${s.deserMs / 1e3}%6.3f " +
            f"sr=${s.srBytes}%9d sw=${s.swBytes}%9d  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
