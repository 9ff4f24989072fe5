package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer startup otherwise lands on
    // whichever query happens to run first, skewing its number by ~3 s
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter("l_orderkey > 0").groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
    // noop-sink write: executes the FULL plan (projections, sorts, every
    // output column) — `.count()` let Catalyst prune all columns and
    // eliminate sorts, so projection-heavy queries timed a row-count scan
    // (round-1 verdict item 4).
    // Two samples per query, report the min: this box's co-tenant stalls
    // inflated single-sample r8 numbers ~2.9× uniformly; min-of-2 separates
    // plan cost from box noise. A FAILED query reports in "errors", never
    // as a timing — r8's 16 broken queries looked like 0.05 s successes.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    val sampled = SparkEntry.queries.map { case (name, fn) =>
      val a = once(fn)
      val b = if (a.isRight) once(fn) else a
      name -> (a, b)
    }
    val results = sampled.collect { case (n, (Right(a), Right(b))) => n -> math.min(a, b) }
    val errors = sampled.collect { case (n, (Left(e), _)) => n -> e }
    errors.foreach { case (n, e) => System.err.println(s"[bench] $n FAILED: $e") }
    // 3-decimal seconds keep the line short: the driver captures a bounded
    // tail of stdout, and full-precision doubles for ~80 queries overflowed
    // it (BENCH_r05 lost 14 queries' numbers to truncation)
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, e) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // print AFTER the session shuts down so no stop() log lines interleave
    // with (or push out) the one JSON line the driver parses
    spark.stop()
    val json = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    // BENCH_LOCAL.json additionally carries both raw samples per query so
    // the per-round history can distinguish plan cost from box noise
    val samplesJson = sampled.map { case (k, (a, b)) =>
      val render = (s: Either[String, Double]) => s.fold(jstr, f)
      s"\"" + k + "\":[" + render(a) + "," + render(b) + "]"
    }.mkString("{", ",", "}")
    // noise_ratio = max/min of the two samples per query: >~2 means a
    // co-tenant stall hit one sample, not that the plan is slow — lets a
    // reader separate stalls from plan cost at a glance (the r9 verdict's
    // events_json_agg case: samples [8.14, 1.59] = ratio 5.1, plan fine)
    val noiseJson = sampled.collect { case (k, (Right(a), Right(b))) =>
      val ratio = if (math.min(a, b) > 0) math.max(a, b) / math.min(a, b) else 1.0
      s"\"" + k + "\":" + f(ratio)
    }.mkString("{", ",", "}")
    val localJson = json.dropRight(1) +
      s""","samples":$samplesJson,"noise_ratio":$noiseJson}"""
    // the driver captures a BOUNDED stdout tail (r5 lost 14 per-query
    // numbers, r6 lost 18) — also write the record into the repo so the
    // full per-query history survives regardless of capture truncation
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), localJson + "\n")
    catch { case _: Throwable => () }
    println(json)
  }
}
