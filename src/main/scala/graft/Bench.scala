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
    // adaptive third sample: when the first two disagree by >1.5× one of
    // them was a cold-path / co-tenant artifact (first-use codegen, index
    // fixture build, box stall) — a third draw separates the plan's real
    // cost from the one-off (r10 verdict item 3: text_bm25_persisted
    // recorded 2.98 s cold vs 1.27 s warm; min-of-2 still kept the
    // contaminated pair's spread in noise_ratio)
    val sampled: Map[String, List[Either[String, Double]]] =
      SparkEntry.queries.map { case (name, fn) =>
        val a = once(fn)
        val b = if (a.isRight) once(fn) else a
        val two = List(a, b)
        val noisy = (for { x <- a.toOption; y <- b.toOption }
          yield math.max(x, y) / math.max(math.min(x, y), 1e-9) > 1.5).getOrElse(false)
        name -> (if (noisy) two :+ once(fn) else two)
      }
    val results = sampled.collect {
      case (n, ss) if ss.forall(_.isRight) =>
        n -> ss.flatMap(_.toOption).min
    }
    val errors = sampled.collect {
      case (n, ss) if ss.exists(_.isLeft) =>
        n -> ss.collectFirst { case Left(e) => e }.get
    }
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
    // BENCH_LOCAL.json additionally carries every raw sample per query so
    // the per-round history can distinguish plan cost from box noise
    val samplesJson = sampled.map { case (k, ss) =>
      val render = (s: Either[String, Double]) => s.fold(jstr, f)
      s"\"" + k + "\":[" + ss.map(render).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // noise_ratio = second-smallest / smallest over the retained samples:
    // how reproducible the REPORTED (min) timing is. With the adaptive
    // third sample above, a single cold/stalled draw no longer inflates
    // the ratio — two clean draws exist to agree with each other (the r9
    // events_json_agg case: samples [8.14, 1.59] = ratio 5.1, plan fine)
    val noiseJson = sampled.collect {
      case (k, ss) if ss.forall(_.isRight) =>
        val sorted = ss.flatMap(_.toOption).sorted
        val ratio = if (sorted.head > 0) sorted(1) / sorted.head else 1.0
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
