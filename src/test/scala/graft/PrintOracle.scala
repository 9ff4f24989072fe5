package graft

/** Dev helper: print ONE declared query's oracle SQL —
  * `sbt "Test/runMain graft.PrintOracle <name>"` — for ad-hoc DuckDB
  * checks without a full Verify sweep.
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(SparkEntry.oracleSql(args(0)))
}
