package graft

/** Ad-hoc single-query runner: `runMain graft.QueryProbe <name>...` counts
  * each named registered query against `PROBE_DIR` (default sf0.1) — the
  * quick way to exercise one query at bench scale (e.g. checking a new
  * fail-loud guard doesn't trip on the real corpus) without a full
  * Verify/Bench pass.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val ss = GraftSession.builder("16").appName("query-probe").getOrCreate()
    ss.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(ss, sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")).count()
        println(f"PROBE $q rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      } catch {
        case e: Throwable => println(s"PROBE $q FAILED: ${e.getMessage}")
      }
    }
    ss.stop()
  }
}
