package graft

/** Ad-hoc single-query runner: `runMain graft.QueryProbe <name>...` counts
  * each named registered query against `PROBE_DIR` (default sf0.1) — the
  * quick way to exercise one query at bench scale (e.g. checking a new
  * fail-loud guard doesn't trip on the real corpus) without a full
  * Verify/Bench pass.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val ss = GraftSession.builder(cpus).appName("query-probe").getOrCreate()
    ss.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(ss, sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")).count()
        println(f"PROBE $q rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      } catch {
        // NonFatal only: an OOM must abort, not leave a corrupted JVM
        // timing the remaining queries (the same fix ScaleProbe got)
        case scala.util.control.NonFatal(e) => println(s"PROBE $q FAILED: ${e.getMessage}")
      }
    }
    ss.stop()
  }
}
