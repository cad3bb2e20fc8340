package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up executor threads + codegen + parquet footers + the FSM emit
    // path (RowEncoder, broadcast machinery) so the first measured query
    // isn't charged session startup — on the SAME sf dir being benchmarked
    try {
      Tables(spark, sfDir, "events").count()
      SparkEntry.queries("m1_fsm_count")(spark, sfDir).count()
      // build + persist the shared prepared layout OUTSIDE the timed loop —
      // prepare is the amortized one-time step, so the measured
      // m1_fsm_count_prepared time is the per-query cost it buys
      engine.TrckQueries.preparedTrailEvents(spark, sfDir)
    } catch {
      case scala.util.control.NonFatal(e) =>
        // surface it — a silently-skipped warmup re-charges startup cost to
        // the first measured query
        System.err.println(s"[bench] warmup failed: $e")
    }
    val loadStart = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    // a failed query must NOT be timed as a (misleadingly fast) result:
    // record null for its time and list it under "errors"
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write materializes every output column — a bare count() would
      // let Catalyst prune projections and eliminate joins, timing a
      // different (cheaper) plan than the one Verify checks
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (name, Some((System.nanoTime() - t0) / 1e9), None: Option[String])
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          (name, None, Some(e.getClass.getSimpleName))
      }
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // contamination witness: 1-minute load average at start and end of the
    // run. BENCH_r06 recorded 2-10x phantom regressions on untouched
    // queries because concurrent Spark work shared the box; with the load
    // in the artifact itself, an outlier reading can be classified without
    // re-running (idle 32-core box during a bench ~ 10-35, contaminated
    // runs far higher). Start load is sampled before the first query.
    val loadEnd = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${results.count(_._3.isDefined)},"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"sf":"$sfDir"}""")
    spark.stop()
  }
}
