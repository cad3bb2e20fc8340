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
    } catch {
      case scala.util.control.NonFatal(e) =>
        // surface it — a silently-skipped warmup re-charges startup cost to
        // the first measured query
        System.err.println(s"[bench] warmup failed: $e")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write materializes every output column — a bare count() would
      // let Catalyst prune projections and eliminate joins, timing a
      // different (cheaper) plan than the one Verify checks
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
