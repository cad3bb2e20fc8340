package graft

/** Repeated-measurement timer for individual registered queries: runs each
  * named query `reps` times (after one untimed warm pass) and prints
  * per-rep times, so sub-second bench deltas can be separated from the
  * box's run-to-run variance before anyone "fixes" noise.
  *
  * Usage: runMain graft.TimeQueries <sfDir> <reps> <query>...
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("time-queries").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, dir, "events").count()
    engine.TrckQueries.preparedTrailEvents(spark, dir)
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      s""""$name":[${ts.map(t => math.round(t * 1000) / 1000.0).mkString(",")}]"""
    }
    println(out.mkString("""{"metric":"time_queries","sf":"""" + dir + "\",", ",", "}"))
    spark.stop()
  }
}
