package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query cost decomposition at tiny/bench scale, where wall-clock is a
  * mix of driver-side planning (re-paid on EVERY invocation — the query
  * functions build a fresh DataFrame each call) and actual cluster work.
  * For each named query prints:
  *
  *   plan_s  — DataFrame construction + analysis + optimizedPlan +
  *             executedPlan (no jobs run)
  *   exec_s  — min over `reps` warm noop-sink executions (each one re-plans
  *             too, so exec_s includes plan_s; the delta is the cluster part)
  *   jobs/stages/tasks — counts for ONE execution (scheduling overhead is
  *             ~tens of ms per stage at local[32], so stage count is often
  *             the whole story for sub-second queries)
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <reps> <query>...
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("profile-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, dir, "events").count()
    engine.TrckQueries.preparedTrailEvents(spark, dir)
    engine.TrckQueries.durableTrailEvents(spark, dir).count()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      // planning-only pass: force analysis + optimization + physical plan
      val tp0 = System.nanoTime()
      val df = fn(spark, dir)
      df.queryExecution.executedPlan // forces the whole planning chain
      val planS = (System.nanoTime() - tp0) / 1e9
      // one counted execution
      Thread.sleep(200) // let the listener bus drain the warm pass
      val (j0, s0, t0) = (jobs.get(), stages.get(), tasks.get())
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
      val (j1, s1, t1) = (jobs.get(), stages.get(), tasks.get())
      // min-of-reps warm executions
      val ts = (0 until reps).map { _ =>
        val e0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - e0) / 1e9
      }
      println(f"PROFILE $name%-28s plan=${planS}%6.3f exec_min=${ts.min}%6.3f " +
        f"reps=[${ts.map(t => f"$t%.3f").mkString(",")}] jobs=${j1 - j0} stages=${s1 - s0} tasks=${t1 - t0}")
    }
    spark.stop()
  }
}
