package graft

/** Span-scaled probe for the trail-analytics interval join: the shared
  * ScaleProbe replicates the corpus INTO the same 30-day window, so
  * `ta_session_overlap`'s matched pairs grow ×mult² there (per-interval
  * purchase density ×mult — the replica construction, not the operator)
  * and its 100× arm is excluded by the ≤10× policy. Production growth is
  * longitudinal: a trail store gets bigger mostly because time passes, at
  * a roughly constant event RATE — under which per-interval density is
  * constant and matched pairs grow LINEARLY. This probe synthesizes that
  * posture directly: id-derived deterministic events at a fixed per-user
  * cadence (8h ± jittered, so the 6h session gap splits trails
  * constantly), span ×mult between arms, and reports wall + the exact
  * matched-pair count so the linearity claim is measured, not argued.
  *
  * Usage: runMain graft.TaScaleProbe [mult] [workDir]
  * Prints one JSON line {"metric":"ta_span_probe",...}.
  */
object TaScaleProbe {

  private def gen(spark: org.apache.spark.sql.SparkSession, dir: String,
                  spanDays: Long): Long = {
    val nUsers = 1500L
    val step = 28800L // 8h cadence; jitter ±4h -> gaps in [0, 16h], 6h gap splits live
    val n = nUsers * spanDays * 86400L / step
    spark.range(n).selectExpr(
      s"id % $nUsers AS user_id",
      "id AS event_id",
      s"timestamp_seconds(CAST(1700000000 AS BIGINT) + (id div $nUsers) * $step" +
        s" + pmod(id * 2654435761, 28801) - 14400) AS ts",
      "CASE WHEN id % 5 = 0 THEN 'purchase' ELSE 'click' END AS event_type",
      "CAST(1.0 AS DOUBLE) AS value",
    ).write.mode("overwrite").parquet(s"$dir/events.parquet")
    n
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val work = args.lift(1).getOrElse("/tmp/graft_ta_span")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("ta-span-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def arm(tag: String, spanDays: Long): (Long, Double, Long, Long) = {
      val dir = s"$work/$tag"
      val n = gen(spark, dir, spanDays)
      // warm the scan, then time the registered query (noop protocol)
      Tables(spark, dir, "events").count()
      val t0 = System.nanoTime()
      SparkEntry.queries("ta_session_overlap")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // exact matched-pair mass (the quantity whose growth law is at issue)
      val e = Tables.events(spark, dir)
      val sess = graft.queries.TrailAnalytics.sessions(e)
        .select("user_id", "session_id", "start_sec", "end_sec")
      val buckets = sess.withColumn("bucket",
        explode(sequence(expr("start_sec div 21600"), expr("end_sec div 21600"))))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_sec").as("p_sec"),
          expr("ts_sec div 21600").as("p_bucket"))
      val pairs = buckets
        .join(p, col("bucket") === col("p_bucket") &&
          col("p_sec").between(col("start_sec"), col("end_sec")) &&
          col("p_user") =!= col("user_id"))
        .count()
      val nSess = sess.count()
      (n, sec, pairs, nSess)
    }

    val (nB, secB, pairsB, sessB) = arm("base", 30L)
    val (nS, secS, pairsS, sessS) = arm("scaled", 30L * mult)
    def r2(v: Double) = math.round(v * 100) / 100.0
    val commit =
      try scala.sys.process.Process(Seq("git", "describe", "--always", "--dirty")).!!.trim
      catch { case scala.util.control.NonFatal(_) => "unknown" }
    val json =
      s"""{"metric":"ta_span_probe","commit":"$commit","mult":$mult,""" +
        s""""base":{"events":$nB,"sessions":$sessB,"pairs":$pairsB,"sec":${r2(secB)}},""" +
        s""""scaled":{"events":$nS,"sessions":$sessS,"pairs":$pairsS,"sec":${r2(secS)}},""" +
        s""""pairs_ratio":${r2(pairsS.toDouble / math.max(pairsB, 1))},""" +
        s""""wall_ratio":${r2(secS / math.max(secB, 0.001))}}"""
    println(json)
    spark.stop()
  }
}
