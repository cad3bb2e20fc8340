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
  *
  * Second mode — `runMain graft.TaScaleProbe hot [workDir]` — the
  * ADVERSARIAL arm: one user holds a month-long CONTINUOUS session
  * (hourly events, never a 6h gap → ~121 six-hour buckets) against a
  * purchase-heavy rest-of-corpus. The claims under test: (1) the
  * bucketed join's exact-range refilter keeps the hot session's matched
  * pairs EXACTLY equal to the other-user purchases inside its interval
  * (bucket explosion must not double-count a purchase that lands in one
  * bucket), and (2) the bucket equi-join spreads the hot session's ~121
  * bucket rows across the bucket-key hash slots — no task absorbs the
  * whole session at scale. Measured on the key hash (not
  * spark_partition_id: AQE correctly coalesces the toy-scale join to one
  * task). Two arms: at 1 month (121 buckets over 32 slots) max/mean is
  * balls-in-bins noise (~2.3 measured), so the assertion there is slot
  * COVERAGE — the hot session must touch ≥ 3/4 of the slots; at 12
  * months (1452 buckets) the large-sample balance claim holds and
  * max/mean ≤ 2 is asserted.
  * Prints {"metric":"ta_hot_session_probe",...}.
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

  /** The hot-session adversarial arm (see object doc). */
  private def hotMain(work: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("ta-hot-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val arms = Seq(30L, 360L).map(d => hotArm(spark, s"$work/hot$d", d))
    val commit =
      try scala.sys.process.Process(Seq("git", "describe", "--always", "--dirty")).!!.trim
      catch { case scala.util.control.NonFatal(_) => "unknown" }
    println(
      s"""{"metric":"ta_hot_session_probe","commit":"$commit","arms":[${arms.mkString(",")}]}""")
    spark.stop()
  }

  private def hotArm(spark: org.apache.spark.sql.SparkSession, dir: String,
                     spanDays: Long): String = {
    import org.apache.spark.sql.functions._
    val spanSec = spanDays * 86400L
    // user 0: one event per HOUR for the whole month — never a 6h gap, so
    // ONE continuous session spanning ~121 six-hour buckets
    val hotN = spanSec / 3600L
    val hot = spark.range(hotN).selectExpr(
      "CAST(0 AS BIGINT) AS user_id",
      "id AS event_id",
      "timestamp_seconds(CAST(1700000000 AS BIGINT) + id * 3600) AS ts",
      "'click' AS event_type",
      "CAST(1.0 AS DOUBLE) AS value")
    // users 1..1500: purchase-heavy (80% purchases) at an 8h±4h cadence —
    // every bucket of the month is purchase-dense
    val nUsers = 1500L
    val step = 28800L
    val restN = nUsers * spanSec / step
    val rest = spark.range(restN).selectExpr(
      s"1 + (id % $nUsers) AS user_id",
      s"$hotN + id AS event_id",
      s"timestamp_seconds(CAST(1700000000 AS BIGINT) + (id div $nUsers) * $step" +
        s" + pmod(id * 2654435761, 28801) - 14400) AS ts",
      "CASE WHEN id % 5 = 0 THEN 'click' ELSE 'purchase' END AS event_type",
      "CAST(1.0 AS DOUBLE) AS value")
    hot.unionByName(rest).write.mode("overwrite").parquet(s"$dir/events.parquet")

    Tables(spark, dir, "events").count()
    val t0 = System.nanoTime()
    SparkEntry.queries("ta_session_overlap")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9

    val e = Tables.events(spark, dir)
    val sess = graft.queries.TrailAnalytics.sessions(e)
      .select("user_id", "session_id", "start_sec", "end_sec")
    // claim 0: user 0 really is ONE month-long session
    val hotSess = sess.filter(col("user_id") === 0L).collect()
    require(hotSess.length == 1,
      s"hot-session synth broke: user 0 has ${hotSess.length} sessions, wanted 1")
    val (hs, he) = (hotSess(0).getAs[Long]("start_sec"), hotSess(0).getAs[Long]("end_sec"))
    val hotBuckets = he / 21600L - hs / 21600L + 1
    // claim 1: the bucketed join + exact refilter matches EXACTLY the
    // other-user purchases inside [start, end] — no bucket double-count
    val buckets = sess.withColumn("bucket",
      explode(sequence(expr("start_sec div 21600"), expr("end_sec div 21600"))))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_sec").as("p_sec"),
        expr("ts_sec div 21600").as("p_bucket"))
    val joined = buckets.join(p,
      col("bucket") === col("p_bucket") &&
        col("p_sec").between(col("start_sec"), col("end_sec")) &&
        col("p_user") =!= col("user_id"))
    val hotPairs = joined.filter(col("user_id") === 0L).count()
    val truth = e.filter(col("event_type") === "purchase" &&
      col("user_id") =!= 0L && col("ts_sec").between(hs, he)).count()
    require(hotPairs == truth,
      s"refilter drift: hot session matched $hotPairs pairs vs $truth purchases in-interval")
    // claim 2: the bucket equi-join spreads the session — no task absorbs
    // it at scale. Measured on the bucket-key HASH distribution (32
    // slots): at toy scale AQE correctly coalesces the few-MB join
    // inputs into one task, so spark_partition_id() is vacuous — at
    // production scale the hash slots ARE the tasks. Gate by regime:
    // slot COVERAGE of the hot session always (its buckets must not pile
    // up), max/mean ≤ 2 only in the large-sample regime (≥ 1000 buckets)
    // where balls-in-bins noise has died down (at 121 buckets / 32 slots
    // the NOISE maximum is ~2.3× mean — measured, not operator skew).
    val parts = joined.groupBy(expr("pmod(hash(bucket), 32)")).count()
      .collect().map(_.getLong(1))
    val meanP = parts.sum.toDouble / parts.length
    val maxOverMean = parts.max / meanP
    val hotSlots = joined.filter(col("user_id") === 0L)
      .select(expr("pmod(hash(bucket), 32)")).distinct().count()
    require(hotSlots >= 24,
      s"hot session piled into $hotSlots/32 bucket-hash slots - wanted >= 24")
    if (hotBuckets >= 1000)
      require(maxOverMean <= 2.0,
        f"hot-session skew at $spanDays days: max bucket-hash slot ${parts.max} = " +
          f"$maxOverMean%.2f x mean $meanP%.0f over ${parts.length} slots")
    def r2(v: Double) = math.round(v * 100) / 100.0
    s"""{"span_days":$spanDays,"hot_session_buckets":$hotBuckets,""" +
      s""""hot_pairs":$hotPairs,"purchases_in_interval":$truth,""" +
      s""""total_pairs":${joined.count()},"hot_slots":$hotSlots,""" +
      s""""max_over_mean":${r2(maxOverMean)},"overlap_query_sec":${r2(sec)}}"""
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("hot")) {
      hotMain(args.lift(1).getOrElse("/tmp/graft_ta_hot")); return
    }
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
