package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, SparkEntry, Tables}

/** Trail-analytics semantics pinned on hand fixtures: the session-boundary
  * rule (STRICTLY more than the gap splits; exactly the gap does not), the
  * as-of join's at-or-before + unique-id tie-break + lookback contract, the
  * interval join's zero-overlap retention and same-user exclusion, and
  * whole-corpus invariants on the registered queries (sessions partition
  * the event set; attribution conserves purchases and revenue).
  */
class TrailAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("trail-analytics-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  /** events-shaped frame: (user_id, ts_sec, event_id, event_type). */
  private def eventsOf(rows: (Long, Long, Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts_sec", "event_id", "event_type")
  }

  test("session boundary: strictly-greater-than-gap splits, equal gap does not") {
    val gap = TrailAnalytics.GapSec
    val e = eventsOf(
      (1L, 1000L, 1L, "click"),
      (1L, 1000L + gap, 2L, "view"),          // exactly gap later: same session
      (1L, 1000L + gap + gap + 1, 3L, "purchase"), // gap+1 later: new session
      (2L, 5000L, 4L, "click"),                // second user: own numbering
    )
    val got = TrailAnalytics
      .sessions(e)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("start_sec"), r.getAs[Long]("end_sec"), r.getAs[Long]("n_purchases")))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 1000L, 1000L + gap, 0L),
      (1L, 2L, 1L, 1000L + 2 * gap + 1, 1000L + 2 * gap + 1, 1L),
      (2L, 1L, 1L, 5000L, 5000L, 0L),
    ), got.mkString(", "))
  }

  test("asOfJoin: at-or-before match, unique-id tie-break, lookback null, no-match null") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 70L, 11L), (2L, 100L, 12L), (3L, 100L, 13L))
      .toDF("user_id", "ts_sec", "event_id")
    val right = Seq(
      (1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"), // tie at ts 100: id 2 wins
      (1L, 60L, 3L, "c"),
      (2L, 5L, 4L, "stale"),                     // 95s before: outside lookback 50
    ).toDF("user_id", "ts_sec2", "rid", "tag")
    val got = TrailAnalytics
      .asOfJoin(left, right, "user_id", "ts_sec", "ts_sec2", Seq("rid", "tag"), Some(50L))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[String]("tag"))))
    assert(got.toSeq == Seq(
      (10L, Some("b")), // ts 100: same-second rows eligible, max id wins
      (11L, Some("c")), // ts 70: the ts-60 row is at-or-before and within lookback
      (12L, None),      // stale row outside lookback
      (13L, None),      // no right rows at all for the key
    ), got.mkString(", "))
  }

  test("interval join keeps zero-overlap sessions and excludes the session's own user") {
    val s = spark
    import s.implicits._
    // One session for user 1 covering [0, 100]; purchases: user 2 inside
    // (counts), user 1 inside (excluded), user 2 outside (excluded).
    val e = eventsOf(
      (1L, 0L, 1L, "click"),
      (1L, 100L, 2L, "view"),
      (2L, 50L, 3L, "purchase"),
      (1L, 60L, 4L, "purchase"),
      (2L, 999999L, 5L, "purchase"),
    )
    // Run the registered query body on a temp dir-shaped copy: write the
    // fixture as an events.parquet and invoke through the registry.
    val dir = java.nio.file.Files.createTempDirectory("ta-overlap").toString
    e.withColumn("ts", col("ts_sec").cast("timestamp"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit(""))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ta_session_overlap")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("overlap"), r.getAs[Long]("n_sessions")))
      .toMap
    // user 1's session [0,100] sees ONE other-user purchase (event 3);
    // user 2's two single-purchase sessions see user 1's purchase only if
    // it falls in their [t,t] intervals — it doesn't (60 ≠ 50, 999999).
    assert(got == Map(1L -> 1L, 0L -> 2L), got.toString)
  }

  test("corpus invariants: sessions partition events; attribution conserves purchases") {
    val e = Tables.events(spark, sfDir)
    val sess = TrailAnalytics.sessions(e)
    val totals = sess.agg(sum("n_events"), sum("n_purchases")).head()
    assert(totals.getLong(0) == e.count())
    assert(totals.getLong(1) == e.filter(col("event_type") === "purchase").count())

    val att = SparkEntry.queries("ta_attribution")(spark, sfDir).collect()
    val channels = att.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "signup", "(none)")), channels.toString)
    assert(att.map(_.getAs[Long]("n_purchases")).sum ==
      e.filter(col("event_type") === "purchase").count())
  }

  test("cohort retention: offset-0 cell equals cohort size") {
    val rows = SparkEntry.queries("ta_cohort_retention")(spark, sfDir).collect()
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_week"))
    val e = Tables.events(spark, sfDir)
    val cohortSizes = e
      .groupBy("user_id").agg(min("ts_sec").as("f"))
      .groupBy(expr("f div 604800").as("cw")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cw") -> r.getAs[Long]("n")).toMap
    byCohort.foreach { case (cw, cells) =>
      val zero = cells.find(_.getAs[Long]("week_offset") == 0L)
      assert(zero.isDefined, s"cohort $cw missing offset 0")
      assert(zero.get.getAs[Long]("n_users") == cohortSizes(cw),
        s"cohort $cw offset-0 ${zero.get.getAs[Long]("n_users")} != ${cohortSizes(cw)}")
    }
  }

  test("rankGlobal == naive global row_number, invariant to input layout") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    // values with heavy ties so the user_id tiebreak carries the order
    val rows = (0 until 97).map(i => ((i * 7) % 13).toLong -> i.toLong)
    val df = rows.toDF("v", "id")
    val naive = df
      .withColumn("rank",
        row_number().over(W.orderBy(col("v").desc, col("id"))).cast("long") - 1L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    for (layout <- Seq(df, df.repartition(7), df.repartition(1), df.orderBy(col("id").desc))) {
      val got = TrailAnalytics
        .rankGlobal(layout, "rank", col("v").desc, col("id"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
      assert(got == naive, s"layout diverged: ${got.toSeq.sorted.take(5)}")
    }
  }

  test("RFM segments: users conserved; recency marginals match the quintile formula") {
    val e = Tables.events(spark, sfDir)
    val nUsers = e.select("user_id").distinct().count()
    val cells = SparkEntry.queries("ta_rfm_segments")(spark, sfDir).collect()
    assert(cells.map(_.getAs[Long]("n_users")).sum == nUsers)
    // the quintile formula (rank*5) div n puts exactly
    // |{r : (r*5) div n = q}| users in bucket q of EACH metric
    val expected = (0L until nUsers).groupBy(r => r * 5 / nUsers).view.mapValues(_.size.toLong).toMap
    val rMarginal = cells.groupBy(_.getAs[Long]("r_q")).view
      .mapValues(_.map(_.getAs[Long]("n_users")).sum).toMap
    assert(rMarginal == expected, s"$rMarginal vs $expected")
  }

  test("rankGlobal under pathological leading-key skew: exact ranks, balanced partitions") {
    val s = spark
    import s.implicits._
    // 99% of rows share sortKey 0 (the rfm `frequency` shape); the unique
    // user_id tiebreak is what must spread the tie block across partitions
    val n = 20000
    val df = (0 until n).map(i => (if (i % 100 == 0) (i % 7) + 1L else 0L, i.toLong))
      .toDF("k", "user_id")
    val ranked = TrailAnalytics.rankGlobal(df, "r", col("k"), col("user_id"))
    // exact: rank r == naive global row_number over (k, user_id)
    val naive = df.withColumn("r2",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("k"), col("user_id"))).cast("long") - 1L)
    assert(ranked.join(naive, Seq("k", "user_id")).filter(col("r") =!= col("r2")).count() == 0L)
    // balanced: the ranged layout rankGlobal builds must not let the tie
    // block collapse into one partition — no partition above 2x the mean.
    // Checked at 1x and 100x (2M rows, the verdict's probe sizing) — the
    // tiebreak-splitting property must hold as the tie block grows.
    val nParts = s.sessionState.conf.numShufflePartitions
    for (mult <- Seq(1, 100)) {
      val big =
        if (mult == 1) df
        else s.range(n.toLong * mult)
          .select(when(col("id") % 100 === 0, (col("id") % 7) + 1L).otherwise(0L).as("k"),
            col("id").as("user_id"))
      val counts = big.repartitionByRange(nParts, col("k"), col("user_id"))
        .groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1))
      val mean = counts.sum.toDouble / counts.length
      assert(counts.max <= 2 * mean,
        s"skewed tie block collapsed at ${mult}x: max ${counts.max} vs mean $mean " +
          s"over ${counts.length} partitions")
    }
  }

  test("funnelCohort: purchase must FOLLOW the first signup; cohorts by first-touch day") {
    val d = 86400L
    val e = eventsOf(
      // user 1 (day 0): signup then purchase — converted
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "purchase"),
      // user 2 (day 0): purchase BEFORE its only signup — NOT converted
      (2L, 10L, 3L, "purchase"), (2L, 20L, 4L, "signup"),
      // user 3 (day 1): signup only — not converted
      (3L, d + 10L, 5L, "signup"),
      // user 4 (day 1): purchase only (no signup) — not converted
      (4L, d + 10L, 6L, "purchase"),
      // user 5 (day 1): click, signup, click, purchase — converted
      (5L, d + 10L, 7L, "click"), (5L, d + 20L, 8L, "signup"),
      (5L, d + 30L, 9L, "click"), (5L, d + 40L, 10L, "purchase"),
    )
    val got = TrailAnalytics.funnelCohort(e).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_converted")))
    assert(got.toSeq == Seq((0L, 2L, 1L), (1L, 3L, 1L)), got.mkString(", "))
  }

  test("asOfJoin with no lookback: every event with an order-owning user matches") {
    val out = SparkEntry.queries("ta_asof_orders")(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sfDir).count())
    // the test orders table predates every event, so nothing is unmatched
    assert(!out.exists(_.getAs[String]("o_orderpriority") == "(none)"))
  }

  test("active-users panel: window monotonicity + hand-fixture edges") {
    // whole-corpus invariants on the registered query: DAU ≤ WAU ≤ MAU
    // per day, stickiness ≤ 1e6
    val out = SparkEntry.queries("ta_active_users")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (d, w, m, st) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"), r.getAs[Long]("stickiness_ppm"))
      assert(d <= w && w <= m && st <= 1000000L, r.toString)
    }
    // hand fixture: user 1 active day 0, user 2 active day 6 — day 6's
    // 7-day window [0,6] still counts user 1 (the edge day), its 30-day
    // window too; day 7 would not (no presence row exists there to report)
    val fx = eventsOf(
      (1L, 0L, 1L, "click"),
      (2L, 6L * 86400, 2L, "view"),
    ).withColumn("value", lit(1.0))
    val dir = java.nio.file.Files.createTempDirectory("ta_au_fx").toString
    fx.select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.timestamp_seconds(col("ts_sec")).as("ts"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ta_active_users")(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"), r.getAs[Long]("stickiness_ppm"))).toMap
    assert(got == Map(
      0L -> (1L, 1L, 1L, 1000000L),
      6L -> (1L, 2L, 2L, 500000L),
    ), got.toString)
  }

  test("linear attribution: equal floor-div split, window edges, '(none)', conservation") {
    // registered query on the real sf0.001 store: credits must conserve
    // value — every purchase's micro-cents land somewhere ('(none)' takes
    // the full amount), losing only the floor-division remainders
    // (< n_credits microcents total)
    val out = SparkEntry.queries("ta_attribution_linear")(spark, sfDir).collect()
    val credited = out.map(_.getAs[Long]("credit_microcents")).sum
    val nCredits = out.map(_.getAs[Long]("n_credits")).sum
    val e = Tables.events(spark, sfDir)
    val totalMicro = e.filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long") * 10000L))
      .head.getLong(0)
    assert(credited <= totalMicro && credited > totalMicro - nCredits,
      s"conservation: credited $credited vs total $totalMicro (n_credits $nCredits)")
    // hand fixture: 3-way split floors exactly; '(none)' takes full value
    val lb = TrailAnalytics.LookbackSec
    val p = 2000000L
    val fx = eventsOf(
      (1L, p - lb, 10L, "click"),      // AT window start - in
      (1L, p - lb - 1, 11L, "view"),   // just outside - out
      (1L, p - 5L, 12L, "view"),
      (1L, p, 13L, "signup"),          // AT purchase second - in
      (1L, p, 14L, "purchase"),
      (2L, p, 20L, "purchase"),        // no touches -> (none)
    ).withColumn("value", lit(10.0))
    // run the registered body on the fixture by writing it to a temp dir
    val dir = java.nio.file.Files.createTempDirectory("ta_lin_fx").toString
    fx.select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.timestamp_seconds(col("ts_sec")).as("ts"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ta_attribution_linear")(spark, dir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_credits"), r.getAs[Long]("credit_microcents"))).toMap
    // 10.00 = 1000 cents = 10_000_000 microcents; 3-way floor = 3_333_333
    assert(got == Map(
      "click" -> (1L, 3333333L),
      "view" -> (1L, 3333333L),
      "signup" -> (1L, 3333333L),
      "(none)" -> (1L, 10000000L),
    ), got.toString)
  }

  test("first-touch via time reversal: window bounds, tie, and '(none)' fill") {
    // purchase at 2_000_000 with a 7-day (604800) lookback: window
    // [1_395_200, 2_000_000]. Touches: one just OUTSIDE the window start
    // (dropped), one AT the window start (the earliest in-window — wins),
    // one later (ignored by first-touch), one tied pair at the earliest
    // second for user 2 (largest touch_id wins), and user 3 with no
    // in-window touch ('(none)').
    val lb = TrailAnalytics.LookbackSec
    val p = 2000000L
    val e = eventsOf(
      (1L, p - lb - 1, 10L, "click"),  // outside window - dropped
      (1L, p - lb, 11L, "signup"),     // AT window start - first touch
      (1L, p - 100L, 12L, "view"),     // later - not first
      (1L, p, 13L, "purchase"),
      (2L, p - lb, 20L, "click"),      // tied earliest pair:
      (2L, p - lb, 21L, "view"),       // largest touch_id (21) wins
      (2L, p, 22L, "purchase"),
      (3L, p - lb - 50L, 30L, "click"),// user 3: only a stale touch
      (3L, p, 31L, "purchase"),
    ).withColumn("value", lit(10.0))
    // replicate the registered query body on the fixture frame
    val R = 4000000000L
    val touches = e.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), (lit(R) - col("ts_sec")).as("rts2"),
        col("event_id").as("touch_id"), col("event_type").as("channel"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), (lit(R) - col("ts_sec") + lb).as("lts2"),
        col("event_id"), col("value"))
    val got = TrailAnalytics.asOfJoin(purchases, touches, "user_id", "lts2", "rts2",
        Seq("touch_id", "channel"), Some(lb))
      .select(col("user_id"), coalesce(col("channel"), lit("(none)")).as("ch"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("ch")).toMap
    assert(got == Map(1L -> "signup", 2L -> "view", 3L -> "(none)"), got.toString)
  }

  private def fingerprint(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).map { case (k, g) => k -> g.length }

  test("unionWithMinTsCut: overlapping snapshots reduce to the single store") {
    // 2 users, 3 snapshots with re-ingested tails (each dump's overlap
    // ends strictly below the previous dump's final second — the dump
    // contract under which the cut is exact)
    val e = eventsOf(
      (1L, 100L, 1L, "click"), (1L, 250L, 2L, "view"), (1L, 400L, 3L, "purchase"),
      (2L, 150L, 4L, "click"), (2L, 350L, 5L, "view"), (2L, 550L, 6L, "purchase"),
    )
    val a = e.filter(col("ts_sec") <= 250)                      // max 250
    val b = e.filter(col("ts_sec") > 250 && col("ts_sec") <= 400) // max 400
      .unionByName(e.filter(col("ts_sec") >= 150 && col("ts_sec") < 250)) // dup tail of A
    val c = e.filter(col("ts_sec") > 400)
      .unionByName(e.filter(col("ts_sec") >= 300 && col("ts_sec") < 400)) // dup tail of B
    val cut = TrailAnalytics.unionWithMinTsCut(Seq(a, b, c), "ts_sec")
    assert(fingerprint(cut) == fingerprint(e),
      s"cut union must equal the single store:\n${fingerprint(cut)}\nvs\n${fingerprint(e)}")
    // and the registered face's downstream claim: sessionization agrees
    assert(fingerprint(TrailAnalytics.sessions(cut)) == fingerprint(TrailAnalytics.sessions(e)))
  }

  test("unionWithMinTsCut boundary: AT the previous max is kept, below it is cut") {
    val a = eventsOf((1L, 100L, 1L, "click"), (1L, 300L, 2L, "view"))
    // next snapshot: a genuinely NEW same-second event at A's max (kept —
    // reference inclusivity: ctx.c:60 skips only ts < window_start), a
    // stale re-ingested event below it (cut), and a later event (kept)
    val b = eventsOf((2L, 300L, 3L, "click"), (1L, 200L, 4L, "view"),
      (1L, 500L, 5L, "purchase"))
    val got = TrailAnalytics.unionWithMinTsCut(Seq(a, b), "ts_sec")
    val want = eventsOf((1L, 100L, 1L, "click"), (1L, 300L, 2L, "view"),
      (2L, 300L, 3L, "click"), (1L, 500L, 5L, "purchase"))
    assert(fingerprint(got) == fingerprint(want))
  }

  test("unionWithMinTsCut: an empty snapshot contributes no cut") {
    val a = eventsOf((1L, 100L, 1L, "click")).filter(col("ts_sec") < 0) // empty
    val b = eventsOf((1L, 50L, 2L, "view"))
    val got = TrailAnalytics.unionWithMinTsCut(Seq(a, b), "ts_sec")
    assert(fingerprint(got) == fingerprint(b))
  }
}
