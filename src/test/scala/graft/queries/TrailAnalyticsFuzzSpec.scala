package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Model-based fuzz for the trail-analytics kernels (the GraphFuzzSpec
  * discipline): random event sets from a deterministic xorshift stream —
  * ts collisions, single-event users, empty touch/order sides all arise
  * by construction — checked against independent plain-Scala replays of
  * the contracts: gap sessionization (sort per user, split iff the gap is
  * STRICTLY exceeded, ties by event_id) and the as-of join (per left row,
  * the max (rightTs, id) among right rows at-or-before, nulled outside
  * the lookback). Divergence fails loudly with the offending trial.
  */
class TrailAnalyticsFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("ta-fuzz").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private final class Rng(seed: Long) {
    private var x = seed
    def next(bound: Int): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      ((x & Long.MaxValue) % bound).toInt
    }
  }

  private case class Ev(user: Long, ts: Long, id: Long, tpe: String)

  private def randomEvents(rng: Rng, n: Int, nUsers: Int, tsSpan: Int): Seq[Ev] =
    (0 until n).map { i =>
      Ev(rng.next(nUsers).toLong, rng.next(tsSpan).toLong, i.toLong,
        Seq("click", "view", "signup", "purchase")(rng.next(4)))
    }

  /** Independent sessionization replay. */
  private def refSessions(evs: Seq[Ev], gap: Long): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
    evs.groupBy(_.user).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts, e.id))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e.ts - acc.head.head.ts > gap) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        val (st, en) = (s.map(_.ts).min, s.map(_.ts).max)
        (u, i + 1L, s.size.toLong, st, en, en - st,
          s.count(_.tpe == "purchase").toLong)
      }
    }

  test("random event sets: sessions() == independent replay") {
    val s = spark
    import s.implicits._
    val rng = new Rng(0x7a117a11L)
    for (trial <- 1 to 6) {
      val gap = 1L + rng.next(50)
      val evs = randomEvents(rng, n = 40 + rng.next(160),
        nUsers = 1 + rng.next(12), tsSpan = 400)
      val df = evs.map(e => (e.user, e.ts, e.id, e.tpe))
        .toDF("user_id", "ts_sec", "event_id", "event_type")
      val got = TrailAnalytics.sessions(df, gapSec = gap).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("n_events"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("end_sec"), r.getAs[Long]("duration_sec"),
          r.getAs[Long]("n_purchases"))).toSet
      val want = refSessions(evs, gap).toSet
      assert(got == want, s"trial $trial gap $gap: ${got.diff(want)} / ${want.diff(got)}")
    }
  }

  test("random left/right sets: asOfJoin == independent replay (with and without lookback)") {
    val s = spark
    import s.implicits._
    val rng = new Rng(0xa50fa50fL)
    for (trial <- 1 to 6) {
      val nUsers = 1 + rng.next(8)
      val left = (0 until 30 + rng.next(60)).map(i =>
        (rng.next(nUsers).toLong, rng.next(300).toLong, i.toLong))
      val right = (0 until rng.next(80)).map(i =>
        (rng.next(nUsers).toLong, rng.next(300).toLong, i.toLong,
          s"p${rng.next(5)}"))
      val lookback = if (rng.next(2) == 0) None else Some(20L + rng.next(100))
      val lDf = left.toDF("user_id", "ts_sec", "event_id")
      val rDf = right.toDF("user_id", "rts", "rid", "payload")
      val got = TrailAnalytics
        .asOfJoin(lDf, rDf, "user_id", "ts_sec", "rts", Seq("rid", "payload"), lookback)
        .collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[java.lang.Long]("rid")).map(_.toLong),
          Option(r.getAs[String]("payload")))).toSet
      val want = left.map { case (u, ts, id) =>
        val cands = right.filter(r => r._1 == u && r._2 <= ts
          && lookback.forall(lb => r._2 >= ts - lb))
        if (cands.isEmpty) (id, None, None)
        else {
          val best = cands.maxBy(r => (r._2, r._3))
          (id, Some(best._3), Some(best._4))
        }
      }.toSet
      assert(got == want,
        s"trial $trial lookback $lookback: ${got.diff(want)} / ${want.diff(got)}")

      // the streaming stream-static twin must agree with the batch kernel
      // on the SAME random inputs (here run in batch mode — the expression
      // is mode-independent; TrailStreamSpec covers the microbatched run)
      val gotStream = graft.streaming.TrailStream
        .asOfEnrichStatic(lDf, rDf, "user_id", "ts_sec", "rts",
          Seq("rid", "payload"), lookback)
        .collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[java.lang.Long]("rid")).map(_.toLong),
          Option(r.getAs[String]("payload")))).toSet
      assert(gotStream == want,
        s"trial $trial lookback $lookback (asOfEnrichStatic): " +
          s"${gotStream.diff(want)} / ${want.diff(gotStream)}")
    }
  }

  test("random corpora: overlapJoined counts are salt-invariant and match the naive replay") {
    val s = spark
    import s.implicits._
    val rng = new Rng(0x5a175a17L)
    for (trial <- 1 to 4) {
      // tsSpan far above GapSec so sessions span several buckets
      val evs = randomEvents(rng, n = 60 + rng.next(120),
        nUsers = 1 + rng.next(8), tsSpan = 200000)
      val df = evs.map(e => (e.user, e.ts, e.id, e.tpe))
        .toDF("user_id", "ts_sec", "event_id", "event_type")
      // independent replay: per session (from the reference sessionizer),
      // count OTHER users' purchases with ts in [start, end] — zeros kept
      val purchases = evs.filter(_.tpe == "purchase")
      val want = refSessions(evs, TrailAnalytics.GapSec).map {
        case (u, sid, _, st, en, _, _) =>
          (u, sid) -> purchases.count(p => p.user != u && p.ts >= st && p.ts <= en).toLong
      }.toMap
      for (k <- Seq(1L, 2L, 4L, 7L)) {
        val got = TrailAnalytics.overlapJoined(df, saltK = k)
          .groupBy("user_id", "session_id")
          .agg(org.apache.spark.sql.functions.count($"p_sec").as("c"))
          .collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) -> r.getAs[Long]("c"))
          .toMap
        assert(got == want,
          s"trial $trial saltK $k: ${got.toSet.diff(want.toSet)} / ${want.toSet.diff(got.toSet)}")
      }
    }
  }

  test("random snapshot splits with re-ingested tails: unionWithMinTsCut == single store") {
    val s = spark
    import s.implicits._
    val rng = new Rng(0xc0ffee11L)
    import org.apache.spark.sql.functions.col
    for (trial <- 1 to 5) {
      val evs = randomEvents(rng, n = 50 + rng.next(150),
        nUsers = 1 + rng.next(10), tsSpan = 1000)
      val df = evs.map(e => (e.user, e.ts, e.id, e.tpe))
        .toDF("user_id", "ts_sec", "event_id", "event_type")
      // two random cut points (c1 may fall below every event — empty
      // first snapshot arises by construction) + re-ingested tails that
      // end strictly below the previous dump's max (the producer
      // contract under which the cut is exact)
      val cuts = Seq(rng.next(1000).toLong, rng.next(1000).toLong).sorted
      val (c1, c2) = (cuts.head, cuts.last)
      val ovB = 1L + rng.next(300)
      val ovC = 1L + rng.next(300)
      val mA = evs.filter(_.ts <= c1).map(_.ts).maxOption
      val snapA = df.filter(col("ts_sec") <= c1)
      val tailB = mA.fold(df.limit(0))(m =>
        df.filter(col("ts_sec") >= c1 - ovB && col("ts_sec") < m))
      val snapB = df.filter(col("ts_sec") > c1 && col("ts_sec") <= c2).unionByName(tailB)
      // the engine cut for snapshot C is maxTs(constructed B)
      val mB = (evs.filter(e => e.ts > c1 && e.ts <= c2).map(_.ts) ++
        mA.toSeq.flatMap(m => evs.filter(e => e.ts >= c1 - ovB && e.ts < m).map(_.ts)))
        .maxOption
      val tailC = mB.fold(df.limit(0))(m =>
        df.filter(col("ts_sec") >= c2 - ovC && col("ts_sec") < m))
      val snapC = df.filter(col("ts_sec") > c2).unionByName(tailC)
      val cut = TrailAnalytics.unionWithMinTsCut(Seq(snapA, snapB, snapC), "ts_sec")
      def fp(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap
      assert(fp(cut) == fp(df),
        s"trial $trial c1=$c1 c2=$c2 ovB=$ovB ovC=$ovC: cut union != single store")
      // and the registered face's downstream claim on the same fixture
      assert(fp(TrailAnalytics.sessions(cut)) == fp(TrailAnalytics.sessions(df)),
        s"trial $trial: sessionization over the cut union diverged")
    }
  }
}
