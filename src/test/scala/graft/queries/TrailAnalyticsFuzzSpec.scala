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
}
