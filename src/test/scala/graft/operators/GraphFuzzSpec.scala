package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Model-based fuzz for the graph family (the trick.py-style sweep
  * discipline): random digraphs from a deterministic xorshift stream,
  * checked against an independent in-memory reference that replays the
  * SAME integer contracts — uniform/weighted PageRank's
  * `base + (85·Σ(rank·w div W)) div 100` per iteration, and harmonic's
  * `Σ SCALE div d` over Floyd-Warshall distances. Divergence in either
  * direction (a Spark plan bug OR a drifted contract) fails loudly with
  * the offending seed.
  */
class GraphFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("graph-fuzz").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Scale = 1000000L

  /** Deterministic xorshift64 stream. */
  private final class Rng(seed: Long) {
    private var x = seed
    def next(bound: Int): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      ((x & Long.MaxValue) % bound).toInt
    }
  }

  private def randomEdges(rng: Rng, nNodes: Int, nLinks: Int): Seq[(Long, Long)] =
    (0 until nLinks).flatMap { _ =>
      val (s, d) = (rng.next(nNodes).toLong, rng.next(nNodes).toLong)
      if (s == d) None else Some(s -> d) // operator drops self-loops; mirror
    }

  /** Reference weighted PageRank: plain-Scala replay of the integer
    * contract over the multiplicity-weighted distinct edge set.
    */
  private def refPageRank(links: Seq[(Long, Long)], iters: Int,
                          weighted: Boolean): Map[Long, Long] = {
    val w = links.groupBy(identity).map {
      case (e, g) => e -> (if (weighted) g.size.toLong else 1L)
    }
    val nodes = w.keySet.flatMap { case (s, d) => Seq(s, d) }
    val outW = w.groupBy(_._1._1).map { case (s, g) => s -> g.values.sum }
    val base = 15L * Scale / 100
    var rank = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val contrib = w.toSeq
        .map { case ((s, d), ww) => d -> (rank(s) * ww / outW(s)) }
        .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
      rank = nodes.map(v => v -> (base + 85L * contrib.getOrElse(v, 0L) / 100)).toMap
    }
    rank
  }

  /** Reference harmonic: Floyd-Warshall (the fuzz graphs are ≤ 12 nodes,
    * diameters well under the operator's 16-hop horizon).
    */
  private def refHarmonic(links: Seq[(Long, Long)]): Map[Long, Long] = {
    val edges = links.distinct
    val nodes = edges.flatMap { case (s, d) => Seq(s, d) }.distinct.sorted
    val inf = Long.MaxValue / 4
    val dist = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(inf)
    nodes.foreach(v => dist((v, v)) = 0)
    edges.foreach { case (s, d) => dist((s, d)) = 1 }
    for (k <- nodes; i <- nodes; j <- nodes)
      if (dist((i, k)) + dist((k, j)) < dist((i, j)))
        dist((i, j)) = dist((i, k)) + dist((k, j))
    nodes.map { v =>
      v -> nodes.filter(u => u != v && dist((u, v)) < inf)
        .map(u => Scale / dist((u, v))).sum
    }.toMap
  }

  private def toDf(links: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    links.toDF("src", "dst")
  }

  private def collectRanks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random digraphs: Spark PageRank (uniform + weighted) == integer reference") {
    val rng = new Rng(0x5eed5eedL)
    for (trial <- 1 to 12) {
      val links = randomEdges(rng, nNodes = 3 + rng.next(9), nLinks = 4 + rng.next(20))
      if (links.nonEmpty) {
        val df = toDf(links)
        // both arms against the same independent reference: the opt-out
        // pins the DISTRIBUTED loop, the default pins the driver replay
        val gotU = collectRanks(Graph.pageRank(df, iters = 3, maxLocalVertices = 0))
        assert(gotU == refPageRank(links, 3, weighted = false),
          s"uniform diverged at trial $trial links=$links")
        assert(collectRanks(Graph.pageRank(df, iters = 3)) == gotU,
          s"uniform local arm diverged at trial $trial links=$links")
        val gotW = collectRanks(Graph.pageRankWeighted(df, iters = 3, maxLocalVertices = 0))
        assert(gotW == refPageRank(links, 3, weighted = true),
          s"weighted diverged at trial $trial links=$links")
        assert(collectRanks(Graph.pageRankWeighted(df, iters = 3)) == gotW,
          s"weighted local arm diverged at trial $trial links=$links")
      }
    }
  }

  test("random digraphs: Spark harmonicExact == Floyd-Warshall reference") {
    val rng = new Rng(0xfeedbeefL)
    for (trial <- 1 to 8) {
      val links = randomEdges(rng, nNodes = 3 + rng.next(9), nLinks = 4 + rng.next(16))
      if (links.nonEmpty) {
        // maxLocalVertices = 0 keeps the fuzz on the DISTRIBUTED doubling
        // face; the driver BFS arm fuzzes against the same reference below
        val got = collectRanks(Graph.harmonicExact(toDf(links), maxLocalVertices = 0))
        assert(got == refHarmonic(links), s"harmonic diverged at trial $trial links=$links")
        val local = collectRanks(Graph.harmonicExact(toDf(links)))
        assert(local == refHarmonic(links),
          s"local harmonic diverged at trial $trial links=$links")
      }
    }
  }
}
