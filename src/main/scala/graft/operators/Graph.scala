package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Link-graph centrality for corpus curation — the host-quality signal
  * web-scale pipelines rank crawl frontiers and weight sources with
  * (PageRank: Page, Brin, Motwani & Winograd 1999, "The PageRank citation
  * ranking"; Common Crawl publishes exactly this kind of host-level
  * centrality for seed selection). The reference's data model has no
  * graph surface; this module is part of the LLM-pipeline extension, and
  * brings the one plan shape the inventory lacked: a bounded ITERATIVE
  * join+aggregate, the fixed-point family (PageRank, label propagation,
  * Katz) all reduce to.
  *
  * Determinism contract (the module family's rule): ranks are integer
  * fixed-point (ppm units, scale 1,000,000), damping 85/100 applied as
  * `(85 * x) div 100`, per-node shares as `rank div outdeg` — all
  * floor-division on non-negative longs, identical in Spark's `div` and
  * DuckDB's `//`, so a staged-CTE oracle replays every iteration
  * integer-exactly. Dangling nodes (outdeg 0) contribute nothing — the
  * sink-loss PageRank variant (total mass decays; ORDER is what curation
  * consumes, and the decay is uniform). No floats anywhere.
  *
  * Scale shape per iteration: ranks ⋈ edges on src (ranks is |V| rows —
  * host-level graphs are millions of rows at 100 TB, NOT broadcastable;
  * the join shuffles on src and AQE's skew-join splits hub keys), then
  * one groupBy(dst) with map-side partial sums. K iterations compose
  * declaratively into one Catalyst plan (K = 5 here); a long-horizon run
  * (K ≥ ~20) would persist `edges`/`outdeg` once — they are
  * iteration-invariant — and `localCheckpoint` ranks every ~10 rounds to
  * cut lineage, which changes nothing semantically.
  *
  * The synthetic link fixture derives deterministically from `doc_id`
  * residues (the withSyntheticUrls/_syn precedent): hosts are residues
  * mod 23; every doc links its host to a mixed residue, every 4th doc
  * also links to host 0 (the HUB arm — in-degree skew is live), and
  * docs on host 22 emit nothing (the DANGLING arm — host 22 appears
  * only as a destination). Self-loops drop; PageRank runs on DISTINCT
  * edges (host graphs dedup parallel links), while the degree face
  * reports raw link counts alongside.
  */
object Graph {

  /** Fixture constants — single source of truth for the Spark builders
    * AND the oracle SQL below (the synthUrlCte precedent).
    */
  private val NHosts = 23L
  private val Dangling = 22L
  private val HubEvery = 4L
  private val MulA = 7L
  private val AddB = 3L

  /** Rank scale (parts-per-million) and damping numerator/denominator. */
  val ScalePpm = 1000000L
  private val Damp = 85L
  private val Iters = 5

  /** Personalization seeds for [[pageRankSeeded]]'s registered face: two
    * ordinary hosts (neither the hub nor the dangling sink), so seeded
    * mass visibly concentrates on the seeds' out-neighborhoods.
    */
  val FixtureSeeds: Seq[Long] = Seq(3L, 17L)

  /** Deterministic host-link fixture: raw directed edges (self-loops
    * dropped, parallel links preserved) from the doc_id residue rules.
    */
  def syntheticLinks(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol)
    val src = (id % NHosts).as("src")
    val base = docs.filter(id % NHosts =!= Dangling)
      .select(src, ((id * MulA + AddB) % NHosts).as("dst"))
    val hub = docs.filter(id % NHosts =!= Dangling && id % HubEvery === 0)
      .select(src, lit(0L).as("dst"))
    base.unionAll(hub).filter(col("src") =!= col("dst"))
  }

  /** The raw-edge fixture as a DuckDB CTE body (`raw(src, dst)`). */
  private def rawEdgesSql: String =
    s"""raw AS (
          SELECT src, dst FROM (
            SELECT doc_id % $NHosts AS src,
                   (doc_id * $MulA + $AddB) % $NHosts AS dst
            FROM documents WHERE doc_id % $NHosts <> $Dangling
            UNION ALL
            SELECT doc_id % $NHosts AS src, CAST(0 AS BIGINT) AS dst
            FROM documents WHERE doc_id % $NHosts <> $Dangling
                             AND doc_id % $HubEvery = 0)
          WHERE src <> dst)"""

  /** Shared graph CTE chain: raw → distinct edges → nodes → out-degrees. */
  private def graphCtesSql: String =
    s"""$rawEdgesSql,
        edges AS (SELECT DISTINCT src, dst FROM raw),
        nodes AS (SELECT src AS host FROM edges UNION SELECT dst AS host FROM edges),
        od AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)"""

  /** Per-host degree profile over the link fixture: raw link counts and
    * distinct-neighbor degrees both ways, plus the dangling flag — the
    * first thing a host-graph audit reads (degree skew decides the join
    * strategy downstream). One pass of small aggregations; every join is
    * on the host key.
    */
  def degreeStats(links: DataFrame): DataFrame = {
    val edges = links.distinct()
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
    val outL = links.groupBy(col("src").as("host")).agg(count(lit(1)).as("out_links"))
    val outD = edges.groupBy(col("src").as("host")).agg(count(lit(1)).as("out_deg"))
    val inL = links.groupBy(col("dst").as("host")).agg(count(lit(1)).as("in_links"))
    val inD = edges.groupBy(col("dst").as("host")).agg(count(lit(1)).as("in_deg"))
    nodes.join(outL, Seq("host"), "left").join(outD, Seq("host"), "left")
      .join(inL, Seq("host"), "left").join(inD, Seq("host"), "left")
      .select(col("host"),
        coalesce(col("out_links"), lit(0L)).as("out_links"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_links"), lit(0L)).as("in_links"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("out_deg").isNull.cast("long").as("is_dangling"))
      .orderBy("host")
  }

  /** Integer fixed-point PageRank over the DISTINCT edges of `links`:
    * `iters` rounds of
    * `rank'(v) = 15%·SCALE + (85 · Σ_{u→v} (rank(u) div outdeg(u))) div 100`
    * from a uniform SCALE start, dangling mass dropped. Returns
    * (host, rank_ppm) — the ORDER (hub ≫ ordinary ≫ dangling-fed-only) is
    * the curation signal.
    */
  def pageRank(links: DataFrame, iters: Int = Iters,
               scalePpm: Long = ScalePpm): DataFrame =
    pageRankFrom(links, iters, scalePpm, seeds = None)

  /** Personalized (seeded) PageRank: teleport mass goes ONLY to `seeds` —
    * the crawl-quality seed-expansion shape (rank mass flows outward from
    * a trusted host set; high non-seed scores are the hosts the seed
    * neighborhood endorses). Same integer arithmetic; emits `is_seed`.
    */
  def pageRankSeeded(links: DataFrame, seeds: Seq[Long] = FixtureSeeds,
                     iters: Int = Iters, scalePpm: Long = ScalePpm): DataFrame = {
    require(seeds.nonEmpty, "seed set must be non-empty")
    pageRankFrom(links, iters, scalePpm, seeds = Some(seeds))
  }

  private def pageRankFrom(links: DataFrame, iters: Int, scalePpm: Long,
                           seeds: Option[Seq[Long]]): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val edges = links.distinct()
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
    val od = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val isSeed = seeds.map(ss => col("host").isin(ss: _*))
    val baseTerm: org.apache.spark.sql.Column = isSeed match {
      case None    => lit(15L * scalePpm / 100)
      case Some(s) => when(s, lit(15L * scalePpm / 100)).otherwise(lit(0L))
    }
    var ranks = nodes.withColumn("rank_ppm", isSeed match {
      case None    => lit(scalePpm)
      case Some(s) => when(s, lit(scalePpm)).otherwise(lit(0L))
    })
    for (_ <- 1 to iters) {
      val contrib = edges.join(od, "src")
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .select(col("dst").as("host"), expr("rank_ppm div outdeg").as("share"))
        .groupBy("host").agg(sum("share").as("contrib"))
      ranks = nodes.join(contrib, Seq("host"), "left")
        .select(col("host"),
          (baseTerm + expr(s"($Damp * coalesce(contrib, 0)) div 100")).as("rank_ppm"))
    }
    val out = isSeed match {
      case None    => ranks
      case Some(s) => ranks.withColumn("is_seed", s.cast("long"))
    }
    out.orderBy("host")
  }

  /** Staged-CTE oracle for [[pageRankFrom]]: r0..r`iters` generated
    * mechanically with the same integer arithmetic.
    */
  private def pageRankOracleSql(iters: Int, seeds: Option[Seq[Long]]): String = {
    val base = seeds match {
      case None     => (15L * ScalePpm / 100).toString
      case Some(ss) =>
        s"CASE WHEN n.host IN (${ss.mkString(", ")}) THEN ${15L * ScalePpm / 100} ELSE 0 END"
    }
    val r0 = seeds match {
      case None => s"r0 AS (SELECT host, CAST($ScalePpm AS BIGINT) AS rank_ppm FROM nodes)"
      case Some(ss) =>
        s"""r0 AS (SELECT host, CAST(CASE WHEN host IN (${ss.mkString(", ")})
                 THEN $ScalePpm ELSE 0 END AS BIGINT) AS rank_ppm FROM nodes)"""
    }
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
          SELECT n.host,
                 CAST($base + ($Damp * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank_ppm
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS host, SUM(r.rank_ppm // od.outdeg) AS contrib
            FROM edges e JOIN od ON od.src = e.src JOIN r${k - 1} r ON r.host = e.src
            GROUP BY e.dst) c ON c.host = n.host)"""
    }.mkString(",\n        ")
    val seedCol = seeds.fold("") { ss =>
      s", CAST(CASE WHEN host IN (${ss.mkString(", ")}) THEN 1 ELSE 0 END AS BIGINT) AS is_seed"
    }
    s"""
        WITH $graphCtesSql,
        $r0,
        $steps
        SELECT host, rank_ppm$seedCol FROM r$iters ORDER BY host"""
  }

  val queries: Seq[Q] = Seq(
    // Degree profile of the host-link fixture: hub skew, dangling arm,
    // raw-vs-distinct link counts — all live by construction.
    Q(
      "g_degree_stats",
      (s, dir) => degreeStats(syntheticLinks(Tables(s, dir, "documents"))),
      Some(s"""
        WITH $graphCtesSql,
        ol AS (SELECT src AS host, COUNT(*) AS out_links FROM raw GROUP BY src),
        il AS (SELECT dst AS host, COUNT(*) AS in_links FROM raw GROUP BY dst),
        ideg AS (SELECT dst AS host, COUNT(*) AS in_deg FROM edges GROUP BY dst)
        SELECT n.host,
               CAST(COALESCE(ol.out_links, 0) AS BIGINT) AS out_links,
               CAST(COALESCE(od.outdeg, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(il.in_links, 0) AS BIGINT) AS in_links,
               CAST(COALESCE(ideg.in_deg, 0) AS BIGINT) AS in_deg,
               CAST(CASE WHEN od.outdeg IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dangling
        FROM nodes n
        LEFT JOIN ol ON ol.host = n.host
        LEFT JOIN od ON od.src = n.host
        LEFT JOIN il ON il.host = n.host
        LEFT JOIN ideg ON ideg.host = n.host
        ORDER BY n.host"""),
    ),
    // Integer fixed-point PageRank, 5 iterations, dangling mass dropped —
    // every iteration replayed in the oracle's staged CTEs.
    Q(
      "g_pagerank",
      (s, dir) => pageRank(syntheticLinks(Tables(s, dir, "documents"))),
      Some(pageRankOracleSql(Iters, None)),
    ),
    // Personalized PageRank from the fixture seed set — the seed-quality
    // expansion face.
    Q(
      "g_pagerank_seeded",
      (s, dir) => pageRankSeeded(syntheticLinks(Tables(s, dir, "documents"))),
      Some(pageRankOracleSql(Iters, Some(FixtureSeeds))),
    ),
  )
}
