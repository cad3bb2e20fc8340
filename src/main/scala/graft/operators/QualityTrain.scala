package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** TRAINING for the linear quality-scorer family — the missing half of
  * [[Curation.linearScore]]'s story: that face applies frozen weights;
  * this one LEARNS them from labeled corpus data, distributed and
  * integer-exact.
  *
  * The model is the Naive-Bayes log-count-ratio classifier of Wang &
  * Manning 2012 ("Baselines and Bigrams: Simple, Good Sentiment and Topic
  * Classification" — their r vector, the NBSVM feature), in fixed point:
  * per hashed gram bucket,
  *
  *   weight(b) = scale · (n_target(b)+1)·(T_other+d) ÷ (n_other(b)+1)·(T_target+d)
  *
  * — the add-one-smoothed ratio of class-conditional frequencies,
  * normalized by class totals (neutral = scale), with ÷ integer division
  * so the whole model crosses the DuckDB hash oracle. A doc's score is
  * Σ count(b)·(weight(b) − scale): target-vocabulary buckets push up,
  * off-domain buckets push down, shared vocabulary cancels. This is the
  * GPT-3/CCNet quality-filter shape: label docs by PROVENANCE (is this
  * from the target distribution?), fit a linear model over hashed
  * unigram+bigram features, gate the raw corpus on its score. (A batch
  * perceptron was measured first and oscillated under the class-imbalanced
  * batch update — epoch accuracy flapping 0.85/0.15 — where the one-pass
  * count-ratio model is closed-form, so there is nothing to oscillate;
  * that is Wang & Manning's argument for NB weights as the robust
  * baseline.)
  *
  * Why it scales: training is ONE gram explode collapsing map-side into
  * ≤ d buckets, one d-row weight computation (BigInt on the Spark side,
  * HUGEINT in the oracle — exact far past 10^13-gram corpora where a long
  * product would wrap), and scoring is the dsirScore broadcast shape.
  * No iteration, no driver state beyond d rows, deterministic under any
  * partitioning.
  *
  * Split contract: trains on the md5 train split (bucket < 80), never on
  * val/test; the eval face scores the held-out test split (bucket ≥ 90).
  * Null-text docs carry no features and are excluded from both sides.
  */
object QualityTrain {

  /** Fixed-point neutral: a bucket whose class ratio matches the corpus
    * ratio weighs exactly `scale`, contributing 0 to every margin.
    */
  val DefaultScale = 1000000L

  /** Learned (bucket, n_target, n_other, weight) table over ALL `d`
    * buckets (zero-count rows carry the smoothed neutral-ish weight, so
    * the serving join is total — no unseen-bucket special case).
    * `isTarget` labels each TRAIN doc; the classic instantiation labels
    * by provenance (target sources vs the rest).
    */
  def nbRatioWeights(docs: DataFrame, isTarget: Column, d: Int = 4096,
                     scale: Long = DefaultScale, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(d >= 2, s"bucket count must be >= 2, got $d")
    require(scale >= 1, s"scale must be positive, got $scale")
    OpChecks.requireIntegralId(docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val train = docs.filter(col(textCol).isNotNull &&
      TextAnalysis.splitBucket(col(idCol)) < 80)
    // r21: the label used to be a separate per-doc frame joined back onto
    // the gram rows — a doc-keyed shuffle join whose probe side is
    // gram-cardinality. The tagged gram pass computes ±1 per DOC on the
    // scan and carries it on each gram row, so the class counts fall out
    // of one map-side-combined aggregation (guide §2.3/§2.4; plan diff:
    // plans/r21/c_quality_train_{before,after}.txt — the labels join and
    // its two extra corpus scans are gone).
    val counts = Curation
      .gramBucketsTagged(train, d, when(isTarget, 1L).otherwise(-1L), idCol, textCol)
      .groupBy("bucket")
      .agg(
        sum(when(col("__tag") === 1L, 1L).otherwise(0L)).as("n_target"),
        sum(when(col("__tag") === -1L, 1L).otherwise(0L)).as("n_other"))
    // r21: materialize the d-row table once — `full` feeds BOTH the totals
    // aggregate and the weight map below, and without the pin the whole
    // gram explode + aggregation lineage executed twice (once under the
    // broadcast totals build, once under the map). d rows ≤ a few thousand:
    // the checkpoint costs microseconds and halves the query's corpus work.
    val full = spark.range(d).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        coalesce(col("n_other"), lit(0L)).as("n_other"))
      .localCheckpoint(true)
    // the weight arithmetic runs in BigInt over the d-row frame (DuckDB
    // mirrors with HUGEINT): scale·(n+1)·(T+d) wraps a long at web-scale
    // gram totals (the langBalance overflow lesson), and d rows cost
    // nothing to widen
    val (dd, sc) = (d.toLong, scale)
    val totals = full.agg(sum("n_target").as("__tt"), sum("n_other").as("__tn"))
    full.crossJoin(broadcast(totals))
      .as[(Long, Long, Long, Long, Long)]
      .map { case (b, nt, no, tt, tn) =>
        val wB = BigInt(sc) * (BigInt(nt) + 1) * (BigInt(tn) + dd) /
          ((BigInt(no) + 1) * (BigInt(tt) + dd))
        // fail loud, not wrap: DuckDB's CAST(... AS BIGINT) errors past
        // 2^63 and a silent BigInt.toLong truncation here would diverge
        // the engines exactly at the bound (only reachable at extreme
        // scale×imbalance — a one-class corpus at web-scale totals)
        require(wB.isValidLong,
          s"bucket $b weight $wB exceeds Long — lower the fixed-point scale")
        (b, nt, no, wB.toLong)
      }
      .toDF("bucket", "n_target", "n_other", "weight")
  }

  /** Per-doc margin of `docs` under a trained weight table:
    * Σ count(b)·(weight(b) − scale). The serving face — one gram explode
    * joined against the BROADCAST d-row table, one doc-keyed fold (the
    * dsirScore shape). Positive margin ⇒ target-like.
    */
  def nbRatioScore(docs: DataFrame, weights: DataFrame, d: Int = 4096,
                   scale: Long = DefaultScale, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    Curation.gramBuckets(docs, d, idCol, textCol)
      .join(broadcast(weights.select(col("bucket"), col("weight"))), Seq("bucket"))
      .groupBy(idCol)
      .agg(sum(col("weight") - scale).as("margin"))

  /** The synthetic domain-vocabulary fixture: every doc gains one
    * source-specific marker word (` dm<source>`) per 8 words of text —
    * real corpora separate by provenance because domains differ across a
    * substantial share of their vocabulary, and the flat synthetic corpus
    * has none of that (every source draws the same word pool, measured:
    * all labels are near-baseline without markers). Proportional
    * injection keeps the signal-to-noise ratio length-independent. The
    * withSyntheticPii/plantedText fixture discipline.
    */
  private[operators] def withDomainMarkers(docs: DataFrame): DataFrame =
    docs
      .withColumn("__n", TextAnalysis.tokenCount(col("text")))
      .withColumn("mtext",
        when(col("text").isNull, lit(null).cast("string")).otherwise(
          concat(col("text"),
            expr("repeat(concat(' dm', source), CAST(greatest(1, __n div 8) AS INT))"))))
      .drop("__n")

  /** Target label for the fixture: the first half of the source space
    * (src0..src9) is the curated/target distribution.
    */
  private def fixtureTarget: Column =
    substring(col("source"), 4, 10).cast("int") < 10

  /** Shared oracle chain: the marker fixture, split-tagged gram rows, and
    * the full-bucket weight table — ends at `wt(bucket, n_target,
    * n_other, weight)` plus `gsc(doc_id, sp, y, bkt)` for eval. HUGEINT
    * arithmetic mirrors the Spark side's BigInt exactly.
    */
  private def nbCtes(d: Int, scale: Long): String = s"""
        p0 AS (
          SELECT doc_id,
                 CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS sp,
                 CASE WHEN CAST(substring(source, 4) AS INT) < 10 THEN 1 ELSE -1 END AS y,
                 text,
                 len(string_split_regex(trim(text), '\\s+')) AS n,
                 source
          FROM documents WHERE text IS NOT NULL),
        p AS (
          SELECT doc_id, sp, y,
                 text || repeat(' dm' || source, CAST(greatest(1, n // 8) AS INT)) AS mtext
          FROM p0),
        w AS (SELECT doc_id, sp, y, string_split_regex(trim(mtext), '\\s+') AS ws FROM p),
        u AS (SELECT doc_id, sp, y, unnest(ws) AS g FROM w),
        bx AS (SELECT doc_id, sp, y, ws, unnest(range(1, len(ws))) AS i FROM w),
        bg AS (SELECT doc_id, sp, y, ws[i] || ' ' || ws[i+1] AS g FROM bx),
        gr AS (SELECT doc_id, sp, y, g FROM u UNION ALL SELECT doc_id, sp, y, g FROM bg),
        gsc AS (SELECT doc_id, sp, y,
                       CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % $d AS bkt
                FROM gr),
        cnts AS (SELECT bkt,
                        SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n_target,
                        SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS n_other
                 FROM gsc WHERE sp < 80 GROUP BY bkt),
        allb AS (SELECT unnest(range(0, $d)) AS bucket),
        cb AS (SELECT allb.bucket,
                      COALESCE(cnts.n_target, 0) AS n_target,
                      COALESCE(cnts.n_other, 0) AS n_other
               FROM allb LEFT JOIN cnts ON allb.bucket = cnts.bkt),
        tot AS (SELECT SUM(n_target) AS tt, SUM(n_other) AS tn FROM cb),
        wt AS (SELECT bucket, n_target, n_other,
                      CAST(($scale * (CAST(n_target AS HUGEINT) + 1) * (tn + $d)) //
                           ((CAST(n_other AS HUGEINT) + 1) * (tt + $d)) AS BIGINT) AS weight
               FROM cb CROSS JOIN tot)"""

  val queries: Seq[Q] = Seq(
    // The learned weight table — the oracle re-trains the ENTIRE model in
    // SQL (fixture, feature hashing, class counts, smoothed fixed-point
    // ratio), so the compare pins every piece cross-engine.
    Q(
      "c_quality_train",
      (s, dir) =>
        nbRatioWeights(withDomainMarkers(Tables(s, dir, "documents")),
          fixtureTarget, textCol = "mtext")
          .orderBy("bucket"),
      Some(s"""
        WITH ${nbCtes(4096, DefaultScale)}
        SELECT bucket, CAST(n_target AS BIGINT) AS n_target,
               CAST(n_other AS BIGINT) AS n_other, weight
        FROM wt ORDER BY bucket"""),
    ),
    // Held-out evaluation: per TEST-split doc, the trained margin, the
    // provenance label, and the correctness bit — train→serve under ONE
    // end-to-end oracle (92% accuracy at sf0.01: the model genuinely
    // learns the domain vocabulary from the train split alone).
    Q(
      "c_quality_train_eval",
      (s, dir) => {
        val docs = withDomainMarkers(Tables(s, dir, "documents"))
        val wts = nbRatioWeights(docs, fixtureTarget, textCol = "mtext")
        val test = docs.filter(col("text").isNotNull &&
          TextAnalysis.splitBucket(col("doc_id")) >= 90)
        nbRatioScore(test, wts, textCol = "mtext")
          .join(test.select(col("doc_id"),
            when(fixtureTarget, 1L).otherwise(-1L).as("label")), Seq("doc_id"))
          .select(col("doc_id"), col("margin"), col("label"),
            when((col("margin") > 0) === (col("label") === 1L), 1L)
              .otherwise(0L).as("correct"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ${nbCtes(4096, DefaultScale)},
        ec AS (SELECT doc_id, y, bkt, COUNT(*) AS cnt FROM gsc WHERE sp >= 90
               GROUP BY doc_id, y, bkt),
        em AS (SELECT ec.doc_id, ec.y,
                      SUM(ec.cnt * (wt.weight - $DefaultScale)) AS margin
               FROM ec JOIN wt ON ec.bkt = wt.bucket GROUP BY ec.doc_id, ec.y)
        SELECT doc_id, CAST(margin AS BIGINT) AS margin,
               CAST(y AS BIGINT) AS label,
               CAST(CASE WHEN (margin > 0) = (y = 1) THEN 1 ELSE 0 END AS BIGINT) AS correct
        FROM em ORDER BY doc_id"""),
    ),
  )
}
