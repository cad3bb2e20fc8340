package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Curation, MinHash, TextAnalysis}

/** One doc's membership in one LSH band bucket (streaming shuffle row).
  * Carries the event time as a real timestamp field: the watermark is
  * (re)declared on THIS stream — a typed flatMap erases the upstream
  * column's watermark metadata, which the event-time-timeout check needs
  * on its direct input.
  */
private[streaming] case class BucketMember(band: Int, bk: Int, docId: Long, ts: java.sql.Timestamp)

/** Cross-batch per-bucket dedup state: first (smallest) claimant id and
  * total membership count (for the prospective hot-bucket cap).
  */
private[streaming] case class BucketState(firstId: Long, count: Long)

/** A bucket's claim on one member doc (Long.MaxValue = no claim). */
private[streaming] case class BucketClaim(docId: Long, claim: Long)

/** Streaming face of the training-data document pipeline: the same
  * fingerprint/quality/split primitives the batch operators use, wired
  * into Structured Streaming with watermark-bounded state — a 100 TB/day
  * ingestion front-end where dedup and quality gates must run before
  * anything lands.
  *
  * All transforms are per-row column expressions plus standard streaming
  * operators (dropDuplicatesWithinWatermark, windowed aggregation), so
  * state size is bounded by the watermark horizon, not the corpus.
  */
object DocStream {

  /** Exact streaming dedup: keep the first arrival of each md5(text)
    * fingerprint; duplicates arriving within the watermark horizon are
    * dropped, and fingerprint state is evicted once the watermark passes —
    * bounded state, the standard trade for unbounded streams (an exact
    * forever-dedup needs an external store; the batch `Dedup` operators
    * cover the at-rest corpus). NULL-text documents are never deduped
    * against each other: md5(null) is null and dropDuplicates treats null
    * keys as equal, which would collapse every null-text doc to one — a
    * per-document sentinel fingerprint keeps them all (mirroring the batch
    * pipeline's null-text stance). The sentinel derives from `idCol`, not
    * a random value: streaming replay/retry re-evaluates the projection,
    * and a nondeterministic sentinel would re-fingerprint the same row
    * differently across attempts.
    */
  def dedupByFingerprint(docs: DataFrame, textCol: String = "text",
                         eventTimeCol: String = "event_time",
                         watermarkDelay: String = "10 minutes",
                         idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fp",
        coalesce(TextAnalysis.fingerprint(col(textCol)),
          concat(lit("null:"), col(idCol).cast("string"))))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming image dedup: keep the first arrival of each perceptual
    * hash ([[graft.functions.PerceptualHash64]] `ahash64` — the same bits
    * as the batch mm_image_dedup clusters), watermark-bounded like
    * [[dedupByFingerprint]]. Blobs that don't decode (null / corrupt /
    * decompression-bomb-guarded) hash to NULL and take a per-document
    * sentinel instead — every undecodable blob is KEPT, mirroring the
    * null-text contract, because "undecodable" is a classification, not
    * an identity.
    */
  def dedupByImageHash(docs: DataFrame, blobCol: String = "blob",
                       eventTimeCol: String = "event_time",
                       watermarkDelay: String = "10 minutes",
                       idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("img_fp",
        coalesce(
          graft.functions.PerceptualHash64.aHash(col(blobCol)).cast("string"),
          concat(lit("undecodable:"), col(idCol).cast("string"))))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("img_fp")

  /** Streaming audio dedup: keep the first arrival of each 32-band
    * fingerprint ([[graft.functions.AudioFingerprint32]] `afp32` — the
    * same bits as the batch au_fingerprint_dup clusters),
    * watermark-bounded like [[dedupByImageHash]]. Blobs that don't decode
    * (null / truncated / forged-length-guarded / wrong layout) fingerprint
    * to NULL and take a per-document sentinel instead — every undecodable
    * blob is KEPT: "undecodable" is a classification, not an identity.
    */
  def dedupByAudioFingerprint(docs: DataFrame, blobCol: String = "blob",
                              eventTimeCol: String = "event_time",
                              watermarkDelay: String = "10 minutes",
                              idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("au_fp",
        coalesce(
          graft.functions.AudioFingerprint32.afp32(col(blobCol)).cast("string"),
          concat(lit("undecodable:"), col(idCol).cast("string"))))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("au_fp")

  /** Cross-batch NEAR-duplicate dedup — the streaming face of
    * [[MinHash.nearDupCanonical]]: per doc, emit (id, canonical_id) where
    * canonical is the smallest doc id this doc shares any MinHash-LSH band
    * bucket with, across every micro-batch inside the watermark horizon.
    *
    * Shape: signatures and band keys are computed PER ROW with the
    * bit-identical JVM kernels ([[MinHash.signatureJvm]] /
    * [[MinHash.bandKeysJvm]] over the same native ShingleHash64 input) —
    * a stream row carries all of its doc's shingles, so the batch
    * operator's explode + aggregate shuffle would buy nothing — then ONE
    * stateful pass keyed by (band, bucket) assigns each member the
    * bucket's RUNNING-MIN member id (`flatMapGroupsWithState`, the
    * TrailStream state shape; equal to the first arrival under in-order
    * ids — an out-of-order smaller id lowers the claim for future rows
    * but already-emitted rows are never retracted), and a batch-local
    * repartition + mapPartitions fold (a
    * doc's B claims always share a micro-batch; a second STATEFUL op
    * downstream of flatMapGroupsWithState is both unnecessary and
    * rejected by Spark) reduces them to the per-doc min. State per bucket
    * is two longs, evicted once the watermark
    * passes the bucket's last member + `watermarkDelay` — bounded by the
    * horizon, not the corpus, like [[dedupByFingerprint]].
    *
    * Batch parity: with in-order arrival (ids assigned in event-time
    * order) the result equals the batch operator on the union of all
    * batches — a bucket's first claimant IS its min id, and within one
    * micro-batch every member sees min(state, batch-min) exactly like the
    * batch window. Two documented divergences, both inherent to streams:
    * the hot-bucket cap applies PROSPECTIVELY (a bucket stops claiming
    * once its running count passes `maxBucket`; the batch operator drops
    * such buckets retroactively), and bucket state is forgotten past the
    * watermark horizon (the batch operators cover the at-rest corpus).
    * NULL-text docs carry no shingles and route around the stateful pass,
    * self-canonical — the module-wide null-text contract.
    */
  def dedupNearMinHash(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       eventTimeCol: String = "event_time",
                       watermarkDelay: String = "10 minutes",
                       k: Int = 3, h: Int = 64, bands: Int = 16,
                       maxBucket: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = durationMs(watermarkDelay)
    val nullBranch = docs.filter(col(textCol).isNull)
      .select(col(idCol).cast("long").as(idCol), col(idCol).cast("long").as("canonical_id"))

    // the watermark is declared on the MEMBERSHIP stream (same event-time
    // values): a typed flatMap erases column metadata, and the event-time
    // timeout check requires watermark metadata on its direct input
    val members = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), col(eventTimeCol).as("__t"),
        graft.functions.ShingleHash64(col(textCol), k).as("__hs"))
      .as[(Long, java.sql.Timestamp, Array[Long])]
      .flatMap { case (id, ts, hs) =>
        // ShingleHash64 never returns an empty array for non-null text
        // (< k tokens ⇒ one joined shingle), so this branch is
        // unreachable today — but if the kernel ever changed, a signature
        // of untouched Long.MaxValue sentinels would silently cluster
        // every shingle-less doc into one bucket; dropping the doc's
        // memberships is the visibly-safe failure
        if (hs.isEmpty) Iterator.empty
        else {
          val bks = MinHash.bandKeysJvm(MinHash.signatureJvm(hs, h), bands)
          bks.iterator.zipWithIndex.map { case (bk, band) =>
            BucketMember(band, bk, id, ts)
          }
        }
      }
      .withWatermark("ts", watermarkDelay)

    val claims = members
      .groupByKey(m => (m.band, m.bk))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: (Int, Int), it: Iterator[BucketMember], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ms = it.toArray
            var batchMin = Long.MaxValue; var maxTs = Long.MinValue
            ms.foreach { m =>
              if (m.docId < batchMin) batchMin = m.docId
              if (m.ts.getTime > maxTs) maxTs = m.ts.getTime
            }
            val prior = state.getOption
            val first = math.min(prior.fold(Long.MaxValue)(_.firstId), batchMin)
            val total = prior.fold(0L)(_.count) + ms.length
            // prospective hot-bucket cap: once the bucket's running count
            // passes maxBucket it claims nothing (this batch onward)
            val claim = if (total > maxBucket) Long.MaxValue else first
            state.update(BucketState(first, total))
            // evict once the watermark passes last member + delay; clamp
            // above the current watermark (Spark rejects timeouts at or
            // behind it — a late row could otherwise compute one)
            state.setTimeoutTimestamp(
              math.max(maxTs + delayMs, state.getCurrentWatermarkMs() + 1L))
            ms.iterator.map(m => BucketClaim(m.docId, claim))
          }
        })

    // a doc's B memberships all travel in its own micro-batch, so the
    // per-doc fold is BATCH-LOCAL — and must not be a second stateful
    // operator (Spark rejects any stateful op downstream of
    // flatMapGroupsWithState: the global-watermark check can't see that
    // this fold drops nothing). repartition + mapPartitions is a plain
    // per-micro-batch exchange: co-locate each doc's B claim rows, fold
    // them with a bounded hash map, emit one row per doc.
    val canon = claims
      .repartition(col("docId"))
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap[Long, Long]()
        it.foreach(c => m(c.docId) = math.min(m.getOrElse(c.docId, Long.MaxValue), c.claim))
        m.iterator.map { case (id, cl) =>
          BucketClaim(id, if (cl == Long.MaxValue) id else math.min(cl, id))
        }
      }
      .toDF(idCol, "canonical_id")

    canon.unionByName(nullBranch)
  }

  /** Millisecond duration of a day-time interval string like
    * "10 minutes" (the watermark-delay grammar; month-grained intervals
    * have no fixed millisecond length and are rejected).
    */
  private def durationMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"month-grained delay '$s' has no fixed ms length")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Per-window ingestion quality stats: doc count, token sum, and how
    * many docs pass a minimal quality gate (token count ≥ minTokens).
    * Append-mode compatible (watermarked tumbling window).
    */
  def qualityByWindow(docs: DataFrame, textCol: String = "text",
                      eventTimeCol: String = "event_time",
                      windowDuration: String = "1 minute",
                      watermarkDelay: String = "10 minutes",
                      minTokens: Int = 3): DataFrame =
    docs
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"),
        sum(when(TextAnalysis.tokenCount(col(textCol)) >= minTokens, 1L).otherwise(0L))
          .as("n_quality"),
      )
      .select(col("w.start").as("window_start"), col("n_docs"), col("n_tokens"), col("n_quality"))

  /** Streaming Count-Min sketch per event-time window: the same
    * [[graft.functions.CmsSketch.Agg]] the batch face builds with, lifted
    * to an untyped UDAF inside a watermarked window aggregation — the
    * frequency profile of a live ingest feed at fixed memory (the state
    * store holds one depth×width matrix per OPEN window, not per token;
    * the watermark closes windows, so state is bounded by the lateness
    * horizon). Point estimates against the emitted matrices use the same
    * [[graft.operators.TextAnalysis.cmsEstimate]] column; batch ≡ stream
    * is spec-pinned (one shared kernel, no second tokenizer to drift).
    */
  def cmsByWindow(docs: DataFrame, depth: Int = 4, width: Int = 512,
                  textCol: String = "text", eventTimeCol: String = "event_time",
                  windowDuration: String = "1 minute",
                  watermarkDelay: String = "10 minutes"): DataFrame = {
    val cms = udaf(new graft.functions.CmsSketch.Agg(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    docs
      .filter(col(textCol).isNotNull)
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"))
      .agg(cms(col(textCol)).as("sketch"), count(lit(1)).as("n_docs"))
      .select(col("w.start").as("window_start"), col("sketch"), col("n_docs"))
  }

  /** Streaming quantile sketch per event-time window: the same
    * [[graft.functions.LogHistogram.Agg]] the batch face builds with,
    * lifted into a watermarked window aggregation — the live length/size
    * profile of an ingest feed at fixed memory (one 960-long histogram
    * per OPEN window; the watermark closes windows, so state is bounded
    * by the lateness horizon, never by value cardinality). The emitted
    * matrices serve the same bucket/bound kernels as batch
    * ([[graft.functions.LogHistogram.bucket]]/`lowerBound`/`upperBound`)
    * and, being linear, SUM across windows or feeds into coarser rollups
    * — batch ≡ stream is spec-pinned through the one shared kernel.
    */
  def qsketchByWindow(docs: DataFrame, valCol: String = "n_chars",
                      eventTimeCol: String = "event_time",
                      windowDuration: String = "1 minute",
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    val qh = udaf(new graft.functions.LogHistogram.Agg,
      org.apache.spark.sql.Encoders.scalaLong)
    docs
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"))
      .agg(qh(coalesce(col(valCol).cast("long"), lit(0L))).as("sketch"),
        count(lit(1)).as("n_docs"))
      .select(col("w.start").as("window_start"), col("sketch"), col("n_docs"))
  }

  /** Streaming distribution-drift monitor: per event-time window, the
    * ppm L1 distance between the window's [[qsketchByWindow]] histogram
    * and a FROZEN baseline fraction table (ppm per bucket, built offline
    * from the reference corpus — the freeze-then-gate lifecycle every
    * other stream gate here follows). The alert a live ingest raises
    * when a scraper starts truncating: per-document rules pass while the
    * DISTRIBUTION walks away. Integer floor-div throughout (the batch
    * [[graft.operators.TextAnalysis.qsketchDrift]] arithmetic), computed
    * by exploding the already-aggregated 960-bucket matrix — post-agg
    * rows, never the stream.
    */
  def qsketchDriftByWindow(docs: DataFrame, baselineFracPpm: Seq[Long],
                           valCol: String = "n_chars",
                           eventTimeCol: String = "event_time",
                           windowDuration: String = "1 minute",
                           watermarkDelay: String = "10 minutes"): DataFrame = {
    require(baselineFracPpm.length == graft.functions.LogHistogram.NumBuckets,
      s"baseline must carry one ppm fraction per bucket " +
        s"(${graft.functions.LogHistogram.NumBuckets}), got ${baselineFracPpm.length}")
    // the drift fold is a PROJECTION over the finished 960-long matrix
    // (zip_with + aggregate) — a second groupBy here would be a second
    // streaming aggregation, which append-mode plans reject. Floor-div
    // as (a - a%b)/b through DECIMAL division: the numerator is exactly
    // divisible, decimal keeps all 38 digits, so the quotient is exact
    // at ANY magnitude — a double route would round past 2^53 and break
    // the batch ≡ stream integer contract on huge windows. (`div` itself
    // is unavailable here: lambda variables have no SQL name for expr.)
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)")).cast("long")
    val base = typedLit(baselineFracPpm)
    qsketchByWindow(docs, valCol, eventTimeCol, windowDuration, watermarkDelay)
      .withColumn("drift_ppm", aggregate(
        zip_with(col("sketch"), base,
          (c, f) => abs(fdiv(c * lit(1000000L), col("n_docs")) - f)),
        lit(0L), (acc, x) => acc + x))
      .select(col("window_start"), col("n_docs"), col("drift_ppm"))
  }

  /** Baseline fraction table for [[qsketchDriftByWindow]]: ppm of
    * probability mass per bucket from a frozen reference corpus — one
    * dense 960-long array, computed with the same floor-div the stream
    * applies.
    */
  def qsketchBaselineFracPpm(docs: DataFrame, valCol: String = "n_chars"): Seq[Long] = {
    val lh = graft.functions.LogHistogram
    val agg = udaf(new lh.Agg, org.apache.spark.sql.Encoders.scalaLong)
    val row = docs
      .select(coalesce(col(valCol).cast("long"), lit(0L)).as("v"))
      .agg(agg(col("v")).as("sketch"), count(lit(1)).as("n"))
      .head()
    val (m, n) = (row.getSeq[Long](0), row.getLong(1))
    require(n > 0, "baseline corpus must be non-empty")
    m.map(c => c * 1000000L / n)
  }

  /** Deterministic train/val/test routing for a stream: the same
    * md5-bucket split as the batch `TextAnalysis.splitName`, so batch and
    * streaming ingestion route every document identically.
    */
  def withSplit(docs: DataFrame, keyCol: Column, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.withColumn("split", TextAnalysis.splitName(keyCol, trainPct, valPct))

  /** Streaming face of [[Curation.repetitionSignals]]: identical output
    * schema and values, stateless and append-mode compatible. The four
    * duplication metrics are the SAME column expressions (shared via
    * Curation.repetitionBaseCols); `top_word_n` swaps the batch's
    * two-level explode aggregation for a per-row higher-order expression —
    * O(distinct·words) per document, the right trade inside a micro-batch
    * (no shuffle, no state; route pathological multi-MB docs through the
    * batch operator instead).
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val topWordN = array_max(
      transform(array_distinct(words), w => size(filter(words, _ === w))))
      .cast("long").as("top_word_n")
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol) +: Curation.repetitionBaseCols(textCol) :+ topWordN: _*)
  }

  /** Bounded contamination sketch for the streaming face of
    * [[Curation.decontaminate]]: a Bloom filter over the distinct 64-bit
    * shingle hashes (the SAME native [[graft.functions.ShingleHash64]]
    * family as the batch operator) of the STATIC held-out split. The
    * sketch is the piece that makes stream-side decontamination scale: the
    * exact test-hash set is unbounded (billions of distinct 5-grams at
    * corpus scale — the reason the batch operator shuffles a semi-join
    * instead of broadcasting), but the bloom is O(n·log 1/fpp) BITS with
    * zero false negatives — ~1.2 GB for 10⁹ grams at 1% fpp, shippable to
    * every executor once, while false positives only ever drop a clean doc
    * (conservative for decontamination). Build is a one-time batch job:
    * explode → distinct hashes → `stat.bloomFilter` (distributed
    * aggregation, constant driver memory). `expectedItems = -1` (the
    * default) inherits [[Curation.contaminationBloom]]'s adaptive sizing —
    * one approx_count_distinct pass over the held-out side — because a
    * hardcoded capacity below the true cardinality silently saturates the
    * sketch (fpp → 1), and a saturated sketch makes [[decontaminateFilter]]
    * flag EVERY document as contaminated, dropping the whole stream. Pass
    * an explicit count only when the cardinality is already known.
    */
  def contaminationBloom(testDocs: DataFrame, k: Int = 5, textCol: String = "text",
                         expectedItems: Long = -1L,
                         fpp: Double = 0.001): org.apache.spark.util.sketch.BloomFilter =
    Curation.contaminationBloom(testDocs, k, textCol, expectedItems, fpp)

  /** Stateless streaming decontamination: pass through documents sharing NO
    * k-shingle with the held-out split's [[contaminationBloom]] sketch.
    * Zero false negatives by bloom construction — a contaminated document
    * can never pass; a false positive (rate `fpp`) drops a clean document,
    * the conservative direction. Per-row and stateless, so it runs in any
    * output mode with no watermark requirement; NULL-text documents carry
    * no shingles and pass. The membership probe is the broadcast-backed
    * codegen'd [[graft.functions.BloomAnyContains]] expression (via
    * [[Curation.mightOverlap]]) — the SAME probe as the batch prefilter,
    * primitive in-place array reads inside the whole-stage codegen span of
    * the shingle hashing that feeds it; the sketch ships to each executor
    * once, not once per micro-batch. Docs the bloom flags should go to the
    * exact batch semi-join ([[Curation.decontaminate]]) when a byte-exact
    * audit trail of WHAT matched is needed. Each call broadcasts the
    * sketch once; a long-lived service cycling refreshed sketches should
    * build a [[Curation.ContaminationProbe]] and `release()` each retired
    * sketch (see its scaladoc for the lifetime contract).
    */
  def decontaminateFilter(docs: DataFrame,
                          bloom: org.apache.spark.util.sketch.BloomFilter,
                          k: Int = 5, textCol: String = "text"): DataFrame = {
    // the shared broadcast-backed codegen'd probe (Curation.mightOverlap)
    // keeps the streaming face provably identical to the batch prefilter
    // and ships the sketch once per executor, not once per micro-batch.
    // NULL text carries no shingles: pass it through explicitly (the
    // null-intolerant probe would otherwise drop it as a null predicate)
    val contaminated = Curation.mightOverlap(docs.sparkSession, bloom)
    docs.filter(col(textCol).isNull ||
      !contaminated(graft.functions.ShingleHash64(col(textCol), k)))
  }

  /** Stateless streaming SUBSTRING-level decontamination gate — the
    * stream face of [[graft.operators.Dedup.substrContaminatedSpans]]'s
    * zero-overlap question: pass through documents sharing NO k-token
    * shingle with the frozen held-out split, probed EXACTLY against the
    * split's sorted fingerprint directory
    * ([[graft.operators.Dedup.substrDirectory]], binary search per
    * shingle — no sketch, no false positives in either direction, so
    * the stream verdict equals the batch semi-join's bit-for-bit;
    * spec'd batch≡stream). This is the leakage-prevention posture of
    * Lee et al. 2022's decontamination applied at INGESTION time:
    * never let a test-overlapping document into the training corpus at
    * all, instead of scrubbing spans at compaction.
    *
    * Per-row and stateless (any output mode, no watermark): the
    * directory rides one broadcast per call — ships to each executor
    * once, not per micro-batch. NULL-text docs pass (no shingles);
    * docs shorter than k tokens pass (they carry no k-shingle — the
    * batch operator filters them out of contamination marking for the
    * same reason, and ShingleHash64's <k joined-shingle fallback must
    * not be probed as if it were a k-shingle).
    */
  def deconFilter(docs: DataFrame,
                  directory: Array[Long],
                  k: Int = 8, textCol: String = "text"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val bc = docs.sparkSession.sparkContext.broadcast(directory)
    val anyHit = udf { (hs: scala.collection.Seq[Long]) =>
      val dir = bc.value
      var i = 0
      var hit = false
      while (i < hs.length && !hit) {
        hit = java.util.Arrays.binarySearch(dir, hs(i)) >= 0; i += 1
      }
      hit
    }
    docs.filter(col(textCol).isNull ||
      size(split(trim(col(textCol)), "\\s+")) < k ||
      !anyHit(graft.functions.ShingleHash64(col(textCol), k)))
  }

  /** Stateless streaming boilerplate strip — the ingest-edge face of
    * [[graft.operators.Dedup.lineDedupClean]]: rewrite each arriving
    * doc's text with every line in the FROZEN duplicate-line directory
    * removed ([[graft.operators.Dedup.lineDirectory]], built offline
    * from the reference corpus). A TRANSFORM gate, not a filter: docs
    * always pass, lighter. Same normalization as the batch face (sqlTrim
    * each line, drop blanks), so on the directory's own corpus the
    * stripped text equals the batch clean_text exactly (spec-pinned).
    * Per-row and stateless — replay-deterministic, no state store; null
    * text passes through null.
    */
  def lineStrip(docs: DataFrame, directory: Array[String],
                textCol: String = "text"): DataFrame = {
    // Pre-digest the hex directory ONCE on the driver into two parallel
    // long arrays (md5 hi/lo words) sorted unsigned — the per-row path
    // then does one md5 + one branchless word assembly + one binary
    // search, with no per-row MessageDigest allocation and no per-byte
    // "%02x" formatting (the ingest hot path; gramBuckets discipline).
    val pairs = directory.map { h =>
      require(h.length == 32, s"md5 hex directory entry of length ${h.length}: '$h'")
      (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(h.substring(16), 16))
    }.sortWith { case ((ah, al), (bh, bl)) =>
      val c = java.lang.Long.compareUnsigned(ah, bh)
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(al, bl) < 0
    }
    val bcHi = docs.sparkSession.sparkContext.broadcast(pairs.map(_._1))
    val bcLo = docs.sparkSession.sparkContext.broadcast(pairs.map(_._2))
    val strip = udf { (t: String) =>
      if (t == null) null
      else {
        val md = Md5Local.get()
        val his = bcHi.value
        val los = bcLo.value
        t.split("\n", -1).iterator
          .map(graft.operators.OpChecks.sqlTrim)
          .filter(_.nonEmpty)
          .filter { l =>
            md.reset()
            val d = md.digest(l.getBytes("UTF-8"))
            !md5PairContains(his, los, beLong(d, 0), beLong(d, 8))
          }
          .mkString("\n")
      }
    }
    docs.withColumn(textCol, strip(col(textCol)))
  }

  /** Stateless streaming encoding repair — the ingest-edge face of
    * [[graft.operators.TextAnalysis.fixMojibake]]: rewrite each arriving
    * doc's text with every known UTF-8-as-cp1252 mojibake sequence
    * repaired BEFORE any hashing or dedup sees it (a damaged and a clean
    * copy of one page must collide downstream). A TRANSFORM gate: docs
    * always pass; null text passes through null. Pure codegen'd column
    * expressions — per-row, stateless, replay-deterministic, any output
    * mode, no watermark; text-equal to the batch face by construction
    * (spec-pinned).
    */
  def mojibakeFix(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol,
      graft.operators.TextAnalysis.fixMojibake(col(textCol)))

  /** One MessageDigest per executor thread — MD5 instances are not
    * thread-safe and a udf closure can be shared across task threads in
    * one JVM.
    */
  private val Md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian long from 8 digest bytes at `off` — the same word the
    * hex directory's first/second 16 hex chars spell. */
  private def beLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Unsigned binary search over the parallel sorted (hi, lo) arrays. */
  private def md5PairContains(his: Array[Long], los: Array[Long],
                              hi: Long, lo: Long): Boolean = {
    var a = 0
    var b = his.length - 1
    while (a <= b) {
      val m = (a + b) >>> 1
      var c = java.lang.Long.compareUnsigned(his(m), hi)
      if (c == 0) c = java.lang.Long.compareUnsigned(los(m), lo)
      if (c == 0) return true
      if (c < 0) a = m + 1 else b = m - 1
    }
    false
  }

  /** Stateless streaming face of [[TextAnalysis.qualityRules]]: gate
    * arriving docs on the Gopher-style rules conjunction. Pure map-only
    * column expressions — no state store, replay-deterministic, batch ≡
    * stream by construction (the same rows survive on retry).
    */
  def qualityRulesFilter(docs: DataFrame, minWords: Int = 30, maxWords: Int = 10000,
                         minMeanLen: Int = 4, minStopwords: Int = 2,
                         textCol: String = "text"): DataFrame =
    docs.filter(TextAnalysis.qualityPass(col(textCol), minWords, maxWords, minMeanLen, minStopwords))

  /** Stateless streaming quality gate over the frozen linear scorer
    * ([[Curation.linearScore]]'s kernel behind a column face): pass
    * documents whose hashed-n-gram score is at least `minScore`. Per-row
    * and stateless — any output mode, no watermark; a NULL-text doc
    * carries no content and is dropped (a quality gate's posture, unlike
    * the dedup gates where null rows pass as trivially novel). Equal to
    * filtering the batch operator's output (spec'd batch≡stream).
    */
  def qualityLinearFilter(docs: DataFrame, minScore: Long = 0L, d: Int = 4096,
                          textCol: String = "text",
                          weightOf: Long => Long = Curation.defaultWeight): DataFrame =
    docs.filter(col(textCol).isNotNull &&
      Curation.linearScoreCol(col(textCol), d, weightOf) >= minScore)

  /** Stateless streaming DSIR gate: pass docs whose importance score —
    * the sum of FROZEN per-bucket weights ([[Curation.dsirWeights]],
    * trained offline on a raw/target snapshot) over the doc's hashed
    * grams — clears `minScore`. Per-row equal to thresholding
    * [[Curation.dsirScore]] (the kernel sums the same unigram+bigram
    * buckets; missing buckets score the neutral `scale`), so the gate is
    * spec'd batch ≡ stream. The weights frame is d-bounded: collected
    * once at stream build, shipped in the task closure like the decon
    * directory — no per-batch join, no state store, replay-deterministic.
    */
  def dsirFilter(docs: DataFrame, weights: DataFrame, minScore: Long,
                 d: Int = 4096, scale: Long = 1000000L,
                 textCol: String = "text"): DataFrame = {
    require(d >= 2, s"bucket count must be >= 2, got $d")
    val wm = weights
      .select(col("bucket").cast("long"), col("weight").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sc = scale
    docs.filter(col(textCol).isNotNull &&
      Curation.linearScoreCol(col(textCol), d, b => wm.getOrElse(b, sc)) >= minScore)
  }

  /** Stateful streaming source-quota gate — the ingest-edge face of
    * [[Curation.sourceBudgetSample]]: admit arriving docs while the
    * source's cumulative token count (over the WHOLE stream) stays within
    * its frozen quota, e.g. [[Curation.langBalance]]'s allocations. The
    * running counter advances for every arriving doc and a doc is
    * admitted iff its INCLUSIVE cumulative count fits — the
    * tokenBudgetSample never-overshoot rule, so a too-big doc also closes
    * the budget for everything after it (strict prefix, not knapsack
    * backfill: admission must be order-deterministic, and skip-and-refill
    * would admit different docs depending on micro-batch boundaries).
    *
    * State is ONE counter per source — bounded by the source vocabulary,
    * NEVER by the stream (the StreamProbe arm pins constant state rows);
    * no watermark, no eviction: a quota is a whole-stream contract.
    * Admission order: arrival order across batches, (md5(id), id) hash
    * order WITHIN a micro-batch (the group iterator carries no order
    * guarantee — an explicit sort keeps replays deterministic, and it
    * must be the HASH order, not bare id order, or a micro-batch holding
    * two same-source docs whose id order differs from hash order at the
    * quota frontier admits a different set than the batch face). When
    * arrival order is the (md5(id), id) hash order, the admitted set
    * equals the batch face's — that equality is spec'd, including the
    * order-inverting pair.
    */
  def sourceQuotaFilter(docs: DataFrame, quotas: Map[String, Long],
                        idCol: String = "doc_id", srcCol: String = "source",
                        textCol: String = "text"): DataFrame = {
    require(quotas.values.forall(_ >= 0), "quotas must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    val q = quotas
    docs
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(srcCol).cast("string"), lit("")).as("src"),
        coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L)).as("n"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (src: String, it: Iterator[(Long, String, Long)], state: GroupState[Long]) => {
          val quota = q.getOrElse(src, 0L)
          var cum = state.getOption.getOrElse(0L)
          val md = java.security.MessageDigest.getInstance("MD5")
          def md5Hex(s: String): String = {
            md.reset()
            md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
          }
          val out = it.toArray
            .sortBy { case (id, _, _) => (md5Hex(id.toString), id) }
            .iterator.flatMap { case (id, _, n) =>
              cum += n
              if (cum <= quota) Iterator.single((id, src, n, cum)) else Iterator.empty
            }.toVector
          state.update(cum)
          out.iterator
        })
      .toDF(idCol, srcCol, "n_tokens", "cum_tokens")
  }

  /** Windowed streaming face of [[Curation.piiScan]]: the same per-row hit
    * expressions (shared regexes + Curation.hits), aggregated per
    * watermarked tumbling window instead of per static group — the shape a
    * PII audit takes on an ingestion stream. Append-mode compatible;
    * window sums over any period equal the batch scan of the same rows.
    */
  def piiByWindow(docs: DataFrame, strCol: String = "text",
                  eventTimeCol: String = "event_time",
                  windowDuration: String = "1 minute",
                  watermarkDelay: String = "10 minutes"): DataFrame = {
    val s = coalesce(col(strCol), lit(""))
    docs
      .withColumn("__num", Curation.hits(s, Curation.NumberRe))
      .withColumn("__email", Curation.hits(s, Curation.EmailRe))
      .withColumn("__ip", Curation.hits(s, Curation.Ipv4Re))
      .withColumn("__red",
        (length(s) - length(regexp_replace(s, Curation.NumberRe, "#"))).cast("long"))
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum("__num").as("n_number_hits"),
        sum(when(col("__num") > 0, 1L).otherwise(0L)).as("n_with_number"),
        sum("__email").as("n_email_hits"),
        sum("__ip").as("n_ip_hits"),
        sum("__red").as("n_chars_redacted"),
      )
      .select(col("w.start").as("window_start"), col("n_rows"), col("n_number_hits"),
        col("n_with_number"), col("n_email_hits"), col("n_ip_hits"), col("n_chars_redacted"))
  }

  /** Stateless streaming ingestion gate — the stream face of
    * [[MinHash.nearDupAgainst]]: pass through documents sharing NO
    * MinHash-LSH band bucket with the frozen existing corpus, probed
    * through a [[MinHash.directoryBloom]] sketch. Zero false negatives by
    * bloom construction — a true band-duplicate of the existing corpus
    * can never pass; a false positive (rate `fpp`) drops a clean doc, the
    * conservative direction for ingestion (identical posture to
    * [[decontaminateFilter]]). Per-row and stateless: the signature fold
    * runs the bit-identical JVM kernels over the native ShingleHash64
    * column ([[MinHash.bucketKeys64Jvm]] — a per-row MinHash signature
    * has no codegen'd column form short of an explode+aggregate shuffle,
    * the same reasoning as [[dedupNearMinHash]]'s typed flatMap, so the
    * one probe UDF is the honest shape here), the sketch rides a
    * broadcast (ships once per executor, not once per micro-batch), no
    * state, no watermark requirement, any output mode. NULL-text docs
    * carry no shingles and pass. Stream-vs-stream duplicates are
    * deliberately NOT gated — [[dedupNearMinHash]] is that operator; this
    * face freezes the decision against the at-rest corpus so ingestion
    * order and batch boundaries cannot change results.
    */
  def dedupAgainstFilter(docs: DataFrame,
                         directory: MinHash.DirectoryBloom,
                         textCol: String = "text"): DataFrame = {
    // the (k, h, bands) contract travels WITH the sketch — a bare bloom
    // probed with mismatched parameters would silently void the
    // zero-false-negative guarantee (never-inserted keys probe false)
    val (k, h, bands) = (directory.k, directory.h, directory.bands)
    val bc = docs.sparkSession.sparkContext.broadcast(directory.bloom)
    val anyHit = udf { (hs: scala.collection.Seq[Long]) =>
      val keys = MinHash.bucketKeys64Jvm(hs.toArray, h, bands)
      var i = 0
      var hit = false
      while (i < keys.length && !hit) {
        hit = bc.value.mightContainLong(keys(i)); i += 1
      }
      hit
    }
    docs.filter(col(textCol).isNull ||
      !anyHit(graft.functions.ShingleHash64(col(textCol), k)))
  }

  /** Streaming face of [[Curation.lmScore]]: score an unbounded document
    * stream against a STATIC frozen LM (a [[Curation.lmTable]]-shaped
    * (bgh, n) frame) — the production shape for likelihood-filtering an
    * ingestion stream: freeze the LM once from a curated corpus, score
    * every arriving doc against it.
    *
    * Per doc: the same (n_bigrams, n_oov, ll_score) integer-exact columns
    * as the batch operator. The LM rides a STREAM-STATIC left join — the
    * one Structured Streaming join that needs no watermark state on the
    * static side, and the right choice here because the LM's vocabulary is
    * unbounded (billions of distinct bigrams at corpus scale — a broadcast
    * map or bloom cannot carry the counts). The per-doc fold is a
    * watermarked aggregation keyed by (event-time window, doc_id): every
    * bigram row of a doc inherits the doc's single event time, so a doc
    * never splits across windows and the streamed scores equal the batch
    * [[Curation.lmScoreAgainst]] of the same rows (spec'd). State is one
    * row per in-horizon doc, evicted as the watermark passes its window.
    * Null-text docs carry no bigrams and are dropped (they score (0,0,0)
    * in batch; a stream consumer sees them absent — callers needing the
    * zero rows union them back from the raw stream).
    */
  def lmScoreByWindow(docs: DataFrame, lm: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      eventTimeCol: String = "event_time",
                      windowDuration: String = "1 minute",
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    // n_bigrams/n_oov/ll_score count post-join rows, which is only correct
    // when the static LM has unique bgh keys (the lmTable shape). The LM is
    // a static batch frame built once per stream, so verify the key
    // contract eagerly and loudly — a duplicate-keyed LM would silently
    // inflate every score for the stream's whole lifetime. One distributed
    // aggregation at setup time, never per micro-batch.
    // count(col) and count_distinct both skip NULLs, so NULL-bgh rows —
    // which can never match the equi-join and cannot inflate scores —
    // do not trip the guard; only genuine duplicates among real keys do
    val keyStats = lm.agg(
      count(col("bgh")).as("rows"), count_distinct(col("bgh")).as("keys")).head()
    require(keyStats.getLong(0) == keyStats.getLong(1),
      s"lmScoreByWindow: LM frame has duplicate bgh keys (${keyStats.getLong(0)} non-null rows, " +
        s"${keyStats.getLong(1)} distinct) — pass a Curation.lmTable-shaped frame; " +
        "duplicate keys would multiply join rows and silently inflate scores")
    docs
      .withWatermark(eventTimeCol, watermarkDelay)
      .filter(col(textCol).isNotNull)
      .select(col(idCol), col(eventTimeCol),
        explode(graft.functions.ShingleHash64(col(textCol), 2)).as("bgh"))
      .join(lm, Seq("bgh"), "left")
      .groupBy(window(col(eventTimeCol), windowDuration), col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("n").isNull, 0L)
          .otherwise(length(bin(col("n"))).cast("long"))).as("ll_score"))
      .select(col(idCol), col("n_bigrams"), col("n_oov"), col("ll_score"))
  }
}
