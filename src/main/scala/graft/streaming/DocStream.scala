package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

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

  /** Deterministic train/val/test routing for a stream: the same
    * md5-bucket split as the batch `TextAnalysis.splitName`, so batch and
    * streaming ingestion route every document identically.
    */
  def withSplit(docs: DataFrame, keyCol: Column, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.withColumn("split", TextAnalysis.splitName(keyCol, trainPct, valPct))
}
