package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch: a base-2 log histogram with
  * 16 sub-buckets per octave (the HdrHistogram / DDSketch design family —
  * Tene's HdrHistogram; Masson, Rim & Lee, VLDB 2019 "DDSketch: a fast
  * and fully-mergeable quantile sketch with relative-error guarantees").
  * Completes this module family's sketch triad: CMS answers frequency,
  * HLL answers cardinality, this answers QUANTILES — the dataset-card
  * p50/p90/p99 a 100 TB corpus release reports when the exact per-source
  * histogram of [[graft.operators.TextAnalysis.lengthQuantiles]] (one row
  * per DISTINCT value) is itself big data.
  *
  * Bucket rule for a non-negative long `v` (s = 4 sub-bucket bits):
  *   - `v < 16`  → bucket = v (small values EXACT — zero error);
  *   - `v ≥ 16`  → with e = ⌊log2 v⌋ = bitlen(v)−1:
  *                 bucket = (e−4)·16 + (v >> (e−4)).
  * The map is monotone and contiguous (bucket 15 = value 15, bucket 16 =
  * values {16}, …), so bucket(quantile(p)) = quantile-bucket(p): the
  * sketch's quantile answer is the TRUE value's bucket, never a
  * neighbouring one. Bucket b ≥ 16 covers [lo, lo+w−1] with
  * lo = (b%16 + 16) << (b/16 − 1), w = 1 << (b/16 − 1), so the relative
  * width w/lo = 1/(b%16+16) ≤ 1/16 — a ≤6.25% relative-error guarantee,
  * from pure integer ops both engines share (`length(bin(v))`, `>>`):
  * a DuckDB oracle replays the ENTIRE histogram AND every quantile bound
  * integer-exactly. No floats, no seeds, no merge-order dependence (the
  * property KLL/GK lack — their compactions depend on arrival order, so
  * their outputs can't cross an engine boundary or a partitioning change).
  *
  * Scale shape: [[LogHistogram.Agg]] folds each partition into ONE dense
  * 960-long array (7.7 KB) and the exchange carries one partial per
  * (partition, group); merge is elementwise sum — LINEAR, so per-source /
  * per-day matrices sum to the global matrix exactly (spec-pinned), which
  * is what lets 1000 executors or 30 daily jobs sketch independently.
  * Domain: exact over the FULL non-negative long range — the top bucket's
  * upper bound saturates exactly at Long.MaxValue (upperBound(959) ==
  * Long.MaxValue, pinned by the QsketchSpec/QsketchSqlSpec sweeps), so no
  * clamp is needed anywhere; [[Agg]] clamps negatives to 0 rather than
  * throw (a corrupt length must not kill a 100 TB pass; bucket 0 is
  * visible).
  */
object LogHistogram {

  /** Dense array length: buckets 0..959 cover the full non-negative long
    * range (bitlen ≤ 63 → max bucket (62−4)·16 + 31 = 959).
    */
  val NumBuckets = 960

  /** Bucket of a non-negative long — the Scala twin of [[bucketCol]]. */
  def bucket(v: Long): Int = {
    val x = if (v < 0) 0L else v
    if (x < 16) x.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      ((e - 4) * 16 + (x >>> (e - 4))).toInt
    }
  }

  /** Inclusive lower bound of bucket `b`. */
  def lowerBound(b: Int): Long =
    if (b < 16) b.toLong else ((b % 16 + 16).toLong << (b / 16 - 1))

  /** Inclusive upper bound of bucket `b` (== lower for exact buckets).
    * Width subtracts 1 BEFORE adding to the lower bound, so the top
    * bucket (959, hi = Long.MaxValue) stays inside int64 — the oracle's
    * SQL twin parenthesizes identically.
    */
  def upperBound(b: Int): Long =
    if (b < 16) b.toLong else lowerBound(b) + ((1L << (b / 16 - 1)) - 1)

  /** The bucket rule as codegen'd column expressions — the declarative
    * build the oracle replays and the spec pins equal to the Aggregator.
    * `shiftright`'s amount is itself a column (Spark's Scala API only
    * takes a literal amount), so these go through `expr` over a NAMED
    * column: callers alias their value column to `vName` first (the
    * module-internal contract). All integer ops (`bin`, `shiftright`,
    * `div`) — the exact primitives the DuckDB oracle mirrors.
    */
  def bucketColOf(vName: String): Column = {
    val v = col(vName)
    // negatives clamp to bucket 0 — the SAME corrupt-length posture as
    // [[Agg]]/[[bucket]], so the declarative build, the Aggregator, and
    // the SQL oracle can never diverge on a corrupt row
    when(v < 0, lit(0L))
      .when(v < 16, v)
      .otherwise((length(bin(v)) - lit(5)).cast("long") * 16 +
        expr(s"shiftright($vName, length(bin($vName)) - 5)"))
      .cast("long")
  }

  /** Inclusive lower bound over a named LONG bucket column. */
  def lowerBoundColOf(bName: String): Column = {
    val b = col(bName)
    when(b < 16, b)
      .otherwise(expr(s"shiftleft($bName % 16 + 16, cast($bName div 16 as int) - 1)"))
      .cast("long")
  }

  /** Inclusive upper bound over a named LONG bucket column. */
  def upperBoundColOf(bName: String): Column = {
    val b = col(bName)
    when(b < 16, b)
      .otherwise(lowerBoundColOf(bName) +
        (expr(s"shiftleft(cast(1 as bigint), cast($bName div 16 as int) - 1)") - 1))
      .cast("long")
  }

  /** One-pass map-side-merge histogram builder over a long column. */
  final class Agg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](NumBuckets)
    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      buf(bucket(v)) += 1L
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
