package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate fingerprinting.
  *
  * For each token, xxhash64 contributes +1/−1 per bit position; the
  * fingerprint takes the sign of each accumulated position. Near-dups are
  * found by banding the fingerprint into 4 × 16-bit chunks — two docs
  * within Hamming distance 3 must share at least one exact chunk
  * (pigeonhole), so chunk equality is a complete candidate filter for
  * d ≤ 3.
  *
  * The whole computation is per-row column expressions (no UDF, no
  * shuffle); only the chunk-bucket join shuffles, on 16-bit keys.
  */
object SimHash {

  /** 64-bit simhash of a token array, as LongType. bit j of the result is
    * set iff sum over tokens of sign(bit j of xxhash64(token)) > 0. One
    * fold over tokens updating all 64 counters per step.
    *
    * NOTE: array-lambda form — Spark interprets higher-order lambdas, so
    * prefer [[simhashOf]] (explode + codegen'd hash agg) for bulk jobs.
    */
  def simhash64(tokens: Column): Column = {
    val counts = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)), i => call_function("shiftright", xxhash64(t), i).bitwiseAND(lit(1L))),
          (c, bit) => c + when(bit === 1L, 1).otherwise(-1),
        ),
    )
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)), (c, i) =>
        when(c > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x),
    )
  }

  /** (idCol, simhash) for a whole DataFrame, via explode + 64 codegen'd
    * conditional-sum aggregates: partial aggregation collapses each doc's
    * tokens map-side, so the shuffle carries one row per doc. The
    * per-token hash is computed once (not once per bit), inside
    * [[graft.functions.ShingleHash64]] with k = 1 — identical values to
    * `xxhash64(token)` (k=1 parity is pinned by ShingleHash64Spec) but the
    * explode emits primitive longs instead of token strings.
    */
  def simhashOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs
      .select(col(idCol), explode(graft.functions.ShingleHash64(col(textCol), 1)).as("__h"))
    val sums = hashed
      .groupBy(idCol)
      .agg(
        (0 until 64).map { j =>
          sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"c$j")
        }.head,
        (1 until 64).map { j =>
          sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"c$j")
        }: _*
      )
    val fp = (0 until 64)
      .map(j => when(col(s"c$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col(idCol), fp.as("simhash"))
  }

  /** the 4 16-bit chunks of a simhash (candidate-bucket keys) */
  def chunks(sh: Column): Column =
    array((0 until 4).map(i => shiftrightunsigned(sh, i * 16).bitwiseAND(lit(0xffffL))): _*)

  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Verified Hamming self-join over precomputed fingerprints — the
    * "Hamming join" the hash faces advertise, as an operator: all pairs
    * with `bit_count(a XOR b) ≤ r`, found by multi-index pigeonhole
    * banding (4 chunks of bits/4; distance ≤ 3 forces at least one EQUAL
    * chunk, so same-chunk buckets are a complete candidate filter for
    * r ≤ 3) and then VERIFIED by the exact bit count. The emitted set is
    * exactly the distance-≤-r set PROVIDED no candidate bucket exceeds
    * `maxBucket` — a dropped hot bucket loses every pair whose only
    * shared chunk it was, and at scale the hottest buckets are exactly
    * the most-replicated content. That completeness hole is why the
    * `maxHotDropFrac` guard is ARMED BY DEFAULT: a pre-flight bucket
    * count (one map-side-combined aggregation over the memberships —
    * noise next to the pair expansion it protects) measures the fraction
    * of candidate-PAIR mass (Σ n·(n−1)/2 per bucket — pair loss is
    * quadratic in bucket size, so a linear membership share would wave
    * through a single huge duplicate cluster hiding in a big corpus)
    * sitting in over-cap buckets, and fails loudly with a sizing hint
    * when it exceeds the bound. Pass `maxHotDropFrac = 1.0` to opt into
    * the old prospective-cap semantics (silent subset).
    *
    * Scale shape: the only shuffle is the chunk-bucket exchange on
    * (chunk_idx, chunk) keys; pairs expand inside each bucket's member
    * array (no self-join — the fingerprint lineage evaluates once), hot
    * buckets above `maxBucket` are dropped BEFORE member arrays
    * materialize (windowed count), and cross-bucket duplicate pairs
    * collapse with a distinct on the 3 small output columns. Null
    * fingerprints (null text upstream) never join.
    */
  def hammingPairs(sh: DataFrame, r: Int = 3, bits: Int = 64,
                   idCol: String = "doc_id", shCol: String = "simhash",
                   maxBucket: Int = 1000,
                   maxHotDropFrac: Double = 0.05): DataFrame = {
    require(r >= 0 && r <= 3, "4-chunk pigeonhole banding is complete only for r <= 3")
    require(bits % 4 == 0 && bits >= 4 && bits <= 64)
    require(maxHotDropFrac >= 0.0 && maxHotDropFrac <= 1.0)
    OpChecks.requireIntegralId(sh, idCol) // the long cast below would null out non-integral ids
    val chunkBits = bits / 4
    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk_idx", "chunk")
    val fps0 = sh.filter(col(shCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(shCol).cast("long").as("sh"))
    // armed guard ⇒ the memberships lineage is read TWICE (pre-flight +
    // join path). The upstream fingerprint compute is the expensive part
    // (64-agg simhash, image decode+hash), so materialize the 16-byte
    // (id, sh) rows once — the eager checkpoint IS the pre-flight's scan,
    // and the main pass re-reads checkpointed primitives instead of
    // re-running the whole lineage.
    // r21: spread the 16-byte rows before the checkpoint so the
    // checkpointed RDD keeps core-count partitions (the upstream agg's
    // AQE-coalesced output is ONE partition at bench scale, which would
    // single-thread every downstream stage reading the checkpoint)
    val fps = if (maxHotDropFrac < 1.0) graft.Spread(fps0).localCheckpoint(true) else fps0
    // r21: explicit-count user-intent exchange on the bucket key feeding
    // BOTH the hot-count window and the member-array groupBy (same key →
    // one exchange, guide §2.4); the planner's own exchange here is
    // AQE-coalescible and serialized the pair expansion at bench scale
    val memberships = fps
      .select(col("id"), col("sh"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sh"), i * chunkBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("chunk_idx", "chunk")))
      .repartition(fps.sparkSession.sessionState.conf.numShufflePartitions,
        col("chunk_idx"), col("chunk"))
    if (maxHotDropFrac < 1.0) {
      // n·(n−1) not halved: the /2 cancels in the ratio, and staying in
      // long arithmetic avoids Divide's double rounding at huge counts
      val pairs = col("n") * (col("n") - 1)
      val r0 = memberships
        .groupBy("chunk_idx", "chunk").agg(count(lit(1)).as("n"))
        .agg(
          sum(pairs).as("total"),
          sum(when(col("n") > maxBucket, pairs).otherwise(0L)).as("dropped"))
        .head
      val total = if (r0.isNullAt(0)) 0L else r0.getLong(0)
      val dropped = if (r0.isNullAt(1)) 0L else r0.getLong(1)
      if (total > 0 && dropped.toDouble / total > maxHotDropFrac)
        throw new IllegalStateException(
          f"hammingPairs: ${dropped / 2} of ${total / 2} candidate pairs " +
            f"(${dropped * 100.0 / total}%.1f%%) sit in buckets over the hot " +
            f"cap ($maxBucket) — dropping them silently loses pairs among the " +
            f"MOST-replicated fingerprints. Raise maxBucket past the largest " +
            f"duplicate cluster, pre-collapse exact-duplicate fingerprints, " +
            f"or pass maxHotDropFrac = 1.0 to accept a documented subset.")
    }
    memberships
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n").between(2, maxBucket))
      .groupBy("chunk_idx", "chunk")
      .agg(array_sort(collect_list(struct(col("id"), col("sh")))).as("ms"))
      .select(explode(MinHash.pairExpand("ms")).as("p"))
      .select(
        col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        hamming(col("p.a.sh"), col("p.b.sh")).as("dist"))
      .filter(col("dist") <= r)
      .distinct()
  }

  // ------------------------------------------------- md5 oracle hash family

  /** [[simhashOf]] in the md5 oracle family (see MinHash.md5Hash60): token
    * hash = md5_60(token), fingerprint over the low `bits` bits — every
    * step bit-identical in DuckDB SQL, so the whole pipeline hash-matches
    * an independent engine. Production stays on the xxhash64 64-bit path.
    */
  def simhashOfMd5(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   bits: Int = 32): DataFrame = {
    // r21: spread the doc rows before the md5-per-token explode + the
    // `bits`-aggregate fold — on a one-split bench scan this whole stage
    // ran single-task (graft.Spread doc; no-op at lake scale)
    val hashed = graft.Spread(docs.filter(col(textCol).isNotNull))
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("__t"))
      .select(col(idCol), MinHash.md5Hash60(col("__t")).as("__h"))
    val sums = hashed
      .groupBy(idCol)
      .agg(
        (0 until bits).map { j =>
          sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"c$j")
        }.head,
        (1 until bits).map { j =>
          sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"c$j")
        }: _*
      )
    val fp = (0 until bits)
      .map(j => when(col(s"c$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col(idCol), fp.as("simhash"))
  }

  /** [[nearDupCanonical]] in the md5 oracle family: 4 × (bits/4)-bit chunks
    * (Hamming ≤ 3 complete filter by pigeonhole), same hot-bucket window
    * shape, docs with no memberships (null text) self-canonical.
    */
  def nearDupCanonicalMd5(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                          bits: Int = 32, maxBucket: Int = 100): DataFrame = {
    val chunkBits = bits / 4
    val mask = (1L << chunkBits) - 1
    val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk_idx", "chunk")
    val fromChunks = simhashOfMd5(docs, idCol, textCol, bits)
      .select(
        col(idCol), col("simhash"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("simhash"), i * chunkBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("chunk_idx", "chunk")),
      )
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__bmin", min(col(idCol)).over(w))
      .groupBy(idCol)
      .agg(
        first("simhash").as("simhash"),
        min(when(col("__n") <= maxBucket, col("__bmin"))).as("__cmin"),
      )
    docs.select(col(idCol))
      .join(fromChunks, Seq(idCol), "left")
      .select(col(idCol), col("simhash"),
        coalesce(col("__cmin"), col(idCol)).as("canonical_id"))
  }

  /** docs → (doc_id, simhash, canonical_id) where canonical is the min
    * doc_id sharing any 16-bit chunk (Hamming ≤ 3 complete filter).
    */
  def nearDupCanonical(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                       maxBucket: Int = 100): DataFrame = {
    // single evaluation of the expensive lineage (the simhash pipeline —
    // explode + 64 aggregates — is the dominant cost; a SELF-join would
    // recompute it per side): a window over the chunk key attaches
    // (size, min) to each membership row, then a per-doc min over non-hot
    // chunks. Hot chunks (> maxBucket) are low-information and fall out of
    // the conditional min; a doc whose every chunk is hot keeps itself as
    // canonical via the coalesce. The final left join back from the cheap
    // id-only scan keeps null-text docs (no shingles → no simhash rows)
    // self-canonical instead of silently dropping them — same contract as
    // the md5 twin and the MinHash family.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk_idx", "chunk")
    val computed = simhashOf(docs, idCol, textCol)
      .select(
        col(idCol), col("simhash"),
        posexplode(chunks(col("simhash"))).as(Seq("chunk_idx", "chunk")),
      )
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__bmin", min(col(idCol)).over(w))
      .groupBy(idCol)
      .agg(
        first("simhash").as("simhash"),
        min(when(col("__n") <= maxBucket, col("__bmin"))).as("__cmin"),
      )
    docs.select(col(idCol))
      .join(computed, Seq(idCol), "left")
      .select(col(idCol), col("simhash"),
        coalesce(col("__cmin"), col(idCol)).as("canonical_id"))
  }
}
