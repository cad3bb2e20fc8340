package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over a text column.
  *
  * Pipeline:
  *   tokens → word k-shingles (array expr, no shuffle)
  *   → explode shingles → groupBy(doc) with H × min(xxhash64(shingle, i))
  *     aggregates. This stays inside whole-stage codegen (Spark's
  *     higher-order array lambdas are interpreted — computing 64 minhashes
  *     via transform/array_min is 64 interpreted traversals per doc; the
  *     explode+hash-agg form is codegen'd and the partial aggregation
  *     collapses each doc's shingles map-side, so the shuffle carries one
  *     65-column row per doc)
  *   → B bands of R rows; band key = hash of the minhash slice
  *   → explode bands (B rows per doc — bounded fanout)
  *   → groupBy (band, key): docs sharing any band bucket are candidates;
  *     buckets larger than `maxBucket` are dropped as low-information
  *     (word-salad / boilerplate collisions — at 100 TB a single hot
  *     bucket would otherwise quadratically explode the candidate join)
  *   → canonical = min doc_id over a doc's buckets (one-pass practical
  *     approximation of the connected-component closure; iterate to a
  *     fixpoint when exact clusters are needed)
  */
object MinHash {

  /** word k-shingles of a text column */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = split(trim(text), "\\s+")
    when(size(words) < k, array(concat_ws(" ", words)))
      .otherwise(
        transform(
          sequence(lit(0), size(words) - k),
          i => concat_ws(" ", slice(words, i + 1, lit(k))),
        )
      )
  }

  /** (idCol, sig: array<long>) — H-element minhash signatures, computed
    * via explode + codegen'd hash aggregation (see object doc).
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String, k: Int = 3, h: Int = 64): DataFrame =
    docs
      .select(col(idCol), explode(shingles(col(textCol), k)).as("__shingle"))
      .groupBy(idCol)
      .agg(
        array((0 until h).map(i => min(xxhash64(col("__shingle"), lit(i)))): _*).as("sig")
      )

  /** band keys: hash each of B slices of R signature values */
  def bandKeys(sig: Column, bands: Int = 16, rows: Int = 4): Column =
    array((0 until bands).map(b => hash(lit(b), slice(sig, b * rows + 1, rows))): _*)

  /** (idCol, band, bk) — exploded LSH bucket memberships, hot buckets
    * (> maxBucket members) dropped. `sigs` = output of [[signatures]]
    * (pass a cached frame when also using the signatures downstream).
    */
  def bandedBucketsFromSigs(sigs: DataFrame, idCol: String = "doc_id",
                            h: Int = 64, bands: Int = 16, maxBucket: Int = 50): DataFrame = {
    val rows = h / bands
    val banded = sigs
      .select(col(idCol), posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "bk")))
    val sized = banded.groupBy("band", "bk").agg(count(lit(1)).as("n"), min(idCol).as("bucket_min"))
    banded.join(sized.filter(col("n") <= maxBucket), Seq("band", "bk"))
  }

  def bandedBuckets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                    k: Int = 3, h: Int = 64, bands: Int = 16, maxBucket: Int = 50): DataFrame =
    bandedBucketsFromSigs(signatures(docs, idCol, textCol, k, h), idCol, h, bands, maxBucket)

  /** docs → (doc_id, canonical_id): canonical is the smallest doc_id this
    * doc shares any LSH bucket with (including itself).
    */
  def nearDupCanonical(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3,
      h: Int = 64,
      bands: Int = 16,
      maxBucket: Int = 50,
  ): DataFrame = {
    val all = docs.select(col(idCol))
    val fromBuckets = bandedBuckets(docs, idCol, textCol, k, h, bands, maxBucket)
      .groupBy(idCol)
      .agg(min("bucket_min").as("canonical_id"))
    // docs whose every bucket was hot (or with no shingles) stay their own
    // canonical
    all
      .join(fromBuckets, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("canonical_id"), col(idCol)).as("canonical_id"))
  }

  /** candidate near-dup pairs (id_a < id_b), deduped across bands */
  def candidatePairsFromSigs(sigs: DataFrame, idCol: String = "doc_id",
                             h: Int = 64, bands: Int = 16, maxBucket: Int = 20): DataFrame = {
    val b = bandedBucketsFromSigs(sigs, idCol, h, bands, maxBucket)
    val l = b.select(col("band"), col("bk"), col(idCol).as("id_a"))
    val r = b.select(col("band"), col("bk"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  def candidatePairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                     k: Int = 3, h: Int = 64, bands: Int = 16, maxBucket: Int = 20): DataFrame =
    candidatePairsFromSigs(signatures(docs, idCol, textCol, k, h), idCol, h, bands, maxBucket)

  /** estimated Jaccard similarity from two signatures */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0),
      (acc, x) => acc + x,
    ).cast("double") / size(sigA)

  /** exact n-gram Jaccard between two texts (for candidate verification) */
  def exactJaccard(textA: Column, textB: Column, k: Int = 3): Column = {
    val sa = array_distinct(shingles(textA, k))
    val sb = array_distinct(shingles(textB, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }
}
