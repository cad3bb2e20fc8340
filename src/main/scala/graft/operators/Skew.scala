package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling primitives. AQE's runtime skew-join split covers
  * the sort-merge-join case automatically (GraftSession enables it); these
  * are the deterministic, plan-level forms for the cases AQE can't touch:
  * a join the optimizer won't split, and hot-key aggregations whose state
  * (distinct sets) defeats map-side partial aggregation.
  */
object Skew {

  /** Deterministic salted inner equi-join: the big side derives a salt
    * from its full row content (stable under repartitioning — no rand()),
    * the small-but-not-broadcastable side is replicated once per salt, and
    * the join key becomes (key, salt), spreading each hot key over
    * `factor` reducers. Row-identical to `big.join(small, key)`; costs a
    * `factor`× replication of the small side, the standard trade.
    *
    * PRECONDITION for the spreading (not for correctness): the hot key's
    * rows must differ somewhere outside the key — content-identical
    * duplicate rows hash to ONE salt and still land on one reducer. That
    * is the price of a deterministic salt: a random or positional salt
    * would spread them, but nondeterministic shuffle keys corrupt results
    * under partial stage retries (the reason Spark sorts round-robin
    * partitions), so rows with no distinguishing content keep the skew.
    * De-duplicate such rows (or carry a precomputed row id) first.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int = 8): DataFrame = {
    require(factor >= 1)
    val salted = big.withColumn(
      "__salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor.toLong)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact distinct count per key without a hot key's whole value set ever
    * landing on one reducer: stage 1 groups by (key, hash(value) mod
    * factor) — value-hash partitions are DISJOINT, so per-salt distinct
    * counts sum exactly — stage 2 sums the per-salt counts. Two narrow
    * shuffles of (key, salt)-sized rows instead of one reducer holding the
    * hot key's full distinct set.
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
                          factor: Int = 32): DataFrame = {
    require(factor >= 1)
    df.groupBy(col(key), pmod(xxhash64(col(value)), lit(factor.toLong)).as("__salt"))
      .agg(count_distinct(col(value)).as("__c"))
      .groupBy(col(key))
      .agg(sum("__c").as("n_distinct"))
  }
}
