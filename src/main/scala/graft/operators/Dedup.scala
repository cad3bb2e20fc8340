package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deduplication operators over `documents`. Exact dedup is here; MinHash/
  * SimHash/Jaccard/embedding variants live alongside and register their own
  * queries as they land.
  */
object Dedup {

  /** Exact dedup: canonical id per identical text. Group on the md5
    * fingerprint, not the full text — at 100 TB you shuffle 16-byte keys,
    * not document bodies.
    */
  def exactCanonical(docs: DataFrame): DataFrame = {
    val canon = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("canonical_id"))
    docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .join(canon, "fp")
      .select("doc_id", "canonical_id")
  }

  val queries: Seq[Q] = Seq(
    Q(
      "d_exact_dup",
      (s, dir) => exactCanonical(Tables(s, dir, "documents")).orderBy("doc_id"),
      Some("""
        SELECT d.doc_id, m.canonical_id
        FROM documents d
        JOIN (SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id
              FROM documents GROUP BY md5(text)) m
          ON md5(d.text) = m.fp
        ORDER BY d.doc_id"""),
    )
  )
}
