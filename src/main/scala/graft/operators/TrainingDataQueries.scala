package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Registered queries for the training-data pipeline operators over the
  * `documents` and `embeddings` tables. Hash-based ops (minhash/simhash/
  * LSH) have no SQL oracle (xxhash64 is Spark-specific) → rows-only
  * checks + unit specs; the brute-force ANN and the multimodal decode
  * stub are deterministic enough to oracle.
  */
object TrainingDataQueries {

  val queries: Seq[Q] = Seq(
    // MinHash+LSH near-dup canonicalization (D2). Deterministic (fixed
    // seeds) but not SQL-expressible → rows-only.
    Q(
      "d_minhash_lsh",
      (s, dir) =>
        MinHash
          .nearDupCanonical(Tables(s, dir, "documents"))
          .orderBy("doc_id"),
      None,
    ),
    // SimHash fingerprints + chunk-bucket canonicalization (D3).
    Q(
      "d_simhash",
      (s, dir) =>
        SimHash
          .nearDupCanonical(Tables(s, dir, "documents"))
          .select(col("doc_id"), hex(col("simhash")).as("simhash_hex"), col("canonical_id"))
          .orderBy("doc_id"),
      None,
    ),
    // n-gram Jaccard verification of LSH candidates (D4): top-20 candidate
    // pairs by exact 3-gram Jaccard.
    Q(
      "d_ngram_jaccard",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        // estimate-then-verify: rank LSH candidates by how many bands they
        // collide in (pairs expanded inside each small bucket array — the
        // signature pipeline runs ONCE, no self-join), then run the exact
        // shingle-set Jaccard only on the top slice. At scale exact
        // verification of every candidate dominates the job.
        val estimated = MinHash
          .bucketPairCounts(MinHash.signatures(docs, "doc_id", "text"), maxBucket = 20)
          .orderBy(col("shared_bands").desc, col("id_a"), col("id_b"))
          .limit(100)
        // 100 candidate rows — broadcast them (and the first join's output)
        // into the text lookups so the doc table is never shuffled
        broadcast(broadcast(estimated)
          .join(docs.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a")))
          .join(docs.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            round(MinHash.exactJaccard(col("text_a"), col("text_b")), 4).as("jaccard"))
          .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      None,
    ),
    // Embedding-cosine near-dup pairs via LSH buckets (D5).
    Q(
      "d_embed_neardup",
      (s, dir) =>
        Similarity
          .nearDupPairs(Tables(s, dir, "embeddings"), threshold = 0.2)
          .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim_r"))
          .orderBy(col("sim_r").desc, col("id_a"), col("id_b"))
          .limit(50),
      None,
    ),
    // Brute-force cosine top-5 for the first 10 vectors — oracle-able via
    // DuckDB list_cosine_similarity; output is the SORTED neighbor-id set
    // per query (robust to float32-vs-float64 rank flips inside the top-5).
    Q(
      "ann_brute_topk",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        Similarity
          .bruteForceTopK(emb, queries, k = 5)
          .groupBy("query_id")
          .agg(
            array_join(transform(array_sort(collect_list(col("neighbor_id"))), _.cast("string")), ",")
              .as("neighbors"))
          .orderBy("query_id")
      },
      Some("""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding, q.qv) AS sim
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
              FROM s)
        SELECT query_id,
               string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY neighbor_id) AS neighbors
        FROM r WHERE rk <= 5 GROUP BY query_id ORDER BY query_id"""),
    ),
    // LSH-bucketed ANN (the scale path) — rows-only; recall vs brute force
    // is asserted in the unit spec.
    Q(
      "ann_lsh_topk",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        Similarity
          .lshTopK(emb, queries, k = 5, planes = 4)
          .groupBy("query_id")
          .agg(
            array_join(transform(array_sort(collect_list(col("neighbor_id"))), _.cast("string")), ",")
              .as("neighbors"))
          .orderBy("query_id")
      },
      None,
    ),
    // Multimodal decode plumbing: text bytes as the stand-in blob; decode
    // stub is pure arithmetic on the byte length → SQL-oracle-able.
    Q(
      "mm_decode_meta",
      (s, dir) => {
        val blobs = Tables(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        Multimodal
          .decodeAndFeaturize(blobs, "blob")
          .select(
            col("doc_id"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.channels").as("channels"),
            col("meta.format").as("format"),
          )
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(64 + strlen(text) % 512 AS INT) AS width,
               CAST(64 + (strlen(text) // 7) % 512 AS INT) AS height,
               CAST(1 + strlen(text) % 3 AS INT) AS channels,
               CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        FROM documents ORDER BY doc_id"""),
    ),
  )
}
