package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnigramTokenize

/** Unigram-LM vocabulary TRAINING — the missing half of
  * [[graft.functions.UnigramTokenize]]'s story (the apply face scopes
  * itself to a frozen model; a real pipeline derives the model from its
  * own corpus). This is the hard-EM / Viterbi-EM variant of Kudo 2018
  * §3.2's EM loop, kept INTEGER-exact so a DuckDB oracle can replay the
  * whole training run: the E-step segments every word TYPE with the
  * current model's Viterbi decode (the exact
  * [[graft.functions.UnigramTokenize]] kernel — one tokenizer, two
  * faces, no drift), and the M-step re-scores each piece as an integer
  * LOG-PROBABILITY surrogate: `bitlen(usage) − bitlen(total_usage)` ≈
  * log₂ p(piece) (the c_lm_score bit-length discipline). The scores are
  * NEGATIVE, which is what makes the objective a real language model:
  * every extra piece costs ~bitlen(total), so Viterbi trades piece
  * count against piece probability exactly like Kudo's Σ log p — a
  * first cut with POSITIVE bitlen(usage) scores was built and MEASURED
  * degenerating to all-single-character segmentations (additive
  * positive scores reward more pieces; the committed fixture showed
  * 'agg' → a+g+g with every multi-char piece's usage at 0), which is
  * why the offset is part of the contract and the degeneracy is
  * spec-pinned against.
  *
  * Seeding follows SentencePiece's substring-count recipe: every
  * substring of length ≤ maxPieceLen of every word type, scored by
  * occurrence-weighted counts — single characters are always included,
  * so every word stays coverable through every iteration.
  *
  * Determinism contract (mirrored by the oracle): piece ids are the
  * 1-based LEXICOGRAPHIC rank of the piece string (ASCII corpus ⇒ JVM
  * UTF-16 order == DuckDB byte order), Viterbi ties break by the
  * tokenizer's (score DESC, count ASC, id lex ASC) chain, usage sums
  * are exact integers, and the M-step is a pure function of usage.
  * Substring seeding indexes by JVM chars here and by code points in
  * the oracle — identical for ASCII/BMP word stocks (this corpus);
  * an astral-plane corpus would need byte-indexed seeding on both
  * sides before the cross-engine compare holds.
  *
  * Scale shape: word TYPES (not occurrences) drive the E-step — one
  * explode + map-side-combined count builds (word, freq) once, and each
  * iteration is a typed map over word types with the compiled model in
  * the closure (the per-JVM LRU cache amortizes compilation) followed by
  * one map-side-combined usage aggregation. The collected model is
  * bounded by the ALPHABET, not the corpus: candidate pieces number at
  * most Σ_k |Σ|^k (≈475k for lowercase ASCII at maxPieceLen 4), so the
  * driver never holds corpus-scale state at any data size.
  */
object UnigramTrain {

  /** Corpus word types with occurrence counts. */
  def wordTypes(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Bit length of u (0 for u ≤ 0) — DuckDB's `length(bin(u))`. */
  private def bitlen(u: Long): Long =
    if (u <= 0) 0L else 64L - java.lang.Long.numberOfLeadingZeros(u)

  /** Run `iters` hard-EM iterations; returns (piece, score, usage) in
    * piece-lex order (ids are positions + 1).
    */
  def train(docs: DataFrame, iters: Int = 2, maxPieceLen: Int = 4,
            textCol: String = "text",
            maxLocalTypes: Long = BpeTrain.TrainLocalMaxTypes): Seq[(String, Long, Long)] = {
    require(iters >= 0 && maxPieceLen >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val wt = wordTypes(docs, textCol).as[(String, Long)]
    // small-type-table arm (the BpeTrain.trainLocal precedent): the E/M
    // aggregations run over the Heaps-bounded word-TYPE table, so under
    // the bound they replay on the driver — the SAME substring expansion,
    // the SAME JVM Viterbi kernel (UnigramTokenize is what the
    // distributed flatMap calls anyway), the same integer sums. Above the
    // bound every aggregation below stays distributed, unchanged.
    val wtLocal: Option[Array[(String, Long)]] =
      if (maxLocalTypes > 0 && wt.count() <= maxLocalTypes) Some(wt.collect()) else None
    // seed: occurrence-weighted substring counts, pieces in lex order
    val maxPl = maxPieceLen
    val seed: Array[(String, Long)] = wtLocal match {
      case Some(arr) =>
        val m = new java.util.HashMap[String, Long]()
        arr.foreach { case (w, f) =>
          for {
            st <- 0 until w.length
            pl <- 1 to math.min(maxPl, w.length - st)
          } m.merge(w.substring(st, st + pl), f, (x, y) => x + y)
        }
        val b = Array.newBuilder[(String, Long)]
        m.forEach((p, u) => b += ((p, u)))
        b.result().sortBy(_._1)
      case None => wt
        .flatMap { case (w, f) =>
          for {
            st <- 0 until w.length
            pl <- 1 to math.min(maxPl, w.length - st)
          } yield (w.substring(st, st + pl), f)
        }
        .toDF("piece", "f")
        .groupBy("piece").agg(sum("f").as("u"))
        .as[(String, Long)]
        .collect()
        .sortBy(_._1)
    }
    require(seed.nonEmpty, "cannot train a unigram model on an empty corpus")
    def rescore(u: Array[Long]): Array[Long] = {
      val total = bitlen(u.sum)
      u.map(x => bitlen(x) - total)
    }
    var usage: Array[Long] = seed.map(_._2)
    var scores: Array[Long] = rescore(usage)
    val pieces: Array[String] = seed.map(_._1)
    // id 0 (UNK) cannot occur — single-char pieces always seed — but a
    // defensive filter keeps a future seeding change from silently
    // crediting the sentinel
    for (_ <- 1 to iters) {
      val vocab: Seq[(String, Long)] = pieces.zip(scores).toSeq
      val uMap: Map[Long, Long] = wtLocal match {
        case Some(arr) =>
          val compiled = UnigramTokenize.compile(vocab)
          val m = new java.util.HashMap[Long, Long]()
          arr.foreach { case (w, f) =>
            UnigramTokenize.tokenize(UTF8String.fromString(w), compiled)
              .toLongArray().foreach(id => if (id > 0L) m.merge(id, f, (x, y) => x + y))
          }
          val b = Map.newBuilder[Long, Long]
          m.forEach((id, u) => b += ((id, u)))
          b.result()
        case None => wt
          .flatMap { case (w, f) =>
            val ids = UnigramTokenize
              .tokenize(UTF8String.fromString(w), UnigramTokenize.compile(vocab))
              .toLongArray()
            ids.iterator.filter(_ > 0L).map(id => (id, f))
          }
          .toDF("id", "f")
          .groupBy("id").agg(sum("f").as("u"))
          .as[(Long, Long)]
          .collect()
          .toMap
      }
      usage = Array.tabulate(pieces.length)(i => uMap.getOrElse((i + 1).toLong, 0L))
      scores = rescore(usage)
    }
    pieces.indices.map(i => (pieces(i), scores(i), usage(i)))
  }

  /** The trained model as an apply-ready (piece, score) vocabulary. */
  def trainedVocab(docs: DataFrame, iters: Int = 2, maxPieceLen: Int = 4,
                   textCol: String = "text"): Seq[(String, Long)] =
    train(docs, iters, maxPieceLen, textCol).map(t => (t._1, t._2))
}
