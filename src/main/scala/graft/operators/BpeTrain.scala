package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING — learning the merges table from
  * the corpus itself (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units", Algorithm 1). This is the missing
  * half of the tokenizer story: [[graft.functions.BpeTokenCount]] /
  * [[graft.functions.BpeTokenize]] APPLY a frozen vocab; this module
  * derives it.
  *
  * Algorithm: reduce the corpus to its word-frequency table; split each
  * word type into code points; then `numMerges` times (a) aggregate the
  * frequency of every ADJACENT symbol pair across word types weighted by
  * word frequency, (b) pick the most frequent pair with a deterministic
  * tie-break (count DESC, then pair ASC — byte order, identical in Spark
  * and DuckDB for the shared ASCII corpus contract), (c) merge that pair
  * greedily left-to-right in every word's symbol sequence. Stops early
  * when no pair reaches `minCount` (merging frequency-1 pairs memorizes
  * noise — the paper's own stopping criterion).
  *
  * Distributed shape (the part the single-machine reference
  * implementations don't have): the corpus collapses ONCE into its
  * word-TYPE table (Heaps' law: sublinear in corpus size — the 100 TB
  * corpus becomes a few hundred million rows), cached across iterations.
  * Each iteration is exactly one shuffle — a groupBy over adjacent-pair
  * types with map-side partial aggregation — followed by a
  * TakeOrderedAndProject argmax (no global sort), and one narrow
  * projection applying the merge. Driver traffic is ONE (pair, count)
  * row per iteration; no corpus text ever reaches the driver. Per-
  * iteration caches are handed over pairwise (the new state is
  * materialized by the next argmax before the old cache is dropped), so
  * peak memory is two copies of the word-type table and lineage never
  * replays more than one projection.
  *
  * The merge application is a single Catalyst `aggregate` fold per word
  * (codegen'd): scan symbols left to right, replacing each adjacent
  * (lhs, rhs) by the merged token. The fold is exactly greedy
  * left-to-right replacement: after a merge the new token can never
  * re-match as `lhs` of the same pair (merged = lhs||rhs is strictly
  * longer than lhs), so "compare fold accumulator tail" ≡ "scan with
  * skip", the textbook semantics — and the same fold runs in the DuckDB
  * oracle via `list_reduce`, pinning the merge SEQUENCE cross-engine.
  */
object BpeTrain {

  /** One learned merge: at `step`, pair (`lhs`, `rhs`) with corpus
    * frequency `pair_count` became token `merged`.
    */
  final case class Merge(step: Long, lhs: String, rhs: String,
                         merged: String, pair_count: Long)

  /** The word-type table with initial code-point symbol sequences.
    * `(?s).` (not bare `.`) so BOTH engines' regex consume every code
    * point: Java's dot excludes NEL (U+0085) and the U+2028/U+2029
    * separators, which RE2's does not, and a word containing one would silently diverge the engines.
    */
  private def initialWords(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        regexp_extract_all(col("word"), lit("(?s)."), lit(0)).as("syms"))

  /** Adjacent-pair argmax plan: one map-side-combined groupBy over pair
    * types, then TakeOrderedAndProject — the only shuffle of an
    * iteration.
    */
  private def pairAgg(words: DataFrame, minCount: Long): DataFrame =
    words
      .select(col("freq"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1), (s, j) -> struct(s AS l, syms[j + 1] AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("l"), col("r"))
      .limit(1)

  private def bestPair(words: DataFrame, minCount: Long): Option[(String, String, Long)] = {
    val rows = pairAgg(words, minCount).collect()
    rows.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** The one-iteration pair-frequency physical plan, for PlanAuditSpec:
    * the training hot loop must stay aggregate + TakeOrdered with no
    * join/window/global sort.
    */
  def auditPairAggPlan(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    pairAgg(initialWords(graft.Tables(spark, dir, "documents"), "text"), 2)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Greedy left-to-right merge of (lhs, rhs) → merged as a codegen'd
    * fold; see the object doc for the fold ≡ scan-with-skip argument.
    * `try_element_at` (not `element_at`) so the empty accumulator before
    * the first symbol yields null → otherwise-branch under ANSI mode.
    */
  private def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(lhs) && x === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** Train and ALSO return the final word-type symbol state (for the
    * re-apply invariant and vocab extraction).
    *
    * Lineage discipline: each iteration's state is eagerly
    * `localCheckpoint`ed, truncating the plan to a LogicalRDD scan — a
    * persist() chain would NEST every prior iteration's plan (M merges ⇒
    * an M-deep tree whose mere stringification OOMs the driver around
    * M = 20, measured). Same machinery as `Curation.shardAssign`; the
    * usual localCheckpoint caveat applies on a real cluster (executor
    * loss fails the job instead of recomputing — an iterative trainer
    * would restart the loop, or swap in reliable `checkpoint()` against
    * a checkpoint dir for long runs).
    */
  /** Word-type bound for the driver-local merge loop (the graph-family
    * small-input precedent): Heaps' law keeps the type table sublinear in
    * corpus size, but at 100 TB it is still hundreds of millions of rows
    * — the distributed per-merge aggregation above the bound IS the scale
    * path. Under it, each distributed iteration is ~0.2 s of stage setup
    * on a table that fits in driver memory, so the collected table
    * replays the identical algorithm locally: same freq-weighted pair
    * counts, same (count DESC, pair ASC) argmax with the tie-break in
    * UTF-8 BINARY order (Spark's string ordering — Scala's UTF-16
    * compareTo diverges beyond the BMP, so the comparator is explicit),
    * same greedy fold ([[bpeApplyJvm]]'s accumulator logic), same
    * minCount early stop.
    */
  val TrainLocalMaxTypes = 1000000L

  /** Spark's string ordering is unsigned UTF-8 byte order. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def trainLocal(spark: org.apache.spark.sql.SparkSession,
                         rows: Array[(String, Long, Array[String])],
                         numMerges: Int, minCount: Long): (Seq[Merge], DataFrame) = {
    import spark.implicits._
    val syms = rows.map(_._3)
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val a = syms(wi)
        val f = rows(wi)._2
        var i = 0
        while (i < a.length - 1) {
          counts.merge((a(i), a(i + 1)), f, (x, y) => x + y)
          i += 1
        }
        wi += 1
      }
      var best: ((String, String), Long) = null
      counts.forEach { (p, c) =>
        if (c >= minCount) {
          if (best == null || c > best._2 ||
            (c == best._2 && (utf8Less(p._1, best._1._1) ||
              (p._1 == best._1._1 && utf8Less(p._2, best._1._2)))))
            best = (p, c)
        }
      }
      if (best == null) done = true
      else {
        val ((l, r), c) = best
        val m = l + r
        out += Merge(step.toLong, l, r, m, c)
        wi = 0
        while (wi < syms.length) {
          val a = syms(wi)
          val b = Array.newBuilder[String]
          var acc: String = null
          a.foreach { s =>
            if (acc == l && s == r) acc = m
            else { if (acc != null) b += acc; acc = s }
          }
          if (acc != null) b += acc
          syms(wi) = b.result()
          wi += 1
        }
        step += 1
      }
    }
    val state = rows.indices
      .map(i => (rows(i)._1, rows(i)._2, syms(i).toSeq))
      .toDF("word", "freq", "syms")
    (out.toSeq, state)
  }

  def trainWithState(docs: DataFrame, numMerges: Int, minCount: Long = 2,
                     textCol: String = "text",
                     maxLocalTypes: Long = TrainLocalMaxTypes): (Seq[Merge], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var words = initialWords(docs, textCol).localCheckpoint(true)
    if (maxLocalTypes > 0 && words.count() <= maxLocalTypes) {
      return trainLocal(docs.sparkSession,
        words.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray)),
        numMerges, minCount)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      bestPair(words, minCount) match {
        case None => done = true
        case Some((l, r, c)) =>
          out += Merge(step.toLong, l, r, l + r, c)
          words = words
            .select(col("word"), col("freq"), applyMerge(col("syms"), l, r).as("syms"))
            .localCheckpoint(true)
          step += 1
      }
    }
    (out.toSeq, words)
  }

  /** The learned merges table: (step, lhs, rhs, merged, pair_count),
    * one row per merge in training order — integer/string-exact, the
    * oracle-checkable artifact of training.
    */
  def train(docs: DataFrame, numMerges: Int, minCount: Long = 2,
            textCol: String = "text",
            maxLocalTypes: Long = TrainLocalMaxTypes): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _) = trainWithState(docs, numMerges, minCount, textCol, maxLocalTypes)
    merges.toDF()
  }

  /** The trained vocabulary for the greedy APPLY faces: every merged
    * token plus the corpus's initial code-point alphabet (so no in-corpus
    * character is OOV). The alphabet collect is bounded by the corpus's
    * distinct code points — a few hundred for any natural-language
    * corpus, never corpus-scale.
    */
  def trainedVocab(docs: DataFrame, numMerges: Int, minCount: Long = 2,
                   textCol: String = "text"): Seq[String] = {
    val (merges, state) = trainWithState(docs, numMerges, minCount, textCol)
    // alphabet from the checkpointed word-type state's `word` column
    // (invariant under merging) — re-deriving initialWords from the raw
    // corpus would pay a second full corpus scan + groupBy per call
    val alphabet = state
      .select(explode(regexp_extract_all(col("word"), lit("(?s)."), lit(0))).as("s"))
      .distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    (alphabet ++ merges.map(_.merged)).distinct
  }

  /** Reference (local) apply: split `word` into code points and replay
    * the merge list in training order with the same greedy
    * left-to-right fold — the from-scratch application whose equality
    * with training's incremental state is the definitional invariant
    * the spec pins (and the per-word encode step a serving layer runs).
    */
  def bpeApplyJvm(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: List[String] = {
      val b = List.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        b += word.substring(i, i + n)
        i += n
      }
      b.result()
    }
    merges.foreach { case (l, r) =>
      val m = l + r
      val b = List.newBuilder[String]
      var acc: String = null
      syms.foreach { s =>
        if (acc == l && s == r) acc = m
        else { if (acc != null) b += acc; acc = s }
      }
      if (acc != null) b += acc
      syms = b.result()
    }
    syms
  }

  /** DuckDB replay of the ENTIRE training loop — the oracle for
    * `c_bpe_train`. Single-row recursive state (the word-type list as
    * one LIST<STRUCT> value; fine at oracle scale), one recursion level
    * per merge: a LATERAL computes the pair-frequency argmax with the
    * identical (count DESC, pair ASC) tie-break, and `list_reduce` over
    * singleton-wrapped symbols applies the identical greedy fold. An
    * empty LATERAL (no pair reaching minCount) ends the recursion — the
    * same early stop as the Spark loop.
    */
  def oracleSql(numMerges: Int, minCount: Long = 2): String =
    s"""
      WITH RECURSIVE
      ${trainingCtes(numMerges, minCount, where = "TRUE")}
      SELECT CAST(lvl AS BIGINT) AS step, ml AS lhs, mr AS rhs,
             ml || mr AS merged, mc AS pair_count
      FROM steps WHERE lvl >= 1 ORDER BY step"""

  /** The training-loop CTE chain (`wsrc → corpus → init → steps`) over
    * `documents` rows passing `where` — shared by the full-corpus
    * training oracle and the train→apply composition (which trains on
    * the hash-split train side only).
    */
  private def trainingCtes(numMerges: Int, minCount: Long, where: String): String =
    s"""wsrc AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
               FROM documents WHERE text IS NOT NULL AND $where),
      corpus AS (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
                 FROM wsrc WHERE w <> '' GROUP BY w),
      init AS (SELECT list(struct_pack(word := word, freq := freq,
                     syms := regexp_extract_all(word, '(?s).'))) AS words
               FROM corpus),
      steps AS (
        SELECT 0 AS lvl, words, NULL::VARCHAR AS ml, NULL::VARCHAR AS mr,
               NULL::BIGINT AS mc
        FROM init
        UNION ALL
        SELECT lvl + 1,
               list_transform(words, w -> struct_pack(
                 word := w.word, freq := w.freq,
                 syms := list_reduce(list_transform(w.syms, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
                                    THEN list_concat(acc[1:-2], [b.l || b.r])
                                    ELSE list_concat(acc, x) END))),
               b.l, b.r, b.c
        FROM steps, LATERAL (
          SELECT p.l AS l, p.r AS r, CAST(SUM(p.f) AS BIGINT) AS c
          FROM (SELECT unnest(flatten(list_transform(steps.words, w ->
                  list_transform(range(1, len(w.syms)), i ->
                    struct_pack(l := w.syms[i], r := w.syms[i+1], f := w.freq))))) AS p) s
          GROUP BY p.l, p.r
          HAVING CAST(SUM(p.f) AS BIGINT) >= $minCount
          ORDER BY c DESC, l, r
          LIMIT 1
        ) b
        WHERE lvl < $numMerges
      )"""

  /** ≡ the c_bpe_train_apply Spark pipeline: train on the hash-split
    * train side (bucket < 80), extract the trained vocabulary (train
    * alphabet ∪ merged tokens), then greedy-longest-match tokenize the
    * HELD-OUT side (bucket ≥ 80) with it — the c_token_count_bpe
    * recursive CTE with the vocab coming from the training CTEs instead
    * of a frozen literal list. End-to-end: a drift anywhere in the
    * chain (pair counts, tie-break, merge fold, vocab extraction,
    * greedy matching) breaks the hash.
    */
  def trainApplyOracleSql(numMerges: Int, minCount: Long = 2): String = {
    val bkt = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"
    s"""
      WITH RECURSIVE
      ${trainingCtes(numMerges, minCount, where = s"$bkt < 80")},
      vocab AS (SELECT DISTINCT t FROM (
        SELECT unnest(regexp_extract_all(word, '(?s).')) AS t FROM corpus
        UNION ALL
        SELECT ml || mr FROM steps WHERE lvl >= 1)),
      wd AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
             FROM documents WHERE text IS NOT NULL AND $bkt >= 80),
      r AS (
        SELECT doc_id, w, 1 AS pos, 0 AS cnt FROM wd
        UNION ALL
        SELECT doc_id, w,
               pos + COALESCE((SELECT MAX(length(t)) FROM vocab
                               WHERE substr(w, pos, length(t)) = t), 1),
               cnt + 1
        FROM r WHERE pos <= length(w)
      ),
      f AS (SELECT doc_id, cnt FROM r WHERE pos > length(w))
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(cnt) AS BIGINT) AS n_bpe_tokens
      FROM f GROUP BY doc_id ORDER BY doc_id"""
  }
}
