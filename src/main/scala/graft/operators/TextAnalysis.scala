package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. Everything here is pure column expressions
  * (whole-stage-codegen'd, no UDFs), so it scales linearly with input
  * and never shuffles until the final (small) aggregation — at 100 TB these
  * are embarrassingly parallel map stages.
  */
object TextAnalysis {

  /** Token count: whitespace tokenization. */
  def tokenCount(c: Column): Column = size(split(trim(c), "\\s+")).cast("long")

  /** Subword token count under a frozen greedy longest-match vocab — see
    * [[graft.functions.BpeTokenCount]]. This is the count real pipeline
    * budgets are denominated in (packing maxLen, mixture quotas);
    * [[tokenCount]]'s whitespace words are the cheap proxy.
    */
  def bpeTokenCount(c: Column, vocab: Seq[String] = BpeVocab): Column =
    graft.functions.BpeTokenCount(c, vocab)

  /** The id sequence the same tokenizer emits (1-based vocab indices, 0 =
    * OOV code point) — the materialization face feeding an actual
    * training-shard write, where [[bpeTokenCount]] is the budget face.
    */
  def bpeTokenize(c: Column, vocab: Seq[String] = BpeVocab): Column =
    graft.functions.BpeTokenize(c, vocab)

  /** Frozen fixture vocabulary for the BPE-lite queries: subword units of
    * the synthetic corpus's word stock, chosen so longest-match decisions
    * are exercised (both "tab" and "table" present; "value" beats
    * "val"+"ue"; single-char entries catch most residue and genuinely
    * absent chars take the OOV code-point fallback). A production run
    * passes its real merges-table vocabulary — the operator takes any
    * whitespace-free distinct list.
    */
  val BpeVocab: Seq[String] = Seq(
    "table", "tab", "le", "value", "val", "ue", "scan", "an", "a",
    "s", "c", "t", "e", "row", "r", "o", "w", "the", "th", "er",
    "qu", "y", "in", "dow", "win", "d")

  /** WordPiece tokenization under a frozen BERT-style vocab — see
    * [[graft.functions.WordPieceTokenize]] for the semantics that
    * distinguish it from the BPE faces (##-continuation entries,
    * whole-word UNK on any failed position).
    */
  def wordpieceTokenize(c: Column, vocab: Seq[String] = WordPieceVocab): Column =
    graft.functions.WordPieceTokenize(c, vocab)

  /** Frozen fixture vocabulary for the WordPiece query, built against the
    * synthetic corpus's 31-word stock so every semantic arm is LIVE at
    * sf0.01: whole-word matches ("table" beats "tab"; "value" beats
    * "val"+"##ue"), multi-char continuation longest-match ("##dow" beats
    * "##d" in "window"), initial-position failure ("part"/"query" — no
    * init 'p'/'q' — whole word UNK), and the piece-discarding mid-word
    * failure ("group"/"spark"/"dup" match pieces then hit the missing
    * "##p" and collapse to UNK). A production run passes its real BERT
    * vocab file's entries.
    */
  val WordPieceVocab: Seq[String] = Seq(
    "table", "tab", "win", "##dow", "value", "val", "##ue", "scan", "##an",
    "row", "the",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n",
    "o", "s", "t", "v", "w",
    "##a", "##b", "##c", "##d", "##e", "##f", "##g", "##h", "##i", "##j",
    "##k", "##l", "##le", "##m", "##n", "##o", "##r", "##s", "##t", "##u",
    "##v", "##w", "##y")

  /** The WordPiece vocab as DuckDB VALUES rows `(body, id, cont)` — body
    * stripped of the ## marker, id the entry's 1-based position, cont
    * 1 for continuation entries. Single source with [[WordPieceVocab]].
    */
  private def wordPieceVocabSqlValues: String =
    WordPieceVocab.zipWithIndex.map { case (e, i) =>
      val cont = if (e.startsWith("##")) 1 else 0
      val body = (if (cont == 1) e.substring(2) else e).replace("'", "''")
      s"('$body', ${i + 1}, $cont)"
    }.mkString(", ")

  /** ≡ the c_tokenize_wordpiece Spark pipeline: the same greedy walk as
    * the BPE oracle's recursive CTE, but the step's candidate set is the
    * POSITION-APPROPRIATE vocab face and a failed step emits the -1
    * sentinel and jumps past the word's end; assembly collapses any word
    * carrying the sentinel to the single UNK id 0, discarding its
    * already-matched pieces — the BERT rule the BPE face lacks.
    */
  private def wordpieceOracleSql: String =
    s"""
        WITH RECURSIVE vocab(body, id, cont) AS (
          SELECT * FROM (VALUES $wordPieceVocabSqlValues) AS v(body, id, cont)),
        w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
        x AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wpos, ws FROM w),
        wd AS (SELECT doc_id, wpos, ws[wpos] AS wrd FROM x WHERE ws[wpos] <> ''),
        r AS (
          SELECT doc_id, wpos, wrd, 1 AS pos, 0 AS step, CAST(NULL AS BIGINT) AS tid FROM wd
          UNION ALL
          SELECT doc_id, wpos, wrd,
                 pos + COALESCE((SELECT length(body) FROM vocab
                                 WHERE cont = (CASE WHEN pos = 1 THEN 0 ELSE 1 END)
                                   AND substr(wrd, pos, length(body)) = body
                                 ORDER BY length(body) DESC LIMIT 1),
                                length(wrd) + 1 - pos),
                 step + 1,
                 COALESCE((SELECT id FROM vocab
                           WHERE cont = (CASE WHEN pos = 1 THEN 0 ELSE 1 END)
                             AND substr(wrd, pos, length(body)) = body
                           ORDER BY length(body) DESC LIMIT 1), -1)
          FROM r WHERE pos <= length(wrd)
        ),
        f AS (SELECT doc_id, wpos, step, tid FROM r WHERE step > 0),
        wids AS (
          SELECT doc_id, wpos,
                 CASE WHEN MAX(CASE WHEN tid = -1 THEN 1 ELSE 0 END) = 1 THEN '0'
                      ELSE string_agg(CAST(tid AS VARCHAR), ',' ORDER BY step) END AS wid,
                 CASE WHEN MAX(CASE WHEN tid = -1 THEN 1 ELSE 0 END) = 1 THEN 1
                      ELSE COUNT(*) END AS np,
                 CASE WHEN MAX(CASE WHEN tid = -1 THEN 1 ELSE 0 END) = 1 THEN 1
                      ELSE 0 END AS nu
          FROM f GROUP BY doc_id, wpos),
        g AS (SELECT doc_id, string_agg(wid, ',' ORDER BY wpos) AS ids,
                     CAST(SUM(np) AS BIGINT) AS n_pieces,
                     CAST(SUM(nu) AS BIGINT) AS n_unk
              FROM wids GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(g.ids, '') AS ids,
               COALESCE(g.n_pieces, 0) AS n_pieces,
               COALESCE(g.n_unk, 0) AS n_unk
        FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
        LEFT JOIN g USING (doc_id)
        ORDER BY doc_id"""

  /** Unigram-LM (SentencePiece) Viterbi tokenization — see
    * [[graft.functions.UnigramTokenize]]: maximize summed piece scores,
    * the decode no greedy face can reproduce.
    */
  def unigramTokenize(c: Column, vocab: Seq[(String, Long)] = UnigramVocab): Column =
    graft.functions.UnigramTokenize(c, vocab)

  /** Frozen (piece, score) fixture for the unigram query, built so every
    * semantic arm is LIVE on the corpus word stock at sf0.01:
    * Viterbi-beats-greedy ("scan" → sca+n at 9+1=10 over the whole-word
    * match scan=8 that every greedy face takes), the piece-count
    * tie-break ("table" → ta+ble and t+a+ble both score 6; fewer pieces
    * wins), multi-piece decompositions ("customer" → cus+tom+er), and
    * the uncoverable-word UNK arm ("query" — no 'q' piece). Singles for
    * every letter except q/z keep the rest of the stock coverable. A
    * production run passes its trained unigram model's (piece, log-prob
    * scaled to integer) table.
    */
  val UnigramVocab: Seq[(String, Long)] = Seq(
    "sca" -> 9L, "scan" -> 8L, "can" -> 7L, "the" -> 5L, "win" -> 5L,
    "dow" -> 5L, "ta" -> 2L, "ble" -> 4L, "val" -> 4L, "ue" -> 3L,
    "er" -> 3L, "cus" -> 4L, "tom" -> 4L) ++
    "abcdefghijklmnoprstuvwxy".map(ch => ch.toString -> 1L)

  /** The unigram vocab as DuckDB VALUES rows `(piece, id, score)` —
    * single source with [[UnigramVocab]].
    */
  private def unigramVocabSqlValues: String =
    UnigramVocab.zipWithIndex.map { case ((p, sc), i) =>
      s"('${p.replace("'", "''")}', ${i + 1}, $sc)"
    }.mkString(", ")

  /** ≡ the c_tokenize_unigram Spark pipeline: every segmentation path
    * enumerated by a recursive CTE, ranked per word by the SAME total
    * order the Viterbi DP composes (score DESC, piece count ASC, id
    * sequence lexicographically ASC — via the zero-padded id string),
    * uncoverable words collapsing to the single UNK id 0 with score 0.
    */
  private def unigramOracleSql: String =
    s"""
        WITH RECURSIVE vocab(piece, id, score) AS (
          SELECT * FROM (VALUES $unigramVocabSqlValues) AS v(piece, id, score)),
        w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
        x AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wpos, ws FROM w),
        wd AS (SELECT doc_id, wpos, ws[wpos] AS wrd FROM x WHERE ws[wpos] <> ''),
        r AS (
          SELECT doc_id, wpos, wrd, 1 AS pos, 0 AS score, 0 AS n,
                 '' AS idp, '' AS ids
          FROM wd
          UNION ALL
          SELECT r.doc_id, r.wpos, r.wrd, r.pos + length(v.piece),
                 r.score + v.score, r.n + 1,
                 r.idp || lpad(CAST(v.id AS VARCHAR), 3, '0'),
                 CASE WHEN r.ids = '' THEN CAST(v.id AS VARCHAR)
                      ELSE r.ids || ',' || CAST(v.id AS VARCHAR) END
          FROM r JOIN vocab v
            ON substr(r.wrd, r.pos, length(v.piece)) = v.piece
          WHERE r.pos <= length(r.wrd)
        ),
        term AS (SELECT doc_id, wpos, score, n, idp, ids FROM r
                 WHERE pos > length(wrd) AND n > 0),
        best AS (SELECT doc_id, wpos, score, n, ids FROM (
                   SELECT *, row_number() OVER (PARTITION BY doc_id, wpos
                            ORDER BY score DESC, n ASC, idp ASC) AS rk
                   FROM term) WHERE rk = 1),
        perw AS (SELECT wd.doc_id, wd.wpos,
                        COALESCE(b.ids, '0') AS ids,
                        COALESCE(b.n, 1) AS n,
                        COALESCE(b.score, 0) AS score,
                        CASE WHEN b.ids IS NULL THEN 1 ELSE 0 END AS unk
                 FROM wd LEFT JOIN best b USING (doc_id, wpos)),
        g AS (SELECT doc_id, string_agg(ids, ',' ORDER BY wpos) AS ids,
                     CAST(SUM(n) AS BIGINT) AS n_pieces,
                     CAST(SUM(unk) AS BIGINT) AS n_unk,
                     CAST(SUM(score) AS BIGINT) AS score
              FROM perw GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(g.ids, '') AS ids,
               COALESCE(g.n_pieces, 0) AS n_pieces,
               COALESCE(g.n_unk, 0) AS n_unk,
               COALESCE(g.score, 0) AS score
        FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
        LEFT JOIN g USING (doc_id)
        ORDER BY doc_id"""

  /** Unicode script blocks counted by [[scriptStats]] — (name, RE2/Java
    * character-class range). BMP-only ranges, so Spark's UTF-16
    * `length` and DuckDB's code-point `length` agree; the `\\x{hhhh}`
    * class syntax parses identically in Java regex and RE2, so ONE
    * pattern string serves both engines.
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "\\x{0041}-\\x{005A}\\x{0061}-\\x{007A}\\x{00C0}-\\x{024F}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}")

  /** Per-doc Unicode-script profile — the multilingual routing step
    * langId's word-profile heuristic cannot do (it needs per-language
    * word lists; script ranges need nothing): count characters per
    * script block and call the argmax (ties to the FIRST block in
    * [[ScriptRanges]] order via strict >; all-zero ⇒ 'und'). The char
    * counts are length-minus-length-without-class — pure codegen'd
    * regexp_replace, map-only, one shared pattern string per block
    * across engines.
    */
  def scriptStats(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counts = ScriptRanges.map { case (name, cls) =>
      (length(t) - length(regexp_replace(t, s"[$cls]", ""))).cast("long").as(s"n_$name")
    }
    // r21: NOT spread — A/B read t_script_stats 0.45→0.71 s with it (the
    // per-block replace-count battery is cheaper than the exchange here)
    val withCounts = docs.select(col(idCol) +: counts: _*)
    // argmax, ties to the EARLIER block: greatest(), then the first
    // count equal to it (the langId CASE-chain idiom, SQL-mirrorable)
    val g = greatest(ScriptRanges.map { case (n, _) => col(s"n_$n") }: _*)
    val pred = when(g <= 0, lit("und")).otherwise(
      ScriptRanges.map(_._1).foldRight(lit("und")) { (name, tail) =>
        when(col(s"n_$name") === g, lit(name)).otherwise(tail)
      })
    withCounts.withColumn("script", pred)
  }

  /** Planted multi-script fixture: residues gain a real sentence in a
    * non-Latin script (long enough to outvote the Latin base), the rest
    * stay Latin-dominant. Mirrored in the oracle.
    */
  private[operators] def withScriptText(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("stext", concat(
      substring(coalesce(col("text"), lit("")), 1, 20),
      when(id % 7 === 2, lit(" " + ScriptFixtures("cyrillic") * 3))
        .when(id % 7 === 3, lit(" " + ScriptFixtures("cjk") * 8))
        .when(id % 7 === 4, lit(" " + ScriptFixtures("greek") * 3))
        .when(id % 7 === 5, lit(" " + ScriptFixtures("arabic") * 3))
        .otherwise(lit(""))))
  }

  private[operators] val ScriptFixtures: Map[String, String] = Map(
    "cyrillic" -> "привет мир это тест",
    "cjk" -> "你好世界",
    "greek" -> "γεια σου κοσμε δοκιμη",
    "arabic" -> "مرحبا بالعالم هذا اختبار")

  /** Simple quality metrics (counts, not ratios — deterministic for the
    * oracle; ratios are a trivial division on top).
    */
  def qualityMetrics(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      tokenCount(col("text")).as("n_tokens"),
      size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long").as("n_distinct_tokens"),
    )

  /** Document fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprint(c: Column): Column = md5(c)

  /** Stopword list for the rules filter — the corpus's function-word
    * stock. A production run passes its language's list; the mechanism
    * (literal-scan occurrence counting, no regex, no HOF lambdas) is the
    * scalable shape.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "in", "of", "to", "and")

  /** Whole-word occurrence count of `word` in `text`, overlap-safe: the
    * text is whitespace-normalized, every separator doubled, and the
    * padded literal ` word ` counted via the length/replace trick — the
    * doubling makes adjacent matches (" a a a ") non-overlapping, so the
    * count equals the true token count. Pure codegen'd string ops;
    * DuckDB mirrors it exactly.
    */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "),
      replace(regexp_replace(trim(text), "\\s+", " "), lit(" "), lit("  ")), lit(" "))
    val needle = s" $word "
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) / needle.length).cast("long")
  }

  /** Gopher-style quality RULES (Rae et al. 2021 §A1.1, integer-exact
    * subset): per-doc boolean flags plus the conjunction. All bounds are
    * integer cross-multiplications (mean word length in [minMeanLen, 10]
    * ⇔ minMeanLen·n ≤ wordChars ≤ 10·n), so the DuckDB oracle matches
    * bit-for-bit — no float ratios anywhere. Map-only column
    * expressions: at 100 TB this is an embarrassingly parallel scan that
    * fuses into whatever reads the corpus next (the filter face is
    * `.filter(col("pass"))` on this output — predicate-pushdown-friendly
    * because every input is one projected column).
    *
    * Rules (defaults chosen to discriminate on the synthetic corpus —
    * all four have non-empty pass AND fail sets at sf0.01):
    *   ok_words:     minWords ≤ n_words ≤ maxWords
    *   ok_mean_len:  minMeanLen ≤ mean word length ≤ 10
    *   ok_stopwords: ≥ minStopwords occurrences from [[Stopwords]]
    *   ok_distinct:  distinct-token ratio ≥ 1/2 (2·n_distinct ≥ n_words
    *                 — the word-salad repetition screen)
    */
  def qualityRules(df: DataFrame, minWords: Int = 30, maxWords: Int = 10000,
                   minMeanLen: Int = 4, minStopwords: Int = 2,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val f = ruleFlags(col(textCol), minWords, maxWords, minMeanLen, minStopwords)
    df.select(
      col(idCol),
      f(0).cast("long").as("ok_words"),
      f(1).cast("long").as("ok_mean_len"),
      f(2).cast("long").as("ok_stopwords"),
      f(3).cast("long").as("ok_distinct"),
      f.reduce(_ && _).cast("long").as("pass"),
    )
  }

  /** LINE-based quality rules — the Gopher/RefinedWeb rules that need
    * layout, which the word-level [[qualityRules]] cannot see (Rae et
    * al. 2021 Gopher, table A1: drop docs where >90% of lines start
    * with a bullet or >30% end with an ellipsis — list-page and
    * truncated-snippet detectors). Per doc over trimmed non-empty lines
    * (the [[Dedup.lineDupStats]] normalization): line counts, bullet-
    * start count (`- `, `* `, `• `), ellipsis-end count (`...` / `…`),
    * and the two integer-exact flags (n_bullet·100 ≤ 90·n_lines;
    * n_ellipsis·100 ≤ 30·n_lines — cross-multiplied, no floats). A doc
    * with NO lines (null or all-blank text) fails both flags: an empty
    * layout is not evidence of quality, and the zero-line div-by-zero
    * never happens. Map-only column expressions — streaming-safe like
    * every rules face.
    */
  def lineRules(df: DataFrame, maxBulletPct: Int = 90, maxEllipsisPct: Int = 30,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxBulletPct >= 0 && maxBulletPct <= 100, s"bad maxBulletPct $maxBulletPct")
    require(maxEllipsisPct >= 0 && maxEllipsisPct <= 100, s"bad maxEllipsisPct $maxEllipsisPct")
    val ls = filter(transform(split(coalesce(col(textCol), lit("")), "\n"),
      l => trim(l)), l => l =!= "")
    val nLines = size(ls).cast("long")
    val nBullet = size(filter(ls, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• "))).cast("long")
    val nEllipsis = size(filter(ls, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    df.select(
      col(idCol),
      nLines.as("n_lines"),
      nBullet.as("n_bullet"),
      nEllipsis.as("n_ellipsis"),
      (nLines > 0 && nBullet * 100 <= nLines * maxBulletPct)
        .cast("long").as("ok_bullet"),
      (nLines > 0 && nEllipsis * 100 <= nLines * maxEllipsisPct)
        .cast("long").as("ok_ellipsis"),
    )
  }

  /** Planted layout fixture for the line-rules query: the flat corpus has
    * no newlines, so wrap each doc with layout lines that exercise every
    * arm — docs ≡0 (mod 3) gain a heavy bullet LIST (list-page shape:
    * more bullet lines than body lines, tripping ok_bullet at the body's
    * expense only when the list dominates), docs ≡0 (mod 4) gain an
    * ellipsis-ending teaser line, every doc keeps its body line.
    */
  private def layoutText(docs: DataFrame): DataFrame = {
    val bullets = when(col("doc_id") % 3 === 0,
      lit("- item alpha\n- item beta\n- item gamma\n- item delta\n" +
        "- item epsilon\n- item zeta\n- item eta\n- item theta\n" +
        "- item iota\n- item kappa\n- item lambda\n- item mu"))
    val teaser = when(col("doc_id") % 4 === 0, lit("read more soon ..."))
    docs.withColumn("qtext", concat_ws("\n", bullets, col("text"), teaser))
  }

  /** The rules conjunction as one boolean Column — stateless and
    * map-only, so it applies to a streaming DataFrame unchanged
    * ([[graft.streaming.DocStream.qualityRulesFilter]]).
    */
  def qualityPass(text: Column, minWords: Int = 30, maxWords: Int = 10000,
                  minMeanLen: Int = 4, minStopwords: Int = 2): Column =
    ruleFlags(text, minWords, maxWords, minMeanLen, minStopwords).reduce(_ && _)

  /** The four rule flags as raw boolean Columns over a text column —
    * shared by [[qualityRules]] (per-doc face) and [[datasetCard]]
    * (inline, so the card stays one map-only projection + one global
    * aggregation with no join).
    */
  private def ruleFlags(text: Column, minWords: Int, maxWords: Int,
                        minMeanLen: Int, minStopwords: Int): Seq[Column] = {
    val t = coalesce(text, lit(""))
    val n = tokenCount(t)
    val wchars = length(regexp_replace(t, "\\s+", "")).cast("long")
    val nStop = Stopwords.map(wordOccurrences(t, _)).reduce(_ + _)
    val nDistinct = size(array_distinct(split(trim(t), "\\s+"))).cast("long")
    Seq(
      n.between(minWords, maxWords),
      (lit(minMeanLen) * n <= wchars) && (wchars <= lit(10) * n),
      nStop >= minStopwords,
      nDistinct * 2 >= n,
    )
  }

  /** One-row dataset card — the summary table a corpus release ships:
    * doc/source counts, token/char totals, exact-dup count (docs minus
    * distinct fingerprints), and the quality-rules pass count. One
    * map-only projection into one global aggregation (partial map-side
    * combine; the shuffle carries one row per partition). count_distinct
    * over the md5 fingerprint is the one exact-cardinality term — at
    * 100 TB swap it for the HLL face when ±2% is acceptable
    * ([[graft.functions.HllAggregator]]), which turns the card fully
    * single-pass.
    */
  def datasetCard(docs: DataFrame): DataFrame =
    docs
      .withColumn("pass", qualityPass(col("text")).cast("long"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(tokenCount(col("text"))).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        (count(col("text")) - countDistinct(fingerprint(col("text")))).as("n_exact_dup_docs"),
        sum(col("pass")).as("n_pass_quality"),
      )

  /** EXACT per-source token-length quantiles (discrete/type-1: the value
    * at row ⌈p·n/100⌉ of the ascending-sorted lengths) — the dataset-card
    * companion a corpus release reports per source. Exactness matters
    * cross-engine: percentile_approx is sketch-dependent and continuous
    * interpolation is float, so neither can hash-match an oracle; the
    * ⌈·⌉-indexed discrete quantile is pure integers.
    *
    * Scale shape: NOT a per-source sort (one task per hot source at
    * 100 TB). The corpus collapses map-side into a (source, length)
    * histogram — bounded by sources × distinct lengths, tiny — then one
    * windowed cumulative sum over that histogram reads every quantile
    * off with `first length whose cumulative count clears ⌈p·n/100⌉`
    * (cum ≥ ⌈np/100⌉ ⇔ 100·cum ≥ n·p for integer cum).
    */
  def lengthQuantiles(docs: DataFrame, ps: Seq[Int] = Seq(50, 90, 99),
                      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must sit in [1,100], got $ps")
    val hist = docs
      .select(col(srcCol), coalesce(tokenCount(col(textCol)), lit(0L)).as("toks"))
      .groupBy(srcCol, "toks").agg(count(lit(1)).as("c"))
    val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(srcCol).orderBy("toks")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(srcCol)
    val cum = hist
      .withColumn("cum", sum("c").over(wOrd))
      .withColumn("n", sum("c").over(wAll))
    val qs = ps.map(p => min(when(col("cum") * 100 >= col("n") * p, col("toks"))).as(s"p$p"))
    cum.groupBy(srcCol)
      .agg(max("n").as("n_docs"), qs: _*)
      .orderBy(srcCol)
  }

  /** Per-document top-k distinctive terms: tf (term count in doc) ranked
    * with rare-corpus-term tie-break — ORDER BY tf DESC, doc_freq ASC,
    * token ASC per doc. This is the integer-exact skeleton of tf-idf
    * ranking (tf major, idf as tie-break): a float tf·ln(N/df) score
    * orders differently only when higher tf meets higher df, and float
    * scores cannot cross the oracle hash — both engines would disagree
    * in the last ulp of ln. The tf/df columns are emitted so callers
    * apply their own weighting downstream.
    *
    * Shape: one explode → (doc, token) counts [token-keyed shuffle with
    * map-side combine], doc-frequency from the same aggregate's distinct
    * doc side [vocab-sized], joined back on token [AQE-skew-splittable;
    * broadcast when the vocab fits], then a per-doc window bounded by the
    * doc's distinct tokens. No global sort; no driver materialization.
    */
  def tfidfTopK(docs: DataFrame, kTop: Int = 3,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(idCol, "token")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy(col("tf").desc, col("doc_freq").asc, col("token").asc)
    tf.join(df, Seq("token"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= kTop)
      .select(col(idCol), col("rk").cast("long").as("rk"), col("token"), col("tf"), col("doc_freq"))
  }

  /** Crawl-extraction markup strip (the trafilatura/jusText stage's
    * mechanical core, regex-expressible): drop <script>/<style> blocks
    * WITH their contents (code is not prose), replace every remaining
    * tag with a space (block boundaries must not glue words), decode the
    * five ubiquitous entities, collapse whitespace. Pure codegen'd
    * column expressions — the map-only first stage of every web
    * pipeline; same regex semantics in Java regex and DuckDB's RE2
    * ((?s) dotall + non-greedy — oracle-verified). NOT a full HTML5
    * parser by design: malformed markup degrades to extra spaces, never
    * to an error.
    */
  def stripMarkup(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script\\b.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    // &amp; decodes LAST (standard entity-decode order): decoding it first
    // would double-decode escaped entities — '&amp;lt;' must become '&lt;',
    // not '<'.
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (k, v)) => replace(col0, lit(k), lit(v)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Synthetic markup fixture: wraps each doc's text in an HTML shell
    * with a script block (must vanish ENTIRELY), a styled div, entities,
    * and an unclosed tag on every 5th doc (malformed-input arm). The
    * body text survives verbatim up to whitespace collapse.
    */
  private def withSyntheticHtml(docs: DataFrame): DataFrame =
    withSyntheticHtml(docs, coalesce(col("text"), lit("")))

  private def withSyntheticHtml(docs: DataFrame, body: Column): DataFrame =
    // r21: spread — the downstream strip/repair/rules chains are heavy
    // per-row regex work that ran single-task on one-split bench scans
    graft.Spread(docs).withColumn("html", concat(
      lit("<html><head><title>t</title><style>p { color: red }</style>" +
        "<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script></head><body>"),
      when(col("doc_id") % 5 === 0, lit("<div class=\"unclosed\" <p>")).otherwise(lit("")),
      lit("<h1>Doc &quot;"), col("doc_id").cast("string"), lit("&quot;</h1><p>"),
      body,
      lit("</p><span>&amp;&nbsp;&lt;tail&gt;</span></body></html>")))

  /** The synthetic HTML shell around `inner` as a DuckDB expression —
    * single source with [[withSyntheticHtml]] for every oracle that
    * wraps a body.
    */
  private def htmlShellSqlExpr(inner: String): String =
    "'<html><head><title>t</title><style>p { color: red }</style>' ||\n" +
      "                 '<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script></head><body>' ||\n" +
      "                 CASE WHEN doc_id % 5 = 0 THEN '<div class=\"unclosed\" <p>' ELSE '' END ||\n" +
      "                 '<h1>Doc &quot;' || CAST(doc_id AS VARCHAR) || '&quot;</h1><p>' ||\n" +
      s"                 $inner ||\n" +
      "                 '</p><span>&amp;&nbsp;&lt;tail&gt;</span></body></html>'"

  /** [[stripMarkup]] over `inner` as a DuckDB expression — the exact
    * ordered regex/replace chain, shared by the t_html_strip oracle and
    * the composed crawl pipeline.
    */
  private def stripSqlExpr(inner: String): String =
    s"""trim(regexp_replace(
                 replace(replace(replace(replace(replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace($inner, '(?is)<script\\b.*?</script>', ' ', 'g'),
                       '(?is)<style\\b.*?</style>', ' ', 'g'),
                     '(?s)<[^>]*>', ' ', 'g'),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&nbsp;', ' '), '&amp;', '&'),
                 '\\s+', ' ', 'g'))"""

  /** [[fixMojibake]] over `inner` as a DuckDB expression. */
  private def mojibakeFixSqlExpr(inner: String): String =
    MojibakeTable.foldLeft(inner) { case (acc, (bad, good)) =>
      s"replace($acc, '$bad', '$good')"
    }

  /** [[mojibakeCount]] over `inner` as a DuckDB expression. */
  private def mojibakeCountSqlExpr(inner: String): String =
    MojibakeTable.map { case (bad, _) =>
      s"((length($inner) - length(replace($inner, '$bad', ''))) // ${bad.length})"
    }.mkString(" + ")

  /** Fixed query-term bag for the BM25 face — words the synthetic corpus
    * actually uses at varied frequencies, so idf and tf both vary. A real
    * deployment passes its own query terms; the operator takes any list.
    */
  private[graft] val Bm25Terms: Seq[String] =
    Seq("spark", "hash", "scan", "merge", "window")

  /** BM25 ranking of the corpus against a fixed bag of query terms
    * (Robertson et al., Okapi at TREC-3, 1994 — k1 = 6/5, b = 3/4), in
    * EXACT integer arithmetic so the ranking crosses the hash oracle: the
    * idf is the bit-length log₂ surrogate over the odds ratio
    * (the c_lm_score discipline), and the tf saturation term is cleared of
    * its rationals by multiplying through by 10·dlsum —
    *
    *   score_t = bitlen((N − df_t + 1)·1024 ÷ (df_t + 1))
    *           · (22000·tf·dlsum ÷ (10·tf·dlsum + 3·dlsum + 9·dl·N))
    *
    * where ÷ is integer division on both engines (the 22000 carries
    * milli-precision through the saturation quotient). Long bounds:
    * 22000·tf·dlsum stays under 2^63 while tf·dlsum < 4·10^14 — a corpus
    * of 10^12 total words with tf ≤ 400, far past any single-machine
    * fixture and checked nowhere because the product simply cannot
    * overflow at the scales the driver runs; at true 100 TB scale the
    * scoring runs per-shard against shard-local dlsum anyway.
    *
    * Scale shape — the part that matters: the corpus NEVER shuffles. Per-doc
    * dl and per-term tf come from codegen'd array lambdas in the scan
    * (no explode: the dense ANN family's sparse counterpart is a map-only
    * scan), the corpus statistics (N, dlsum, df per term) are ONE
    * map-side-combined aggregation to a single row broadcast back via
    * crossJoin, and the top-k is TakeOrdered. Two passes over the scan's
    * lineage, zero wide exchanges.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = Bm25Terms, kTop: Int = 20,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "empty query-term bag")
    require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace) && !t.contains("'")),
      "query terms must be single whitespace-free words without quotes")
    val ws = filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")
    val tfCols = terms.indices.map(i =>
      size(filter(col("__ws"), w => w === lit(terms(i)))).cast("long").as(s"__tf$i"))
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), ws.as("__ws"))
      .select(col(idCol) +: size(col("__ws")).cast("long").as("__dl") +: tfCols: _*)
    val stats = base.agg(
      count(lit(1)).as("__n"),
      sum(col("__dl")).as("__dlsum") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    // dlsum = 0 (every doc tokenizes to zero words) zeroes the whole tf
    // denominator; without the guard Spark's non-ANSI div returns null
    // while DuckDB errors — short-circuit to score 0, which is also the
    // semantically right answer (no term occurrences anywhere).
    val rawScore = terms.indices.map { i =>
      val idf = s"length(bin(((__n - __df$i + 1) * 1024) div (__df$i + 1)))"
      s"($idf * ((22000 * __tf$i * __dlsum) div " +
        s"(10 * __tf$i * __dlsum + 3 * __dlsum + 9 * __dl * __n)))"
    }.mkString(" + ")
    val termScore = s"CASE WHEN __dlsum = 0 THEN 0 ELSE $rawScore END"
    val hits = terms.indices
      .map(i => s"(CASE WHEN __tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    base.crossJoin(broadcast(stats))
      .selectExpr(idCol, "__dl AS dl", s"CAST($termScore AS BIGINT) AS score",
        s"CAST($hits AS BIGINT) AS n_hits")
      .orderBy(col("score").desc, col(idCol))
      .limit(kTop)
  }

  /** The t_bm25_topk oracle: the identical integer BM25 over raw words in
    * DuckDB — same bit-length idf, same cleared-rational saturation
    * quotient, same (score DESC, doc_id) cut.
    */
  private def bm25OracleSql(terms: Seq[String], kTop: Int): String = {
    val tfSel = terms.indices.map(i =>
      s"len(list_filter(ws, x -> x = '${terms(i)}')) AS tf$i").mkString(",\n               ")
    val dfSel = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n               ")
    val rawScore = terms.indices.map { i =>
      s"""(length(bin(CAST(((n - df$i + 1) * 1024) // (df$i + 1) AS BIGINT)))
           * ((22000 * tf$i * dlsum) // (10 * tf$i * dlsum + 3 * dlsum + 9 * dl * n)))"""
    }.mkString(" + ")
    val score = s"CASE WHEN dlsum = 0 THEN 0 ELSE $rawScore END"
    val hits = terms.indices
      .map(i => s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
      WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws
        FROM documents WHERE text IS NOT NULL),
      b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
               $tfSel
            FROM w),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS dlsum,
               $dfSel
            FROM b)
      SELECT doc_id, dl, CAST($score AS BIGINT) AS score, CAST($hits AS BIGINT) AS n_hits
      FROM b CROSS JOIN st
      ORDER BY score DESC, doc_id LIMIT $kTop"""
  }

  /** Language ID: character/stop-word n-gram heuristic scoring against tiny
    * per-language profiles. Pure column expressions — a real system would
    * learn profiles offline; the mechanism (score per language, argmax via
    * greatest/when cascade) is the scalable shape.
    */
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " los "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " des "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ein "),
    "zh" -> Seq("的", "了", "是", "在", "我"),
  )

  private def occurrences(c: Column, needle: String): Column =
    // literal replace, not regexp_replace — same count, no regex engine in
    // the hot path (25 needle scans per row)
    ((length(c) - length(replace(c, lit(needle), lit("")))) / needle.length).cast("long")

  def langScore(c: Column, lang: String): Column =
    profiles(lang).map(n => occurrences(concat(lit(" "), c, lit(" ")), n)).reduce(_ + _)

  def langId(c: Column): Column = {
    // argmax via greatest() over (score, lang) structs — each score
    // expression appears exactly once, keeping the generated code inside
    // janino's method-size limit (a when-cascade duplicates every operand);
    // ties break to the lexicographically largest language
    val scored = profiles.keys.toSeq.sorted.map(l => struct(langScore(c, l).as("s"), lit(l).as("l")))
    val best = greatest(scored: _*)
    when(best("s") > 0, best("l")).otherwise(lit("und"))
  }

  /** Deterministic train/val/test assignment: bucket = first 4 hex chars of
    * md5(key) mod 100 — reproducible across engines and runs, no RNG state
    * to ship, stable under repartitioning (the standard hash-split for
    * training corpora; md5 matches DuckDB's bit-for-bit).
    */
  def splitBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long") % 100

  def splitName(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = splitBucket(key)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Vocabulary by document frequency: distinct tokens per doc → explode →
    * count docs per token. Map-side partial aggregation collapses each
    * partition's counts; the shuffle carries one row per distinct token per
    * partition — the standard scalable shape for corpus vocabularies.
    */
  def vocabularyDf(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))

  /** Common UTF-8-as-cp1252 mojibake sequences and their repairs — the
    * deterministic core of ftfy's fixer (Speer, "ftfy: fixes text for
    * you", 2019): each LHS is what a UTF-8-encoded character becomes when
    * its bytes are misdecoded once as cp1252/latin-1. Ordered
    * longest-first so the 3-char punctuation sequences are never clipped
    * by a 2-char repair; every RHS is a clean character that never
    * re-enters the table, so one sequential pass is a fixed point
    * (spec'd idempotent). ONE table feeds both engines — the oracle's
    * replace chain and count sum are generated from it, so the two sides
    * cannot drift.
    */
  private[operators] val MojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–", "â€¦" -> "…",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü", "Ã±" -> "ñ", "Ã¶" -> "ö",
    "Â " -> " ",
  )

  /** Repair every [[MojibakeTable]] sequence. Pure codegen'd replace
    * chain — map-only, the crawl-ingest posture (fix before any hashing
    * or dedup, or the damaged and clean copies of one page never
    * collide).
    */
  def fixMojibake(c: Column): Column =
    MojibakeTable.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Total count of [[MojibakeTable]] sequences in the ORIGINAL text —
    * the damage metric a pipeline thresholds on. Per pattern:
    * (len − len-without-pattern) ÷ pattern-len, exact because the
    * difference is a multiple of the pattern length; the table's
    * patterns cannot overlap each other in raw text (no LHS is a
    * substring of another and the shared 'â€' prefix only ever heads one
    * full sequence at a position), so the per-pattern counts add.
    */
  def mojibakeCount(c: Column): Column =
    MojibakeTable.map { case (bad, _) =>
      floor((length(c) - length(replace(c, lit(bad), lit("")))) / lit(bad.length))
    }.reduce(_ + _).cast("long")

  /** Mojibake fixture: every 4th doc (doc_id % 4 = 1) gains one garbled
    * clause containing five distinct table sequences; doc_id % 4 = 3 docs
    * gain a CLEAN accented decoy (must survive untouched — the fixer must
    * not be a blanket non-ASCII scrub). The other docs are pristine.
    */
  private[operators] val MojibakeGarble =
    " donâ€™t do cafÃ© â€œstyleâ€“mojibake hÃ¼ge"
  private[operators] val MojibakeDecoy = " clean résumé already"
  private def withMojibake(docs: DataFrame): DataFrame =
    // r21: NOT spread — tried, and t_mojibake_fix regressed 0.25→0.49 s
    // (the 60-char repair chain is too cheap to amortize the exchange)
    docs.withColumn("mtext", concat(
      substring(coalesce(col("text"), lit("")), 1, 60),
      when(col("doc_id") % 4 === 1, lit(MojibakeGarble)).otherwise(lit("")),
      when(col("doc_id") % 4 === 3, lit(MojibakeDecoy)).otherwise(lit(""))))

  /** Code-corpus layout rules (the deterministic slice of The Stack /
    * StarCoder's file filters, Kocetkov et al. 2022): max line length,
    * milli-exact mean line length, milli-exact alphanumeric fraction, and
    * an embedded-data-blob flag (a 64+ char unbroken base64-alphabet run
    * — generated minified/data files, not source). `keep` is the
    * conjunction. Pure codegen'd column expressions over the line array —
    * no explode, no shuffle before the caller's aggregation; the same
    * map-only scan shape as the Gopher word rules.
    */
  def codeRules(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                maxLineLen: Int = 200, maxAvgMilli: Long = 100000L,
                minAlnumMilli: Long = 250L): DataFrame = {
    require(maxLineLen > 0 && maxAvgMilli > 0 && minAlnumMilli >= 0, "bad thresholds")
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n", -1)
    val nl = size(lines).cast("long")
    val nChars = length(t).cast("long")
    val charsNoLf = nChars - (nl - 1)
    val mx = array_max(transform(lines, l => length(l))).cast("long")
    val aln = (length(t) - length(regexp_replace(t, "[A-Za-z0-9]", ""))).cast("long")
    val avgMilli = floor((charsNoLf * 1000L) / nl).cast("long")
    val alnumMilli = when(nChars === 0, 0L)
      .otherwise(floor((aln * 1000L) / nChars)).cast("long")
    val blob = when(t.rlike("[A-Za-z0-9+/=]{64}"), 1L).otherwise(0L)
    docs.select(
      col(idCol),
      mx.as("max_line_len"),
      avgMilli.as("avg_line_milli"),
      alnumMilli.as("alnum_milli"),
      blob.as("has_blob"),
      when(mx <= maxLineLen && avgMilli <= maxAvgMilli &&
        alnumMilli >= minAlnumMilli && blob === 0L, 1L).otherwise(0L).as("keep"))
  }

  /** Code-text fixture: the flat prose corpus would leave every code-rule
    * arm vacuous, so each residue class plants exactly ONE failure mode —
    * doc_id % 6 = 0 a 220-char minified line diluted by short lines
    * (fails ONLY max_line), % 6 = 1 an 80-char base64 blob (fails ONLY
    * the blob flag), % 6 = 2 a 30-line punctuation soup (fails ONLY the
    * alnum fraction), % 6 = 3 two 153-char prose lines (fails ONLY the
    * mean-line rule), everything else prose-plus-code that passes all
    * four. Mirrored verbatim by the oracle via repeat()/chr(10).
    */
  private[operators] val CodeMinified = ("x(a);" * 44) + ("\nok" * 9)
  private[operators] val CodeBlob = "QUJD" * 20
  private[operators] val CodeSoup = ("!@#$\n" * 29) + "!@#$"
  private[operators] val CodeWide = {
    val l = ("alpha beta " * 14).trim
    l + "\n" + l
  }
  private def withCodeText(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("ctext",
      when(id % 6 === 0, lit(CodeMinified))
        .when(id % 6 === 1, lit(CodeBlob))
        .when(id % 6 === 2, lit(CodeSoup))
        .when(id % 6 === 3, lit(CodeWide))
        .otherwise(concat(substring(coalesce(col("text"), lit("")), 1, 80),
          lit("\nval n = 1\n// end"))))
  }

  /** ≡ the c_pipeline_crawl Spark chain: the mojibake fixture over FULL
    * bodies → the HTML shell → the strip chain → the fix/count chains →
    * the rules CTEs, all from the same single-source expression
    * generators the per-stage oracles use. CTE names chosen to avoid
    * [[rulesCteSql]]'s own `s`/`f`.
    */
  private def crawlPipelineOracleSql: String =
    s"""
        WITH mj AS (
          SELECT doc_id,
                 COALESCE(text, '') ||
                 CASE WHEN doc_id % 4 = 1 THEN '$MojibakeGarble' ELSE '' END ||
                 CASE WHEN doc_id % 4 = 3 THEN '$MojibakeDecoy' ELSE '' END AS mtext
          FROM documents),
        hh AS (
          SELECT doc_id, ${htmlShellSqlExpr("mtext")} AS html
          FROM mj),
        st AS (
          SELECT doc_id, ${stripSqlExpr("html")} AS ctext
          FROM hh),
        fx AS (
          SELECT doc_id,
                 CAST(${mojibakeCountSqlExpr("ctext")} AS BIGINT) AS n_bad,
                 ${mojibakeFixSqlExpr("ctext")} AS fixed
          FROM st),
        fixedt AS (SELECT doc_id, fixed AS text FROM fx),
        ${rulesCteSql("fixedt")}
        SELECT fx.doc_id, fx.n_bad, md5(fx.fixed) AS fp,
               CAST(f.ok_words * f.ok_mean_len * f.ok_stopwords * f.ok_distinct AS BIGINT) AS pass
        FROM fx JOIN f ON fx.doc_id = f.doc_id
        ORDER BY fx.doc_id"""

  /** ≡ scriptStats(withScriptText(documents)): fixture, counts, and the
    * greatest-then-first-match argmax generated from the same
    * [[ScriptRanges]]/[[ScriptFixtures]] values.
    */
  private def scriptStatsOracleSql: String = {
    val cnts = ScriptRanges.map { case (n, cls) =>
      s"CAST(length(stext) - length(regexp_replace(stext, '[$cls]', '', 'g')) AS BIGINT) AS n_$n"
    }.mkString(",\n                 ")
    val g = ScriptRanges.map(r => s"n_${r._1}").mkString("greatest(", ", ", ")")
    val cases = ScriptRanges.map(_._1)
      .map(n => s"WHEN n_$n = $g THEN '$n'").mkString("\n                 ")
    s"""
        WITH p AS (
          SELECT doc_id,
                 substring(COALESCE(text, ''), 1, 20) ||
                 CASE WHEN doc_id % 7 = 2 THEN ' ${ScriptFixtures("cyrillic") * 3}'
                      WHEN doc_id % 7 = 3 THEN ' ${ScriptFixtures("cjk") * 8}'
                      WHEN doc_id % 7 = 4 THEN ' ${ScriptFixtures("greek") * 3}'
                      WHEN doc_id % 7 = 5 THEN ' ${ScriptFixtures("arabic") * 3}'
                      ELSE '' END AS stext
          FROM documents),
        s2 AS (SELECT doc_id, $cnts FROM p)
        SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
               CASE WHEN $g <= 0 THEN 'und'
                 $cases
                 ELSE 'und' END AS script
        FROM s2 ORDER BY doc_id"""
  }

  /** One hard-EM iteration of the unigram-training oracle: the Viterbi
    * path enumeration (the c_tokenize_unigram CTE discipline) over word
    * TYPES under the previous model `v$${i-1}`, the per-word argmax, the
    * frequency-weighted usage fold, and the bit-length re-score.
    */
  private def unigramIterCtes(i: Int): String = {
    val pv = s"v${i - 1}"
    s"""r$i AS (
          SELECT w, f, 1 AS pos, 0 AS score, 0 AS n, '' AS idp, '' AS ids FROM wt
          UNION ALL
          SELECT r.w, r.f, r.pos + length(v.piece), r.score + v.score, r.n + 1,
                 r.idp || lpad(CAST(v.id AS VARCHAR), 6, '0'),
                 CASE WHEN r.ids = '' THEN CAST(v.id AS VARCHAR)
                      ELSE r.ids || ',' || CAST(v.id AS VARCHAR) END
          FROM r$i r JOIN $pv v ON substr(r.w, r.pos, length(v.piece)) = v.piece
          WHERE r.pos <= length(r.w)
        ),
        b$i AS (SELECT w, f, score, n, ids FROM (
                  SELECT *, row_number() OVER (PARTITION BY w
                           ORDER BY score DESC, n ASC, idp ASC) AS rk
                  FROM r$i WHERE pos > length(w) AND n > 0) WHERE rk = 1),
        u$i AS (SELECT CAST(t.id AS BIGINT) AS id, CAST(SUM(b.f) AS BIGINT) AS u
                FROM b$i b, unnest(string_split(b.ids, ',')) AS t(id) GROUP BY 1),
        tot$i AS (SELECT CAST(length(bin(SUM(u))) AS BIGINT) AS bt FROM u$i),
        v$i AS (SELECT p.piece, p.id,
                       CAST(CASE WHEN u.u IS NULL OR u.u = 0 THEN 0
                            ELSE length(bin(u.u)) END - tot$i.bt AS BIGINT) AS score
                FROM v0 p LEFT JOIN u$i u ON u.id = p.id CROSS JOIN tot$i)"""
  }

  /** Shared training prologue: word types, substring seeds, and the
    * iteration-0 model (ids = lexicographic piece rank; score = bit
    * length of the occurrence-weighted substring count).
    */
  private def unigramTrainPrologueCtes(maxPieceLen: Int,
                                       whereSql: String = "text IS NOT NULL"): String =
    s"""wt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
                 SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
                 FROM documents WHERE $whereSql) WHERE w <> '' GROUP BY w),
        pos0 AS (SELECT w, f, unnest(range(1, length(w) + 1)) AS st FROM wt),
        sub0 AS (SELECT w, f, st,
                        unnest(range(1, least($maxPieceLen, length(w) - st + 1) + 1)) AS pl
                 FROM pos0),
        p0 AS (SELECT substr(w, st, pl) AS piece, CAST(SUM(f) AS BIGINT) AS u0
               FROM sub0 GROUP BY 1),
        tot0 AS (SELECT CAST(length(bin(SUM(u0))) AS BIGINT) AS bt FROM p0),
        v0 AS (SELECT piece, row_number() OVER (ORDER BY piece) AS id,
                      CAST(length(bin(u0)) - tot0.bt AS BIGINT) AS score
               FROM p0 CROSS JOIN tot0)"""

  /** ≡ UnigramTrain.train(documents, iters=2): the full hard-EM run
    * replayed in SQL — seed, two E/M iterations, top-30 by final usage.
    */
  private def unigramTrainOracleSql: String =
    s"""
        WITH RECURSIVE ${unigramTrainPrologueCtes(4)},
        ${unigramIterCtes(1)},
        ${unigramIterCtes(2)},
        t AS (SELECT v2.piece, CAST(COALESCE(u2.u, 0) AS BIGINT) AS usage, v2.score
              FROM v2 LEFT JOIN u2 ON u2.id = v2.id)
        SELECT piece, usage, score
        FROM t ORDER BY usage DESC, piece LIMIT 30"""

  /** ≡ applying the trained model back to the corpus word types: a third
    * Viterbi pass under v2, emitting each word's id sequence and score.
    */
  private def unigramTrainApplyOracleSql: String =
    s"""
        WITH RECURSIVE ${unigramTrainPrologueCtes(4)},
        ${unigramIterCtes(1)},
        ${unigramIterCtes(2)},
        ${unigramIterCtes(3)}
        SELECT w AS word, ids, CAST(score AS BIGINT) AS score
        FROM b3 ORDER BY word"""

  /** ≡ packSequences(documents, 256, countOf = trained-unigram count):
    * the full training replay (prologue + two E/M iterations), a third
    * Viterbi pass for per-word-type piece counts, the per-doc fold over
    * the doc's words, and the naive global pack window the distributed
    * two-level cumsum must equal.
    */
  private def packUnigramOracleSql: String =
    s"""
        WITH RECURSIVE ${unigramTrainPrologueCtes(4)},
        ${unigramIterCtes(1)},
        ${unigramIterCtes(2)},
        ${unigramIterCtes(3)},
        dw AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
               FROM documents WHERE text IS NOT NULL),
        dn AS (SELECT dw.doc_id, CAST(SUM(b.n) AS BIGINT) AS n
               FROM dw JOIN b3 b ON b.w = dw.w
               WHERE dw.w <> ''
               GROUP BY dw.doc_id),
        t AS (SELECT d.doc_id, COALESCE(dn.n, 0) AS n
              FROM documents d LEFT JOIN dn ON d.doc_id = dn.doc_id),
        c AS (
          SELECT doc_id, n,
                 COALESCE(SUM(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
          FROM t
        )
        SELECT doc_id, n AS n_tokens,
               CAST(s // 256 AS BIGINT) AS seq_id,
               CAST(s % 256 AS BIGINT) AS seq_offset
        FROM c ORDER BY doc_id"""

  /** ≡ the c_unigram_heldout Spark chain: training replayed on the
    * TRAIN-split word types only, then a Viterbi apply pass over the
    * TEST-split word types (planted unseen-char arm included), folded
    * per test doc — uncovered words count one UNK.
    */
  private def unigramHeldoutOracleSql: String =
    s"""
        WITH RECURSIVE ${unigramTrainPrologueCtes(4,
          s"text IS NOT NULL AND ${splitCaseSql()} = 'train'")},
        ${unigramIterCtes(1)},
        ${unigramIterCtes(2)},
        td AS (SELECT doc_id,
                      text || CASE WHEN doc_id % 2 = 0 THEN ' zebraz' ELSE '' END AS htext
               FROM documents
               WHERE text IS NOT NULL AND ${splitCaseSql()} = 'test'),
        dw3 AS (SELECT doc_id, unnest(string_split_regex(trim(htext), '\\s+')) AS w FROM td),
        wt3 AS (SELECT DISTINCT w FROM dw3 WHERE w <> ''),
        r3 AS (
          SELECT w, 1 AS pos, 0 AS score, 0 AS n, '' AS idp FROM wt3
          UNION ALL
          SELECT r.w, r.pos + length(v.piece), r.score + v.score, r.n + 1,
                 r.idp || lpad(CAST(v.id AS VARCHAR), 6, '0')
          FROM r3 r JOIN v2 v ON substr(r.w, r.pos, length(v.piece)) = v.piece
          WHERE r.pos <= length(r.w)
        ),
        b3h AS (SELECT w, n FROM (
                  SELECT *, row_number() OVER (PARTITION BY w
                           ORDER BY score DESC, n ASC, idp ASC) AS rk
                  FROM r3 WHERE pos > length(w) AND n > 0) WHERE rk = 1),
        perw AS (SELECT dw3.doc_id, COALESCE(b.n, 1) AS np,
                        CASE WHEN b.w IS NULL THEN 1 ELSE 0 END AS nu
                 FROM dw3 LEFT JOIN b3h b ON b.w = dw3.w WHERE dw3.w <> ''),
        g AS (SELECT doc_id, CAST(SUM(np) AS BIGINT) AS n_pieces,
                     CAST(SUM(nu) AS BIGINT) AS n_unk
              FROM perw GROUP BY doc_id)
        SELECT td.doc_id, COALESCE(g.n_pieces, 0) AS n_pieces,
               COALESCE(g.n_unk, 0) AS n_unk
        FROM td LEFT JOIN g USING (doc_id)
        ORDER BY td.doc_id"""

  /** The t_mojibake_fix oracle pieces, generated from [[MojibakeTable]]. */
  private def mojibakeFixSql: String = {
    val fixed = mojibakeFixSqlExpr("mtext")
    val cnt = mojibakeCountSqlExpr("mtext")
    s"""
        WITH m AS (
          SELECT doc_id,
                 substring(COALESCE(text, ''), 1, 60) ||
                 CASE WHEN doc_id % 4 = 1 THEN '$MojibakeGarble' ELSE '' END ||
                 CASE WHEN doc_id % 4 = 3 THEN '$MojibakeDecoy' ELSE '' END AS mtext
          FROM documents)
        SELECT doc_id, CAST($cnt AS BIGINT) AS n_bad, $fixed AS fixed_text
        FROM m ORDER BY doc_id"""
  }

  /** Exact top-`k` tokens by TOTAL occurrence count (term frequency, not
    * the document frequency of [[vocabularyDf]]/t_vocab_topk), ties to
    * the lexicographically smaller token. The exact face of the
    * heavy-hitters pair: one explode + one map-side-combined groupBy —
    * fine when the distinct-token table fits the cluster, which is the
    * regime the CMS face exists to escape.
    */
  def heavyHittersExact(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
  }

  /** One-row frame holding the Count-Min matrix over `textCol`'s
    * whitespace tokens ([[graft.functions.CmsSketch]]): the corpus is
    * never exploded — each partition folds into one depth×width long
    * array (16 KB at 4×512) and the exchange carries one partial per
    * partition. THE frequency-profile shape at 100 TB, where the exact
    * distinct-token table is itself a big-data problem.
    */
  def cmsSketch(docs: DataFrame, depth: Int, width: Int,
                textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(textCol)).as[String]
      .select(new graft.functions.CmsSketch.Agg(depth, width).toColumn)
      .toDF("sketch")
  }

  /** Point-estimate column: `min_r sketch[r·width + h_r(token)]`, with
    * `h_r` the md5-derived bucket [[graft.functions.CmsSketch.bucket]]
    * computes — expressed in codegen'd built-ins (md5/conv/element_at)
    * so estimation over a candidate frame is a pure map stage.
    */
  def cmsEstimate(token: Column, sketch: Column, depth: Int, width: Int): Column =
    (0 until depth).map { r =>
      val b = conv(substring(md5(concat(lit(s"$r:"), token)), 1, 8), 16, 10)
        .cast("long") % width
      element_at(sketch, (b + lit(r * width + 1)).cast("int"))
    }.reduce(least(_, _))

  /** The verification face pairing both: exact top-`k` heavy hitters with
    * their CMS point estimates side by side (estimate ≥ exact always —
    * the sketch's one-sided guarantee, spec-pinned corpus-wide). The
    * 1-row sketch frame broadcast-joins onto the candidates: no
    * driver-side matrix, no second corpus pass beyond the exact count
    * this face exists to audit.
    */
  def cmsHeavyHitters(docs: DataFrame, k: Int, depth: Int, width: Int,
                      textCol: String = "text"): DataFrame = {
    val top = heavyHittersExact(docs, k, textCol).withColumnRenamed("cnt", "exact_cnt")
    top.crossJoin(broadcast(cmsSketch(docs, depth, width, textCol)))
      .select(col("token"), col("exact_cnt"),
        cmsEstimate(col("token"), col("sketch"), depth, width).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  /** Per-source Count-Min sketches — the DISTRIBUTED face of the sketch
    * family: each source (pipeline, day, shard) folds its own matrix and
    * the elementwise SUM of per-source matrices IS the global sketch
    * (linearity — the property that lets 1000 executors or 30 daily jobs
    * each sketch independently and merge in O(depth·width); CmsSpec pins
    * sum == global exactly). One untyped UDAF aggregation keyed by
    * source: the exchange carries one 16 KB partial per (partition,
    * source), never token rows.
    */
  def cmsBySource(docs: DataFrame, depth: Int, width: Int,
                  sourceCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    val cms = udaf(new graft.functions.CmsSketch.Agg(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    docs.filter(col(textCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(cms(col(textCol)).as("sketch"))
  }

  /** The verification face of [[cmsBySource]]: for the global top-`k`
    * tokens, each source's exact count next to its OWN sketch's point
    * estimate — the per-tenant frequency audit a multi-source ingest
    * runs, fully hash-oracled (per-source matrices replayed in SQL).
    */
  def cmsMergeReport(docs: DataFrame, k: Int, depth: Int, width: Int,
                     sourceCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val top = heavyHittersExact(docs, k, textCol)
      .withColumnRenamed("cnt", "exact_global")
    val srcExact = docs.filter(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("exact_src"))
    top.crossJoin(broadcast(cmsBySource(docs, depth, width, sourceCol, textCol)))
      .join(srcExact, Seq("source", "token"), "left")
      .select(col("source"), col("token"), col("exact_global"),
        coalesce(col("exact_src"), lit(0L)).as("exact_src"),
        cmsEstimate(col("token"), col("sketch"), depth, width).as("est_src"))
      .orderBy(col("source"), col("exact_global").desc, col("token"))
  }

  /** ≡ [[cmsMergeReport]](documents, k, depth, width): per-source
    * matrices, per-source exact counts, and the global top-k replayed
    * declaratively.
    */
  private def cmsMergeOracleSql(k: Int, depth: Int, width: Int): String =
    s"""
        WITH tok AS (
          SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM documents WHERE text IS NOT NULL),
        t2 AS (SELECT source, token FROM tok WHERE token <> ''),
        top AS (SELECT token, COUNT(*) AS exact_global FROM t2
                GROUP BY token ORDER BY exact_global DESC, token LIMIT $k),
        se AS (SELECT source, token, COUNT(*) AS exact_src FROM t2 GROUP BY source, token),
        rws AS (SELECT unnest(range(0, $depth)) AS r),
        cells AS (
          SELECT t2.source, rws.r AS r,
                 CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR) || ':' || t2.token), 1, 8) AS BIGINT) % $width AS b,
                 COUNT(*) AS c
          FROM t2 CROSS JOIN rws GROUP BY 1, 2, 3),
        -- sources from the DOC filter, not the token rows: a source whose
        -- docs all carry empty (non-null) text still owns an all-zero
        -- sketch on the Spark side and must appear here with est 0
        srcs AS (SELECT DISTINCT source FROM documents WHERE text IS NOT NULL),
        est AS (
          SELECT s.source, t.token, t.exact_global, MIN(COALESCE(c.c, 0)) AS est_src
          FROM top t CROSS JOIN srcs s CROSS JOIN rws
          LEFT JOIN cells c ON c.source = s.source AND c.r = rws.r
           AND c.b = CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR) || ':' || t.token), 1, 8) AS BIGINT) % $width
          GROUP BY s.source, t.token, t.exact_global)
        SELECT e.source, e.token, e.exact_global,
               CAST(COALESCE(se.exact_src, 0) AS BIGINT) AS exact_src,
               CAST(e.est_src AS BIGINT) AS est_src
        FROM est e LEFT JOIN se ON se.source = e.source AND se.token = e.token
        ORDER BY e.source, e.exact_global DESC, e.token"""

  /** ≡ [[cmsHeavyHitters]](documents, k, depth, width): the whole sketch
    * — matrix cells AND estimates — replayed declaratively in DuckDB from
    * the same md5 bucket rule, so the cross-engine check pins the sketch
    * SEMANTICS (hash family, layout, min-rule), not the Aggregator
    * implementation.
    */
  private def cmsOracleSql(k: Int, depth: Int, width: Int): String =
    s"""
        WITH tok AS (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM documents WHERE text IS NOT NULL),
        t2 AS (SELECT token FROM tok WHERE token <> ''),
        e AS (SELECT token, COUNT(*) AS exact_cnt FROM t2 GROUP BY token),
        top AS (SELECT token, exact_cnt FROM e ORDER BY exact_cnt DESC, token LIMIT $k),
        rws AS (SELECT unnest(range(0, $depth)) AS r),
        cells AS (
          SELECT rws.r AS r,
                 CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR) || ':' || t2.token), 1, 8) AS BIGINT) % $width AS b,
                 COUNT(*) AS c
          FROM t2 CROSS JOIN rws GROUP BY 1, 2),
        est AS (
          SELECT t.token, t.exact_cnt, MIN(c.c) AS cms_est
          FROM top t CROSS JOIN rws
          JOIN cells c ON c.r = rws.r
           AND c.b = CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR) || ':' || t.token), 1, 8) AS BIGINT) % $width
          GROUP BY t.token, t.exact_cnt)
        SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
               CAST(cms_est AS BIGINT) AS cms_est
        FROM est ORDER BY exact_cnt DESC, token"""

  // ---- mergeable quantile sketch (log2 histogram) ----------------------

  /** Per-`srcCol` log-histogram sketches over a long column
    * ([[graft.functions.LogHistogram]]): each partition folds into one
    * dense 960-long array (7.7 KB) and the exchange carries one partial
    * per (partition, source) — the quantile member of the sketch triad
    * (CMS frequency / HLL cardinality / this), for the regime where even
    * the (source, distinct value) histogram of [[lengthQuantiles]] is
    * big data. Merge is elementwise sum (LINEAR — per-day matrices sum
    * to the global matrix exactly; QsketchSpec pins it).
    */
  def qsketchBySource(docs: DataFrame, srcCol: String = "source",
                      valCol: String = "n_chars"): DataFrame = {
    val agg = udaf(new graft.functions.LogHistogram.Agg,
      org.apache.spark.sql.Encoders.scalaLong)
    docs.select(col(srcCol).as("source"),
        coalesce(col(valCol).cast("long"), lit(0L)).as("v"))
      .groupBy("source").agg(agg(col("v")).as("sketch"))
  }

  /** The sparse readout of [[qsketchBySource]]: one row per occupied
    * bucket with its count and inclusive [lo, hi] value bounds — what a
    * dataset card renders as the per-source length distribution. Buckets
    * below 16 are EXACT (lo == hi); above, width ≤ lo/16 (≤6.25%
    * relative error). Fully integer, so the DuckDB oracle replays the
    * whole histogram from the same `length(bin(v))`/shift rule.
    */
  def qsketchHistogram(docs: DataFrame, srcCol: String = "source",
                       valCol: String = "n_chars"): DataFrame =
    qsketchBySource(docs, srcCol, valCol)
      .select(col("source"), posexplode(col("sketch")).as(Seq("bucket", "cnt")))
      .filter(col("cnt") > 0)
      .withColumn("bucket", col("bucket").cast("long"))
      .withColumn("lo", graft.functions.LogHistogram.lowerBoundColOf("bucket"))
      .withColumn("hi", graft.functions.LogHistogram.upperBoundColOf("bucket"))
      .orderBy("source", "bucket")

  /** The verification face: sketch-derived quantile BOUNDS next to the
    * exact discrete quantiles ([[lengthQuantiles]] semantics: value at
    * row ⌈p·n/100⌉), per source. Because the bucket map is monotone,
    * bucket(quantile(p)) IS the sketch's answering bucket, so
    * `lo ≤ exact ≤ hi` holds by construction — `pNN_ok` columns pin it
    * corpus-wide in the cross-engine hash, making the ≤6.25% guarantee a
    * VERIFIED property, not a claim. Shape: two bounded histograms
    * (source × occupied buckets / source × distinct values) + windowed
    * cumsums — no per-source sort of raw rows.
    */
  def qsketchQuantiles(docs: DataFrame, ps: Seq[Int] = Seq(50, 90, 99),
                       srcCol: String = "source",
                       valCol: String = "n_chars"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must sit in [1,100], got $ps")
    require(ps.distinct == ps,
      s"percentiles must be distinct (duplicates make duplicate column names), got $ps")
    val lh = graft.functions.LogHistogram
    val v = docs.select(col(srcCol).as("source"),
      coalesce(col(valCol).cast("long"), lit(0L)).as("v"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("source")
    // sketch side: histogram of buckets, cumulative count, min bucket
    // clearing each ⌈p·n/100⌉ threshold (100·cum ≥ n·p, pure integers)
    val hb = v.withColumn("bucket", lh.bucketColOf("v"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("bucket")))
      .withColumn("n", sum("c").over(wAll))
    val qb = hb.groupBy("source").agg(max("n").as("n_docs"),
      ps.map(p => min(when(col("cum") * 100 >= col("n") * p, col("bucket"))).as(s"b$p")): _*)
    // exact side: the lengthQuantiles shape over the raw values
    val hv = v.groupBy("source", "v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("v")))
      .withColumn("n", sum("c").over(wAll))
    val eCols = ps.map(p =>
      min(when(col("cum") * 100 >= col("n") * p, col("v"))).as(s"e$p"))
    val qv = hv.groupBy("source").agg(eCols.head, eCols.tail: _*)
    val joined = qb.join(qv, Seq("source"))
    val out = ps.foldLeft(joined) { (df, p) =>
      df.withColumn(s"p${p}_lo", lh.lowerBoundColOf(s"b$p"))
        .withColumn(s"p${p}_hi", lh.upperBoundColOf(s"b$p"))
        .withColumn(s"p${p}_exact", col(s"e$p"))
        .withColumn(s"p${p}_ok",
          (col(s"p${p}_lo") <= col(s"e$p") && col(s"e$p") <= col(s"p${p}_hi")).cast("long"))
    }
    out.select(col("source") +: col("n_docs") +:
      ps.flatMap(p => Seq(col(s"p${p}_lo"), col(s"p${p}_hi"),
        col(s"p${p}_exact"), col(s"p${p}_ok"))): _*)
      .orderBy("source")
  }

  /** Per-source DISTRIBUTION DRIFT off the quantile sketch: the L1
    * distance, in ppm of probability mass, between each source's bucket
    * histogram and the corpus-wide one —
    * `Σ_b |cnt_s(b)·10⁶ div n_s − cnt_g(b)·10⁶ div n_g|`. The ingest
    * diagnostic that flags a source whose length distribution has
    * drifted from the corpus (a scraper gone wrong, a truncating
    * upstream) BEFORE per-document rules would notice. ppm fractions
    * keep every term inside int64 at any corpus size (the raw
    * cross-product form `cnt_s·n_g` overflows at web scale); floor-div
    * is engine-identical, so the whole report hash-matches the oracle.
    * Shape: two bounded histograms + one (sources × occupied-buckets)
    * join — the global histogram is ≤960 rows and broadcasts.
    */
  def qsketchDrift(docs: DataFrame, srcCol: String = "source",
                   valCol: String = "n_chars"): DataFrame = {
    val lh = graft.functions.LogHistogram
    val b = docs.select(col(srcCol).as("source"),
        coalesce(col(valCol).cast("long"), lit(0L)).as("v"))
      .withColumn("bucket", lh.bucketColOf("v"))
    val hs = b.groupBy("source", "bucket").agg(count(lit(1)).as("c"))
    val ns = b.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val hg = b.groupBy("bucket").agg(count(lit(1)).as("cg"))
    val ng = b.agg(count(lit(1)).as("ng"))
    val grid = ns.join(broadcast(hg)).join(broadcast(ng)) // sources × occupied buckets
    grid.join(hs, Seq("source", "bucket"), "left")
      .withColumn("term", abs(
        expr("coalesce(c, 0) * 1000000 div n_docs") - expr("cg * 1000000 div ng")))
      .groupBy("source").agg(max("n_docs").as("n_docs"),
        sum("term").as("drift_ppm"))
      .orderBy("source")
  }

  /** The CDF read of the sketch — the third face beside quantiles
    * ([[qsketchQuantiles]]) and drift ([[qsketchDrift]]): per source and
    * per fixed threshold T, the ppm of documents with value ≤ T, as
    * BOUNDS from the histogram (buckets entirely below T count surely;
    * the straddling bucket is the uncertainty) beside the exact ppm.
    * `lo ≤ exact ≤ hi` is a THEOREM of the bucket map (v ≤ T ⇒ its
    * bucket's lo ≤ T; hi(b) ≤ T ⇒ every value in b ≤ T), so the ok
    * flags hash-pin the contract corpus-wide. The SLA read a dataset
    * card answers ("what fraction of source X is under 200 chars?")
    * from the 7.7 KB sketch alone.
    */
  def qsketchCdf(docs: DataFrame, thresholds: Seq[Long] = Seq(100L, 200L, 400L),
                 srcCol: String = "source", valCol: String = "n_chars"): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ >= 0), "thresholds must be >= 0")
    require(thresholds.distinct == thresholds,
      s"thresholds must be distinct (duplicates make duplicate column names), got $thresholds")
    val lh = graft.functions.LogHistogram
    val v = docs.select(col(srcCol).as("source"),
      coalesce(col(valCol).cast("long"), lit(0L)).as("v"))
    val hb = v.withColumn("bucket", lh.bucketColOf("v"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
      .withColumn("blo", lh.lowerBoundColOf("bucket"))
      .withColumn("bhi", lh.upperBoundColOf("bucket"))
    val sketchCols = thresholds.flatMap { t =>
      Seq(sum(when(col("bhi") <= t, col("c")).otherwise(lit(0L))).as(s"c${t}_lo"),
        sum(when(col("blo") <= t, col("c")).otherwise(lit(0L))).as(s"c${t}_hi"))
    }
    val sk = hb.groupBy("source").agg(sketchCols.head, sketchCols.tail: _*)
    val exactCols = count(lit(1)).as("n_docs") +: thresholds.map { t =>
      sum(when(col("v") <= t, 1L).otherwise(0L)).as(s"c${t}_ex")
    }
    val ex = v.groupBy("source").agg(exactCols.head, exactCols.tail: _*)
    val joined = sk.join(ex, Seq("source"))
    val out = thresholds.foldLeft(joined) { (df, t) =>
      df.withColumn(s"t${t}_lo", expr(s"c${t}_lo * 1000000 div n_docs"))
        .withColumn(s"t${t}_hi", expr(s"c${t}_hi * 1000000 div n_docs"))
        .withColumn(s"t${t}_exact", expr(s"c${t}_ex * 1000000 div n_docs"))
        .withColumn(s"t${t}_ok",
          (col(s"t${t}_lo") <= col(s"t${t}_exact") &&
            col(s"t${t}_exact") <= col(s"t${t}_hi")).cast("long"))
    }
    out.select(col("source") +: col("n_docs") +:
      thresholds.flatMap(t => Seq(col(s"t${t}_lo"), col(s"t${t}_hi"),
        col(s"t${t}_exact"), col(s"t${t}_ok"))): _*)
      .orderBy("source")
  }

  /** The bucket rule / bound rules as DuckDB expressions — single source
    * with [[graft.functions.LogHistogram]]'s column twins so the two
    * engines can never drift. `//` and `>>`/`<<` on BIGINT are the same
    * floor-division/shift semantics Spark's `div`/`shiftright` apply to
    * the same non-negative inputs.
    */
  private def qsketchBucketSql(v: String): String =
    s"CASE WHEN $v < 0 THEN 0 WHEN $v < 16 THEN $v ELSE (length(bin($v)) - 5) * 16 + ($v >> (length(bin($v)) - 5)) END"

  private def qsketchLoSql(b: String): String =
    s"CASE WHEN $b < 16 THEN $b ELSE ($b % 16 + 16) << (($b // 16) - 1) END"

  private def qsketchHiSql(b: String): String =
    s"CASE WHEN $b < 16 THEN $b ELSE (($b % 16 + 16) << (($b // 16) - 1)) + ((CAST(1 AS BIGINT) << (($b // 16) - 1)) - 1) END"

  val queries: Seq[Q] = Seq(
    // deterministic hash split: per-split document counts + token sums
    Q(
      "t_split_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(splitName(col("doc_id")).as("split"), tokenCount(col("text")).as("n"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
          .orderBy("split"),
      Some("""
        WITH b AS (
          SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bkt,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
          FROM documents
        )
        SELECT CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
               COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
        FROM b GROUP BY 1 ORDER BY split"""),
    ),
    // vocabulary: top-50 tokens by document frequency (ties by token)
    Q(
      "t_vocab_topk",
      (s, dir) =>
        vocabularyDf(Tables(s, dir, "documents"))
          .orderBy(col("doc_freq").desc, col("token"))
          .limit(50),
      Some("""
        WITH t AS (
          SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
          FROM documents
        )
        SELECT token, COUNT(*) AS doc_freq
        FROM t WHERE token <> ''
        GROUP BY token ORDER BY doc_freq DESC, token LIMIT 50"""),
    ),
    Q(
      "t_token_count",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents ORDER BY doc_id"""),
    ),
    Q(
      "t_quality",
      (s, dir) => qualityMetrics(Tables(s, dir, "documents")).orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_m,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens
        FROM documents ORDER BY doc_id"""),
    ),
    // BPE-lite subword counting under the frozen fixture vocab. The
    // oracle re-derives greedy longest-match per word with a recursive
    // CTE whose step consumes MAX(length(match)) — the exact greedy rule
    // — falling back to one character; so the cross-engine check pins the
    // tokenizer SEMANTICS, not the trie implementation.
    Q(
      "c_token_count_bpe",
      (s, dir) =>
        // r21: NOT spread — A/B read 0.42→0.59 s with it (count-only trie
        // walk too cheap for the exchange; the tokenize faces differ)
        Tables(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), tokenCount(col("text")).as("n_words"),
            bpeTokenCount(col("text")).as("n_bpe_tokens"))
          .orderBy("doc_id"),
      Some(s"""
        WITH RECURSIVE vocab(t) AS (SELECT unnest([$bpeVocabSqlList])),
        wd AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
               FROM documents WHERE text IS NOT NULL),
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
        FROM f GROUP BY doc_id ORDER BY doc_id"""),
    ),
    // The id-emitting tokenizer face, hash-compared as the comma-joined
    // id sequence per doc. The oracle's recursive CTE emits one row per
    // consumed token carrying the matched entry's 1-based vocab id (0
    // for the OOV code-point fallback), ordered by (word, step) — the
    // exact sequence the trie walk produces.
    Q(
      "c_tokenize_bpe",
      (s, dir) =>
        graft.Spread(Tables(s, dir, "documents")
          .filter(col("text").isNotNull))
          .select(col("doc_id"),
            array_join(transform(bpeTokenize(col("text")), _.cast("string")), ",")
              .as("ids"))
          .orderBy("doc_id"),
      Some(s"""
        WITH RECURSIVE vocab AS (
          SELECT unnest([$bpeVocabSqlList]) AS t,
                 unnest(range(1, ${BpeVocab.length + 1})) AS id),
        w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
        x AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wpos, ws FROM w),
        wd AS (SELECT doc_id, wpos, ws[wpos] AS wrd FROM x),
        r AS (
          SELECT doc_id, wpos, wrd, 1 AS pos, 0 AS step, NULL::BIGINT AS tid FROM wd
          UNION ALL
          SELECT doc_id, wpos, wrd,
                 pos + COALESCE((SELECT length(t) FROM vocab
                                 WHERE substr(wrd, pos, length(t)) = t
                                 ORDER BY length(t) DESC LIMIT 1), 1),
                 step + 1,
                 COALESCE((SELECT id FROM vocab
                           WHERE substr(wrd, pos, length(t)) = t
                           ORDER BY length(t) DESC LIMIT 1), 0)
          FROM r WHERE pos <= length(wrd)
        ),
        e AS (SELECT doc_id, wpos, step, tid FROM r WHERE step >= 1),
        ag AS (SELECT doc_id,
                      string_agg(CAST(tid AS VARCHAR), ',' ORDER BY wpos, step) AS ids
               FROM e GROUP BY doc_id)
        SELECT w.doc_id, COALESCE(ag.ids, '') AS ids
        FROM w LEFT JOIN ag ON w.doc_id = ag.doc_id
        ORDER BY w.doc_id"""),
    ),
    // Tokenizer vocab COVERAGE per source: total subword ids and OOV ids
    // (id 0 — code points no vocab entry matches) from the greedy
    // tokenizer. The release-gate a tokenizer swap is judged by: a
    // source whose OOV rate jumps is mis-served by the vocab. Map-only
    // over the codegen'd tokenize face + one source-keyed aggregation;
    // oracle replays the per-step recursive-CTE tokenizer and counts
    // zero ids per source.
    Q(
      "c_oov_stats",
      (s, dir) =>
        // r21: NOT spread — A/B read 0.37→0.45 s with it
        Tables(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("source"), bpeTokenize(col("text")).as("ids"))
          .select(col("source"),
            size(col("ids")).cast("long").as("n"),
            (size(col("ids")) - size(array_remove(col("ids"), lit(0L)))).cast("long").as("z"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"), sum("z").as("n_oov"))
          .orderBy("source"),
      Some(s"""
        WITH RECURSIVE vocab AS (
          SELECT unnest([$bpeVocabSqlList]) AS t,
                 unnest(range(1, ${BpeVocab.length + 1})) AS id),
        w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
              FROM documents WHERE text IS NOT NULL),
        x AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wpos, ws FROM w),
        wd AS (SELECT doc_id, wpos, ws[wpos] AS wrd FROM x),
        r AS (
          SELECT doc_id, wpos, wrd, 1 AS pos, 0 AS step, NULL::BIGINT AS tid FROM wd
          UNION ALL
          SELECT doc_id, wpos, wrd,
                 pos + COALESCE((SELECT length(t) FROM vocab
                                 WHERE substr(wrd, pos, length(t)) = t
                                 ORDER BY length(t) DESC LIMIT 1), 1),
                 step + 1,
                 COALESCE((SELECT id FROM vocab
                           WHERE substr(wrd, pos, length(t)) = t
                           ORDER BY length(t) DESC LIMIT 1), 0)
          FROM r WHERE pos <= length(wrd)
        ),
        e AS (SELECT doc_id, tid FROM r WHERE step >= 1),
        pd AS (SELECT doc_id, COUNT(*) AS n,
                      COUNT(*) FILTER (tid = 0) AS z
               FROM e GROUP BY doc_id)
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COALESCE(SUM(pd.n), 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(pd.z), 0) AS BIGINT) AS n_oov
        FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        WHERE d.text IS NOT NULL
        GROUP BY d.source ORDER BY d.source"""),
    ),
    // BPE vocab TRAINING (Sennrich et al. 2016): the merge sequence
    // learned from the corpus itself — 20 merges, minCount 2, ties by
    // (count DESC, pair ASC). The DuckDB oracle replays the ENTIRE
    // training loop (recursive CTE, one level per merge; see
    // BpeTrain.oracleSql), so the check pins the full algorithm —
    // pair counting, argmax tie-break, greedy merge application —
    // step by step, cross-engine.
    Q(
      "c_bpe_train",
      (s, dir) => BpeTrain.train(Tables(s, dir, "documents"), numMerges = 20).orderBy("step"),
      Some(BpeTrain.oracleSql(numMerges = 20)),
    ),
    // The composed tokenizer pipeline: LEARN the vocab on the hash-split
    // train side, then greedy-apply it to the HELD-OUT side — training,
    // vocab extraction (train alphabet ∪ merges, bounded driver collect),
    // and the codegen'd trie application under ONE end-to-end hash
    // oracle. This is the self-contained-tokenizer claim as a single
    // verifiable query, on text the trainer never saw.
    Q(
      "c_bpe_train_apply",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val bkt = splitBucket(col("doc_id"))
        val vocab = BpeTrain.trainedVocab(docs.filter(bkt < 80), numMerges = 20)
        docs
          .filter(bkt >= 80 && col("text").isNotNull)
          .select(col("doc_id"), tokenCount(col("text")).as("n_words"),
            bpeTokenCount(col("text"), vocab).as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(BpeTrain.trainApplyOracleSql(numMerges = 20)),
    ),
    // Gopher-style rules filter: per-doc integer flags + conjunction.
    // Every bound is an integer cross-multiplication, so the oracle is a
    // bit-exact replay; the stopword arm is generated from the SAME
    // Scala list the operator uses (one source of truth).
    Q(
      "c_quality_rules",
      (s, dir) => qualityRules(Tables(s, dir, "documents")).orderBy("doc_id"),
      Some(s"""
        WITH ${rulesCteSql()}
        SELECT doc_id,
               CAST(ok_words AS BIGINT) AS ok_words,
               CAST(ok_mean_len AS BIGINT) AS ok_mean_len,
               CAST(ok_stopwords AS BIGINT) AS ok_stopwords,
               CAST(ok_distinct AS BIGINT) AS ok_distinct,
               CAST(ok_words * ok_mean_len * ok_stopwords * ok_distinct AS BIGINT) AS pass
        FROM f ORDER BY doc_id"""),
    ),
    // One-row dataset card: the release-summary aggregate (doc/source/
    // lang counts, token/char totals, exact-dup count, quality passes).
    Q(
      "c_dataset_card",
      (s, dir) => datasetCard(Tables(s, dir, "documents")),
      Some(s"""
        WITH ${rulesCteSql()}
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT d.source) AS n_sources,
               COUNT(DISTINCT d.lang) AS n_langs,
               CAST(SUM(len(string_split_regex(trim(d.text), '\\s+'))) AS BIGINT) AS n_tokens,
               CAST(SUM(length(d.text)) AS BIGINT) AS n_chars,
               COUNT(d.text) - COUNT(DISTINCT md5(d.text)) AS n_exact_dup_docs,
               CAST(SUM(f.ok_words * f.ok_mean_len * f.ok_stopwords * f.ok_distinct) AS BIGINT) AS n_pass_quality
        FROM documents d JOIN f ON d.doc_id = f.doc_id"""),
    ),
    // Exact discrete token-length quantiles per source (p50/p90/p99) via
    // the histogram+cumsum shape — never a per-source sort.
    Q(
      "t_length_quantiles",
      (s, dir) => lengthQuantiles(Tables(s, dir, "documents")),
      Some("""
        WITH t AS (
          SELECT source,
                 COALESCE(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT), 0) AS toks
          FROM documents
        ),
        h AS (SELECT source, toks, COUNT(*) AS c FROM t GROUP BY source, toks),
        cu AS (SELECT source, toks,
                      SUM(c) OVER (PARTITION BY source ORDER BY toks) AS cum,
                      SUM(c) OVER (PARTITION BY source) AS n
               FROM h)
        SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
               CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN toks END) AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN toks END) AS BIGINT) AS p90,
               CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN toks END) AS BIGINT) AS p99
        FROM cu GROUP BY source ORDER BY source"""),
    ),
    // Top-3 distinctive terms per doc: tf-major, rare-term tie-break —
    // the integer-exact tf-idf ranking skeleton.
    Q(
      "c_tfidf_topk",
      (s, dir) => tfidfTopK(Tables(s, dir, "documents")).orderBy("doc_id", "rk"),
      Some("""
        WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
                   FROM documents WHERE text IS NOT NULL),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t WHERE token <> '' GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
        r AS (SELECT tf.doc_id, tf.token, tf.tf, df.doc_freq,
                row_number() OVER (PARTITION BY tf.doc_id
                  ORDER BY tf.tf DESC, df.doc_freq ASC, tf.token ASC) AS rk
              FROM tf JOIN df USING (token))
        SELECT doc_id, CAST(rk AS BIGINT) AS rk, token, tf, doc_freq
        FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""),
    ),
    // Sparse retrieval: integer-exact Okapi BM25 top-20 for a fixed
    // query-term bag — the dense ANN family's keyword counterpart.
    Q(
      "t_bm25_topk",
      (s, dir) => bm25TopK(Tables(s, dir, "documents")),
      Some(bm25OracleSql(Bm25Terms, kTop = 20)),
    ),
    // Crawl extraction over the synthetic HTML shell (script/style
    // blocks, entities, a malformed unclosed tag every 5th doc): the
    // body text must survive verbatim up to whitespace collapse, the
    // script's code must vanish entirely. Both engines run the identical
    // ordered regex/replace chain.
    Q(
      "t_html_strip",
      (s, dir) => {
        val docs = withSyntheticHtml(Tables(s, dir, "documents"))
        docs.select(col("doc_id"), stripMarkup(col("html")).as("clean_text"))
          .orderBy("doc_id")
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
                 '<html><head><title>t</title><style>p { color: red }</style>' ||
                 '<script type="text/javascript">var x = 1 < 2 && 3 > 2;</script></head><body>' ||
                 CASE WHEN doc_id % 5 = 0 THEN '<div class="unclosed" <p>' ELSE '' END ||
                 '<h1>Doc &quot;' || CAST(doc_id AS VARCHAR) || '&quot;</h1><p>' ||
                 COALESCE(text, '') ||
                 '</p><span>&amp;&nbsp;&lt;tail&gt;</span></body></html>' AS html
          FROM documents)
        SELECT doc_id,
               trim(regexp_replace(
                 replace(replace(replace(replace(replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(html, '(?is)<script\b.*?</script>', ' ', 'g'),
                       '(?is)<style\b.*?</style>', ' ', 'g'),
                     '(?s)<[^>]*>', ' ', 'g'),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&nbsp;', ' '), '&amp;', '&'),
                 '\s+', ' ', 'g')) AS clean_text
        FROM h ORDER BY doc_id"""),
    ),
    // The composed CRAWL chain under ONE end-to-end hash: markup strip →
    // mojibake repair → Gopher-rules gate, over the HTML shell wrapping
    // encoding-damaged full bodies — the first three stages every web
    // pipeline runs before any dedup, composed so a drift in ANY stage
    // (strip order, entity decode, fix table, rule thresholds) breaks
    // the final fingerprint. All fixture arms live: damaged (%4=1),
    // clean-decoy (%4=3), malformed-markup (%5=0), and both rule-gate
    // outcomes. Map-only until the caller aggregates.
    Q(
      "c_pipeline_crawl",
      (s, dir) => {
        val damaged = Tables(s, dir, "documents").withColumn("mtext", concat(
          coalesce(col("text"), lit("")),
          when(col("doc_id") % 4 === 1, lit(MojibakeGarble)).otherwise(lit("")),
          when(col("doc_id") % 4 === 3, lit(MojibakeDecoy)).otherwise(lit(""))))
        withSyntheticHtml(damaged, col("mtext"))
          .withColumn("ctext", stripMarkup(col("html")))
          .select(col("doc_id"),
            mojibakeCount(col("ctext")).as("n_bad"),
            md5(fixMojibake(col("ctext"))).as("fp"),
            qualityPass(fixMojibake(col("ctext"))).cast("long").as("pass"))
          .orderBy("doc_id")
      },
      Some(crawlPipelineOracleSql),
    ),
    // ftfy-style encoding repair over the planted mojibake fixture: the
    // damage count (threshold metric) and the repaired text itself, with
    // a clean-unicode decoy arm proving the fixer is not a non-ASCII
    // scrub. Map-only; both engines generated from MojibakeTable.
    Q(
      "t_mojibake_fix",
      (s, dir) => {
        val docs = withMojibake(Tables(s, dir, "documents"))
        docs.select(col("doc_id"),
          mojibakeCount(col("mtext")).as("n_bad"),
          fixMojibake(col("mtext")).as("fixed_text"))
          .orderBy("doc_id")
      },
      Some(mojibakeFixSql),
    ),
    // The Stack-style code-file layout rules over the planted code
    // fixture: each residue class fails exactly one arm, so a broken
    // conjunction cannot stay green. Integer/milli-exact; map-only.
    Q(
      "t_code_rules",
      (s, dir) =>
        codeRules(withCodeText(Tables(s, dir, "documents")), textCol = "ctext")
          .orderBy("doc_id"),
      Some("""
        WITH c AS (
          SELECT doc_id,
                 CASE
                   WHEN doc_id % 6 = 0 THEN repeat('x(a);', 44) || repeat(chr(10) || 'ok', 9)
                   WHEN doc_id % 6 = 1 THEN repeat('QUJD', 20)
                   WHEN doc_id % 6 = 2 THEN repeat('!@#$' || chr(10), 29) || '!@#$'
                   WHEN doc_id % 6 = 3 THEN rtrim(repeat('alpha beta ', 14)) || chr(10) || rtrim(repeat('alpha beta ', 14))
                   ELSE substring(COALESCE(text, ''), 1, 80) || chr(10) || 'val n = 1' || chr(10) || '// end'
                 END AS t
          FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(string_split(t, chr(10))) AS BIGINT) AS nl,
                 CAST(list_aggregate(list_transform(string_split(t, chr(10)), x -> length(x)), 'max') AS BIGINT) AS mx,
                 CAST(length(t) AS BIGINT) AS n_chars,
                 CAST(length(t) - length(regexp_replace(t, '[A-Za-z0-9]', '', 'g')) AS BIGINT) AS aln,
                 CASE WHEN regexp_matches(t, '[A-Za-z0-9+/=]{64}') THEN 1 ELSE 0 END AS blob
          FROM c)
        SELECT doc_id, mx AS max_line_len,
               CAST(((n_chars - (nl - 1)) * 1000) // nl AS BIGINT) AS avg_line_milli,
               CAST(CASE WHEN n_chars = 0 THEN 0 ELSE (aln * 1000) // n_chars END AS BIGINT) AS alnum_milli,
               CAST(blob AS BIGINT) AS has_blob,
               CAST(CASE WHEN mx <= 200 AND ((n_chars - (nl - 1)) * 1000) // nl <= 100000
                          AND n_chars > 0 AND (aln * 1000) // n_chars >= 250 AND blob = 0
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM m ORDER BY doc_id"""),
    ),
    // Gopher line-based rules over the planted layout fixture: docs %3
    // gain a dominant bullet list (trips ok_bullet unless the %12 teaser
    // line dilutes it back under 90%), docs %4 an ellipsis teaser — both
    // failure arms and the pass arm all occur (live at sf0.01:
    // 125/83/292). Cross-multiplied integer thresholds.
    Q(
      "t_line_rules",
      (s, dir) =>
        lineRules(layoutText(Tables(s, dir, "documents")), textCol = "qtext")
          .orderBy("doc_id"),
      Some("""
        WITH p AS (
          SELECT doc_id, concat_ws(chr(10),
            CASE WHEN doc_id % 3 = 0 THEN
              '- item alpha' || chr(10) || '- item beta' || chr(10) ||
              '- item gamma' || chr(10) || '- item delta' || chr(10) ||
              '- item epsilon' || chr(10) || '- item zeta' || chr(10) ||
              '- item eta' || chr(10) || '- item theta' || chr(10) ||
              '- item iota' || chr(10) || '- item kappa' || chr(10) ||
              '- item lambda' || chr(10) || '- item mu' END,
            text,
            CASE WHEN doc_id % 4 = 0 THEN 'read more soon ...' END) AS qtext
          FROM documents),
        w AS (SELECT doc_id,
                     list_filter(list_transform(string_split(COALESCE(qtext, ''), chr(10)),
                       x -> trim(x)), x -> x <> '') AS ls
              FROM p),
        c AS (SELECT doc_id,
                     CAST(len(ls) AS BIGINT) AS n_lines,
                     CAST(len(list_filter(ls, x -> x LIKE '- %' OR x LIKE '* %'
                                              OR x LIKE '• %')) AS BIGINT) AS n_bullet,
                     CAST(len(list_filter(ls, x -> x LIKE '%...'
                                              OR x LIKE '%…')) AS BIGINT) AS n_ellipsis
              FROM w)
        SELECT doc_id, n_lines, n_bullet, n_ellipsis,
               CAST(CASE WHEN n_lines > 0 AND n_bullet * 100 <= n_lines * 90
                         THEN 1 ELSE 0 END AS BIGINT) AS ok_bullet,
               CAST(CASE WHEN n_lines > 0 AND n_ellipsis * 100 <= n_lines * 30
                         THEN 1 ELSE 0 END AS BIGINT) AS ok_ellipsis
        FROM c ORDER BY doc_id"""),
    ),
    Q(
      "t_fingerprint",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"),
    ),
    // The heuristic is pure literal-replace counting + argmax, so the same
    // computation is expressible in DuckDB SQL — full hash-match oracle.
    // Result is (doc_id, predicted, actual) for eyeballing accuracy.
    Q(
      "t_langid",
      (s, dir) =>
        // r21: Spread — langId is a per-row replace-count battery
        graft.Spread(Tables(s, dir, "documents"))
          .select(col("doc_id"), langId(col("text")).as("lang_pred"), col("lang"))
          .orderBy("doc_id"),
      Some(langIdOracleSql),
    ),
    // WordPiece tokenization (the BERT apply semantics the BPE faces
    // can't express): ##-continuation matching and whole-word UNK with
    // piece discard, both arms live on the fixture vocab. The oracle
    // replays the position-dependent greedy walk with a recursive CTE.
    Q(
      "c_tokenize_wordpiece",
      (s, dir) =>
        graft.Spread(Tables(s, dir, "documents")
          .filter(col("text").isNotNull))
          .select(col("doc_id"), wordpieceTokenize(col("text")).as("idsa"))
          .select(
            col("doc_id"),
            array_join(transform(col("idsa"), _.cast("string")), ",").as("ids"),
            size(col("idsa")).cast("long").as("n_pieces"),
            size(filter(col("idsa"), _ === 0L)).cast("long").as("n_unk"))
          .orderBy("doc_id"),
      Some(wordpieceOracleSql),
    ),
    // Unicode-script profile over the planted multi-script fixture: the
    // routing step ahead of langId (script ranges need no word lists).
    // Every script arm live by residue; counts + argmax hash-oracled
    // from ONE pattern string per block shared across engines.
    Q(
      "t_script_stats",
      (s, dir) =>
        scriptStats(withScriptText(Tables(s, dir, "documents")), textCol = "stext")
          .orderBy("doc_id"),
      Some(scriptStatsOracleSql),
    ),
    // Unigram-LM Viterbi tokenization (the SentencePiece decode): the
    // segmentation MAXIMIZING summed piece scores, which no greedy face
    // can produce (fixture arm: "scan" → sca+n over the whole-word
    // match). Oracle enumerates all paths recursively and ranks by the
    // same (score, count, lex) order; score is re-derived from the ids
    // on the Spark side, so the lookup table is pinned too.
    Q(
      "c_tokenize_unigram",
      (s, dir) => {
        val scoresLit = typedlit(UnigramVocab.map(_._2))
        val pieceScore = (id: Column) =>
          when(id === 0L, 0L).otherwise(element_at(scoresLit, id.cast("int")))
        graft.Spread(Tables(s, dir, "documents")
          .filter(col("text").isNotNull))
          .select(col("doc_id"), unigramTokenize(col("text")).as("idsa"))
          .select(
            col("doc_id"),
            array_join(transform(col("idsa"), _.cast("string")), ",").as("ids"),
            size(col("idsa")).cast("long").as("n_pieces"),
            size(filter(col("idsa"), _ === 0L)).cast("long").as("n_unk"),
            aggregate(col("idsa"), lit(0L), (acc, id) => acc + pieceScore(id)).as("score"))
          .orderBy("doc_id")
      },
      Some(unigramOracleSql),
    ),
    // Unigram vocab TRAINING (hard-EM / Viterbi-EM, Kudo 2018 §3.2 made
    // integer-exact): substring-count seeding, two E/M iterations where
    // the E-step is the SAME Viterbi kernel the apply face runs and the
    // M-step re-scores by usage bit length. The oracle replays the whole
    // run — seed, both iterations, the final usage table.
    Q(
      "c_unigram_train",
      (s, dir) => {
        import s.implicits._
        UnigramTrain.train(Tables(s, dir, "documents"), iters = 2)
          .map { case (p, sc, u) => (p, u, sc) }
          .sortBy { case (p, u, _) => (-u, p) }
          .take(30)
          .toDF("piece", "usage", "score")
      },
      Some(unigramTrainOracleSql),
    ),
    // The trained model applied back to the corpus word types — a third
    // Viterbi pass under the learned scores, pinning train→apply as one
    // end-to-end chain (the c_bpe_train_apply precedent).
    Q(
      "c_unigram_train_apply",
      (s, dir) => {
        val vocab = UnigramTrain.trainedVocab(Tables(s, dir, "documents"), iters = 2)
        val scoresLit = typedlit(vocab.map(_._2))
        val pieceScore = (id: Column) =>
          when(id === 0L, 0L).otherwise(element_at(scoresLit, id.cast("int")))
        UnigramTrain.wordTypes(Tables(s, dir, "documents"))
          .select(col("w").as("word"), unigramTokenize(col("w"), vocab).as("idsa"))
          .select(col("word"),
            array_join(transform(col("idsa"), _.cast("string")), ",").as("ids"),
            aggregate(col("idsa"), lit(0L), (acc, id) => acc + pieceScore(id)).as("score"))
          .orderBy("word")
      },
      Some(unigramTrainApplyOracleSql),
    ),
    // Packing denominated in the TRAINED unigram tokenizer — the full
    // self-contained chain train → count → pack under ONE hash (the
    // c_pack_bpe plumbing with a LEARNED model instead of a frozen
    // fixture vocab): the oracle re-runs the entire hard-EM training,
    // re-segments every word type under the trained scores, folds
    // per-doc counts, and chains them into the pack cumsum.
    Q(
      "c_pack_unigram",
      (s, dir) => {
        val vocab = UnigramTrain.trainedVocab(Tables(s, dir, "documents"), iters = 2)
        Curation.packSequences(Tables(s, dir, "documents"), maxLen = 256,
          countOf = c => size(unigramTokenize(c, vocab)).cast("long")).orderBy("doc_id")
      },
      Some(packUnigramOracleSql),
    ),
    // HELD-OUT tokenizer evaluation — the leakage-free protocol: the
    // unigram model trains on the md5 TRAIN split only, then tokenizes
    // the TEST split; per test doc, piece and UNK counts. The planted
    // " zebraz" arm (%2=0 test docs) carries a character the train
    // split never saw, so the whole-word-UNK path is live; everything
    // else stays coverable (single chars seed from train words). The
    // oracle re-runs training on the train-split word types and a
    // Viterbi apply pass over the test-split word types.
    Q(
      "c_unigram_heldout",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val vocab = UnigramTrain.trainedVocab(
          docs.filter(splitName(col("doc_id")) === "train"), iters = 2)
        val scoredTest = docs
          .filter(splitName(col("doc_id")) === "test" && col("text").isNotNull)
          .withColumn("htext", concat(col("text"),
            when(col("doc_id") % 2 === 0, lit(" zebraz")).otherwise(lit(""))))
          .select(col("doc_id"), unigramTokenize(col("htext"), vocab).as("idsa"))
        scoredTest.select(
          col("doc_id"),
          size(col("idsa")).cast("long").as("n_pieces"),
          size(filter(col("idsa"), _ === 0L)).cast("long").as("n_unk"))
          .orderBy("doc_id")
      },
      Some(unigramHeldoutOracleSql),
    ),
    // Exact heavy hitters: top-20 tokens by total term frequency. The
    // small-data face the CMS query audits against.
    Q(
      "t_heavy_hitters",
      (s, dir) => heavyHittersExact(Tables(s, dir, "documents"), 20),
      Some("""
        WITH tok AS (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE text IS NOT NULL)
        SELECT token, COUNT(*) AS cnt FROM tok WHERE token <> ''
        GROUP BY token ORDER BY cnt DESC, token LIMIT 20"""),
    ),
    // Count-Min sketch heavy hitters: the exact top-20 with their CMS
    // point estimates. The md5 hash family makes the whole sketch
    // deterministic, so matrix AND estimates hash-match across engines;
    // estimate ≥ exact (the one-sided CMS guarantee) is spec-pinned
    // corpus-wide in CmsSpec.
    Q(
      "t_heavy_hitters_cms",
      (s, dir) => cmsHeavyHitters(Tables(s, dir, "documents"), 20, depth = 4, width = 512),
      Some(cmsOracleSql(20, 4, 512)),
    ),
    // Vocabulary-cardinality HLL per source: the CARDINALITY sketch next
    // to the CMS FREQUENCY sketch — together the two fixed-size summaries
    // a 100 TB token profile runs (how many distinct tokens / how often
    // each). Reuses the trck HllAggregator (register-level parity-tested
    // against the reference); the oracle hash-compares the exact distinct
    // count and the within-4% flag (the a4_hll_estimate_check pattern).
    // Feeding the sketch deduped (source, token) pairs is byte-identical
    // to feeding every occurrence — register-max insertion is idempotent.
    Q(
      "t_vocab_hll",
      (s, dir) => {
        import graft.functions.HllAggregator
        val tok = Tables(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("token"))
          .filter(col("token") =!= "")
        tok.distinct()
          .groupBy("source")
          .agg(
            HllAggregator.trckHllHex(encode(col("token"), "UTF-8")).as("hll_hex"),
            count(lit(1)).cast("long").as("n_exact"))
          .withColumn("within_tol",
            abs(HllAggregator.estimateUdf(col("hll_hex")) - col("n_exact")) <=
              lit(0.04) * greatest(col("n_exact"), lit(1L)))
          .select(col("source"), col("n_exact"), col("within_tol"))
          .orderBy("source")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE text IS NOT NULL)
        SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_exact,
               TRUE AS within_tol
        FROM tok WHERE token <> '' GROUP BY source ORDER BY source"""),
    ),
    // CMS calibration report: the overestimate-error histogram over
    // EVERY distinct token (est − exact; never negative — the one-sided
    // guarantee shows up as the absent negative bucket) plus the exact
    // and estimated masses. The evaluation face that sizes (depth,
    // width) for a corpus — the d_minhash_recall analog for the sketch
    // family. Deterministic end-to-end, so the whole histogram
    // hash-matches. width=64 here (vs the heavy-hitter query's 512) so
    // collisions actually occur and the error arms are non-vacuous.
    Q(
      "t_cms_err",
      (s, dir) => {
        val (depth, width) = (4, 64)
        val docs = Tables(s, dir, "documents")
        val exact = docs.filter(col("text").isNotNull)
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        exact.crossJoin(broadcast(cmsSketch(docs, depth, width)))
          .select(col("token"), col("exact_cnt"),
            (cmsEstimate(col("token"), col("sketch"), depth, width) - col("exact_cnt"))
              .as("err"))
          .groupBy("err")
          .agg(count(lit(1)).as("n_tokens"), sum("exact_cnt").as("exact_mass"))
          .orderBy("err")
      },
      Some("""
        WITH tok AS (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE text IS NOT NULL),
        t2 AS (SELECT token FROM tok WHERE token <> ''),
        e AS (SELECT token, COUNT(*) AS exact_cnt FROM t2 GROUP BY token),
        rws AS (SELECT unnest(range(0, 4)) AS r),
        cells AS (
          SELECT rws.r AS r,
                 CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR) || ':' || t2.token), 1, 8) AS BIGINT) % 64 AS b,
                 COUNT(*) AS c
          FROM t2 CROSS JOIN rws GROUP BY 1, 2),
        est AS (
          SELECT e.token, e.exact_cnt, MIN(COALESCE(c.c, 0)) AS est
          FROM e CROSS JOIN rws
          LEFT JOIN cells c ON c.r = rws.r
           AND c.b = CAST('0x' || substring(md5(CAST(rws.r AS VARCHAR) || ':' || e.token), 1, 8) AS BIGINT) % 64
          GROUP BY e.token, e.exact_cnt)
        SELECT CAST(est - exact_cnt AS BIGINT) AS err,
               COUNT(*) AS n_tokens,
               CAST(SUM(exact_cnt) AS BIGINT) AS exact_mass
        FROM est GROUP BY 1 ORDER BY err"""),
    ),
    // The distributed-merge face: per-source sketches next to per-source
    // exact counts for the global top-5 — the linearity property (sum of
    // per-source matrices == global matrix) is what makes the sketch
    // mergeable across executors and days; CmsSpec pins it exactly.
    Q(
      "t_cms_merge",
      (s, dir) => cmsMergeReport(Tables(s, dir, "documents"), 5, depth = 4, width = 512),
      Some(cmsMergeOracleSql(5, 4, 512)),
    ),
    // Mergeable quantile sketch (log2 histogram, HdrHistogram/DDSketch
    // family): the quantile member of the sketch triad. The registered
    // face is the AGGREGATOR build (one 7.7 KB partial per partition —
    // the 100 TB shape); the oracle replays the whole histogram
    // declaratively from the same integer bucket rule.
    Q(
      "t_qsketch",
      (s, dir) => qsketchHistogram(Tables(s, dir, "documents")),
      Some(s"""
        WITH v AS (SELECT source, COALESCE(n_chars, 0) AS v FROM documents),
        b AS (SELECT source, ${qsketchBucketSql("v")} AS bucket FROM v)
        SELECT source, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS cnt,
               CAST(${qsketchLoSql("bucket")} AS BIGINT) AS lo,
               CAST(${qsketchHiSql("bucket")} AS BIGINT) AS hi
        FROM b GROUP BY source, bucket ORDER BY source, bucket"""),
    ),
    // The sketch's error CONTRACT, verified corpus-wide: per-source
    // p50/p90/p99 bounds from the sketch next to the exact discrete
    // quantiles, with in-bounds flags in the cross-engine hash.
    Q(
      "t_qsketch_err",
      (s, dir) => qsketchQuantiles(Tables(s, dir, "documents")),
      Some {
        val loHi = Seq(50, 90, 99).map { p =>
          s"""CAST(${qsketchLoSql(s"b$p")} AS BIGINT) AS p${p}_lo,
               CAST(${qsketchHiSql(s"b$p")} AS BIGINT) AS p${p}_hi,
               CAST(e$p AS BIGINT) AS p${p}_exact,
               CAST(CASE WHEN ${qsketchLoSql(s"b$p")} <= e$p AND e$p <= ${qsketchHiSql(s"b$p")} THEN 1 ELSE 0 END AS BIGINT) AS p${p}_ok"""
        }.mkString(",\n               ")
        val bMins = Seq(50, 90, 99).map(p =>
          s"MIN(CASE WHEN cum * 100 >= n * $p THEN bucket END) AS b$p").mkString(", ")
        val eMins = Seq(50, 90, 99).map(p =>
          s"MIN(CASE WHEN cum * 100 >= n * $p THEN v END) AS e$p").mkString(", ")
        s"""
        WITH vv AS (SELECT source, COALESCE(n_chars, 0) AS v FROM documents),
        bb AS (SELECT source, v, ${qsketchBucketSql("v")} AS bucket FROM vv),
        hb AS (SELECT source, bucket, COUNT(*) AS c FROM bb GROUP BY source, bucket),
        cb AS (SELECT source, bucket,
                      SUM(c) OVER (PARTITION BY source ORDER BY bucket) AS cum,
                      SUM(c) OVER (PARTITION BY source) AS n FROM hb),
        qb AS (SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, $bMins
               FROM cb GROUP BY source),
        hv AS (SELECT source, v, COUNT(*) AS c FROM vv GROUP BY source, v),
        cv AS (SELECT source, v,
                      SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
                      SUM(c) OVER (PARTITION BY source) AS n FROM hv),
        qv AS (SELECT source, $eMins FROM cv GROUP BY source)
        SELECT source, n_docs,
               $loHi
        FROM qb JOIN qv USING (source) ORDER BY source"""
      },
    ),
    // Per-source distribution drift off the sketch: ppm L1 distance from
    // the corpus-wide histogram — the ingest diagnostic for a source
    // whose length distribution has gone wrong.
    Q(
      "t_qsketch_drift",
      (s, dir) => qsketchDrift(Tables(s, dir, "documents")),
      Some(s"""
        WITH v AS (SELECT source, COALESCE(n_chars, 0) AS v FROM documents),
        b AS (SELECT source, ${qsketchBucketSql("v")} AS bucket FROM v),
        hs AS (SELECT source, bucket, COUNT(*) AS c FROM b GROUP BY source, bucket),
        ns AS (SELECT source, COUNT(*) AS n_docs FROM b GROUP BY source),
        hg AS (SELECT bucket, COUNT(*) AS cg FROM b GROUP BY bucket),
        ng AS (SELECT COUNT(*) AS ng FROM b)
        SELECT ns.source, CAST(ns.n_docs AS BIGINT) AS n_docs,
               CAST(SUM(ABS(COALESCE(hs.c, 0) * 1000000 // ns.n_docs
                            - hg.cg * 1000000 // ng.ng)) AS BIGINT) AS drift_ppm
        FROM ns CROSS JOIN hg CROSS JOIN ng
        LEFT JOIN hs ON hs.source = ns.source AND hs.bucket = hg.bucket
        GROUP BY ns.source, ns.n_docs ORDER BY ns.source"""),
    ),
    // The CDF read of the sketch: per-source ppm-of-mass-below-threshold
    // BOUNDS beside the exact ppm, ok flags a theorem of the bucket map.
    Q(
      "t_qsketch_cdf",
      (s, dir) => qsketchCdf(Tables(s, dir, "documents")),
      Some {
        val ts = Seq(100L, 200L, 400L)
        val sCols = ts.flatMap { t =>
          Seq(s"SUM(CASE WHEN ${qsketchHiSql("bucket")} <= $t THEN c ELSE 0 END) AS c${t}_lo",
            s"SUM(CASE WHEN ${qsketchLoSql("bucket")} <= $t THEN c ELSE 0 END) AS c${t}_hi")
        }.mkString(",\n               ")
        val eCols = ts.map(t =>
          s"SUM(CASE WHEN v <= $t THEN 1 ELSE 0 END) AS c${t}_ex").mkString(", ")
        val outCols = ts.map { t =>
          s"""CAST(sk.c${t}_lo * 1000000 // ex.n_docs AS BIGINT) AS t${t}_lo,
               CAST(sk.c${t}_hi * 1000000 // ex.n_docs AS BIGINT) AS t${t}_hi,
               CAST(ex.c${t}_ex * 1000000 // ex.n_docs AS BIGINT) AS t${t}_exact,
               CAST(CASE WHEN sk.c${t}_lo <= ex.c${t}_ex AND ex.c${t}_ex <= sk.c${t}_hi
                    THEN 1 ELSE 0 END AS BIGINT) AS t${t}_ok"""
        }.mkString(",\n               ")
        s"""
        WITH v AS (SELECT source, COALESCE(n_chars, 0) AS v FROM documents),
        b AS (SELECT source, ${qsketchBucketSql("v")} AS bucket FROM v),
        hb AS (SELECT source, bucket, COUNT(*) AS c FROM b GROUP BY source, bucket),
        sk AS (SELECT source,
               $sCols
               FROM hb GROUP BY source),
        ex AS (SELECT source, COUNT(*) AS n_docs, $eCols FROM v GROUP BY source)
        SELECT ex.source, CAST(ex.n_docs AS BIGINT) AS n_docs,
               $outCols
        FROM sk JOIN ex ON ex.source = sk.source ORDER BY ex.source"""
      },
    ),
  )

  /** DuckDB CTE chain `s → f` computing exactly [[ruleFlags]] (defaults
    * 30/10000/4/2) as 0/1 ints per doc_id over `from` (default
    * `documents`; the curation-funnel oracle feeds it the dedup-survivor
    * CTE). The stopword sum is generated from [[Stopwords]] — the
    * operator and oracle can never drift. The doubled-separator padding
    * mirrors [[wordOccurrences]] so adjacent stopwords (" a a a ") count
    * exactly in both engines.
    */
  private[operators] def rulesCteSql(from: String = "documents"): String = {
    val stopSum = Stopwords.map { w =>
      val needle = s" $w "
      // SQL-escape quotes (the bpeVocabSqlList precedent): a stopword
      // with an apostrophe (French "l'", "d'") must not corrupt the query
      val esc = needle.replace("'", "''")
      s"(length(p) - length(replace(p, '$esc', ''))) // ${needle.length}"
    }.mkString("\n                 + ")
    s"""s AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) AS BIGINT) AS n,
                 CAST(length(regexp_replace(COALESCE(text, ''), '\\s+', '', 'g')) AS BIGINT) AS wchars,
                 CAST(len(list_distinct(string_split_regex(trim(COALESCE(text, '')), '\\s+'))) AS BIGINT) AS nd,
                 ' ' || replace(regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g'), ' ', '  ') || ' ' AS p
          FROM $from),
        f AS (
          SELECT doc_id,
                 CASE WHEN n BETWEEN 30 AND 10000 THEN 1 ELSE 0 END AS ok_words,
                 CASE WHEN 4 * n <= wchars AND wchars <= 10 * n THEN 1 ELSE 0 END AS ok_mean_len,
                 CASE WHEN $stopSum >= 2 THEN 1 ELSE 0 END AS ok_stopwords,
                 CASE WHEN nd * 2 >= n THEN 1 ELSE 0 END AS ok_distinct
          FROM s)"""
  }

  /** The fixture vocab as a DuckDB list literal — single source of truth
    * with [[BpeVocab]] so the two engines can never drift. Single quotes
    * are SQL-escaped by doubling: the current fixture has none, but a
    * future entry containing one would otherwise silently corrupt every
    * BPE oracle string.
    */
  private[graft] def bpeVocabSqlList: String =
    BpeVocab.map(v => s"'${v.replace("'", "''")}'").mkString(", ")

  /** DuckDB CASE expression computing exactly [[splitName]] for `idExpr`
    * — the oracle-side single source of the hash-split rule. New oracles
    * must use this instead of hand-inlining the md5-bucket CASE (the
    * pre-r14 oracles carry verified inline copies; consolidate
    * opportunistically, never silently).
    */
  private[operators] def splitCaseSql(idExpr: String = "doc_id"): String =
    s"""CASE WHEN CAST('0x' || substring(md5(CAST($idExpr AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 80 THEN 'train'
                      WHEN CAST('0x' || substring(md5(CAST($idExpr AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 90 THEN 'val'
                      ELSE 'test' END"""

  /** DuckDB SQL computing exactly [[langId]]: per-language occurrence sums
    * via literal replace, argmax with ties to the lexicographically largest
    * language (mirrors greatest() over (score, lang) structs).
    */
  private def langIdOracleSql: String = {
    val langs = profiles.keys.toSeq.sorted
    val scoreExprs = langs.map { l =>
      val sum = profiles(l)
        .map(n => s"(length(t) - length(replace(t, '$n', ''))) // ${n.length}")
        .mkString(" + ")
      s"CAST($sum AS BIGINT) AS s_$l"
    }.mkString(",\n             ")
    val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.reverse.init
      .map(l => s"WHEN s_$l = $g THEN '$l'")
      .mkString("\n               ")
    s"""
      WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS t FROM documents),
      s AS (SELECT doc_id, lang,
             $scoreExprs
            FROM p)
      SELECT doc_id,
             CASE WHEN $g IS NULL OR $g <= 0 THEN 'und'
               $cases
               ELSE '${langs.head}' END AS lang_pred,
             lang
      FROM s ORDER BY doc_id"""
  }
}
