package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Curation operators vs independent pure-Scala references — the same
  * discipline the FSM operators get from the reference's trick generator
  * (/root/reference/trick/trick.py, test/run_test.sh:87-141): every
  * operator is recomputed by a straight-line Scala implementation that
  * shares no code with the DataFrame version, on fixtures that include the
  * degenerate shapes the sf corpora never produce (null / empty /
  * whitespace-only / sub-k-word text, tied hash keys, repartitioned input).
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("curation-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- pure-Scala mirrors of the shared primitives ----------------------

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def splitOf(id: Long): String = {
    val b = java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 4), 16) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  /** ≡ MinHash.shingles: split(trim(text), "\\s+") with the <k full-join. */
  private def shingles(text: String, k: Int): Seq[String] = {
    val ws = text.trim.split("\\s+", -1).toSeq
    if (ws.size < k) Seq(ws.mkString(" "))
    else (0 to ws.size - k).map(i => ws.slice(i, i + k).mkString(" "))
  }

  // ---- decontaminate ----------------------------------------------------

  test("decontaminate matches a pure-Scala reference incl. empty/short text") {
    val s = spark
    import s.implicits._
    // ids bucketed by the REAL split hash; take enough of each
    val ids = (0L until 400L).toVector
    val train = ids.filter(splitOf(_) == "train")
    val test = ids.filter(splitOf(_) == "test")
    assert(train.size >= 7 && test.size >= 5, "fixture needs both splits populated")

    // test-split texts define the contamination surface; train texts probe
    // every edge: full overlap, partial, none, sub-k, whitespace, empty
    val testTexts = Vector(
      "one two three four five six",     // shingles shared with train(0)
      "alpha beta gamma delta epsilon",  // shared with train(1) partially
      "",                                // "" shingle — shares with empty train docs
      "a b",                             // sub-k: single "a b" shingle
      "seven eight nine ten eleven twelve thirteen",
    )
    val trainTexts = Vector(
      "one two three four five six",          // identical → all shingles shared
      "zz alpha beta gamma delta epsilon zz", // interior overlap
      "nothing here overlaps at all friend",  // no overlap
      "a b",                                  // sub-k exact match of test(3)
      "   ",                                  // whitespace-only → "" shingle, shared with test(2)
      "one two three four five six one two three four five six", // dup shingles count once
    )
    val docs =
      test.zip(testTexts).map { case (id, t) => (id, t) } ++
        train.zip(trainTexts).map { case (id, t) => (id, t) } ++
        Seq((train(trainTexts.size), null.asInstanceOf[String])) // null text drops out

    val k = 5
    val got = Curation.decontaminate(docs.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent reference: distinct train shingles ∩ union of test shingles
    val testSh = test.zip(testTexts).flatMap { case (_, t) => shingles(t, k) }.toSet
    val expected = train.zip(trainTexts).flatMap { case (id, t) =>
      val n = shingles(t, k).distinct.count(testSh.contains)
      if (n > 0) Some(id -> n.toLong) else None
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // the edges actually fired: identical, whitespace-empty, and sub-k all shared
    assert(expected.contains(train(0)) && expected.contains(train(3)) && expected.contains(train(4)))
    assert(!expected.contains(train(2)))
    // the two-stage bloom-prefiltered variant must be output-identical:
    // zero false negatives keeps every contaminated doc through stage 1,
    // and the exact stage-2 join discards the sketch's false positives
    val staged = Curation.decontaminateBloomStaged(docs.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(staged == expected, s"staged $staged\nexpected $expected")
  }

  test("sampleBySourceWeights: deterministic, repartition-stable, 0/100 exact, split-decorrelated") {
    val s = spark
    import s.implicits._
    val docs = (0L until 600L).map(id => (id, s"src${id % 3}")).toDF("doc_id", "source")
    val weights = Map("src0" -> 0, "src1" -> 100, "src2" -> 40)
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Curation.sampleBySourceWeights(df, weights, defaultPct = 30)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = kept(docs)
    // weight 0 keeps nothing, 100 keeps everything, 40 keeps ~40%
    assert(!a.exists(_ % 3 == 0))
    assert((0L until 600L).filter(_ % 3 == 1).forall(a.contains))
    val n2 = a.count(_ % 3 == 2)
    assert(n2 > 40 && n2 < 120, s"src2 kept $n2 of 200 at 40%")
    // deterministic under replan and repartitioning — resumable ingestion
    assert(kept(docs) == a)
    assert(kept(docs.repartition(13)) == a)
    // salted bucket decorrelates sampling from the id-keyed split: the
    // sampled set must not be a subset/superset of one split bucket
    val splits = a.count(id => splitOf(id) == "train").toDouble / a.size
    assert(splits > 0.6 && splits < 0.95, s"train fraction in sample $splits")
    // the salt key is length-prefixed: a ':' inside a source name must not
    // make (source 'a:1', id 'x') share (source 'a', id '1:x')'s coin —
    // with a plain source:id concat both hash 'a:1:x' and correlate
    val ambiguous = Seq(("a:1", "x"), ("a", "1:x"))
      .toDF("source", "doc_id")
    // identical coins would flip 0→2 at one threshold; independent coins
    // pass through exactly 1 at some p
    val independent = (0 to 99).exists { p =>
      Curation.sampleBySourceWeights(
        ambiguous, Map.empty, defaultPct = p, idCol = "doc_id").count() == 1L
    }
    assert(independent, "ambiguous keys still share one sampling coin")
  }

  test("cdcChunkStats: insertion-robust where fixed-stride passages are not") {
    val s = spark
    import s.implicits._
    // a long shared tail; doc 2 = doc 1 with ONE word inserted up front.
    // CDC must re-synchronize at the first boundary word after the
    // insertion so the tail chunks deduplicate; a fixed 16-word stride
    // shifts every chunk and finds zero duplication.
    val tail = (0 until 120).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, tail),
      (2L, s"inserted $tail"),
      (3L, (0 until 60).map(i => s"other$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkStats(docs, avgChunkWords = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val passage = Dedup.passageDupStats(docs, w = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // passage split: the insertion shifts every 16-word window → no dups
    assert(passage(1L)._2 == 0 && passage(2L)._2 == 0,
      s"stride chunks should all shift: $passage")
    // CDC split: most of the shared tail deduplicates despite the insertion
    assert(cdc(1L)._2 > cdc(1L)._1 / 2,
      s"CDC should dedup most of doc 1's chunks against doc 2: $cdc")
    assert(cdc(2L)._2 >= cdc(1L)._2 - 1, s"and symmetrically for doc 2: $cdc")
    assert(cdc(3L)._2 == 0, s"unrelated doc stays unique: $cdc")
    // determinism
    assert(Dedup.cdcChunkStats(docs, avgChunkWords = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap ==
      cdc.map { case (k, v) => k -> v._2 })
  }

  test("cdcChunkHashes: empty text yields exactly one chunk for every mask") {
    // md5_60("") & 7 == 0 (boundary fires) but & 63 == 0x20 != 0 — before
    // the trailing-emit guard an empty doc silently vanished at mask 63,
    // breaking the one-row-per-doc accounting contract
    for (mask <- Seq(1, 7, 63, 255)) {
      val hs = Dedup.cdcChunkHashes("", mask)
      assert(hs.length == 1, s"mask $mask: $hs")
      // spaces only: SQL trim strips spaces, not tabs (a surviving tab
      // splits into two empty words on BOTH the kernel and SQL sides)
      assert(hs == Dedup.cdcChunkHashes("     ", mask),
        s"space-only ≡ empty at mask $mask")
    }
  }

  test("bigramSupport: hand-computed corpus frequencies, short docs, null text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c"),    // bigrams: "a b", "b c"
      (1L, "a b d"),    // bigrams: "a b", "b d"
      (2L, "x"),        // short doc: single "bigram" = whole text
      (3L, "x"),        // same — the two short docs support each other
      (4L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val out = Curation.bigramSupport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    // corpus counts: "a b"→2, "b c"→1, "b d"→1, "x"→2
    assert(out(0L) == ((2L, (2L + 1L) / 2)), out.toString)  // (2+1) div 2 = 1
    assert(out(1L) == ((2L, 1L)))
    assert(out(2L) == ((1L, 2L)) && out(3L) == ((1L, 2L)))
    assert(out(4L) == ((0L, -1L)), "null text → zero bigrams, null support")
  }

  test("bigramSupport skew fallback: boilerplate corpus auto-switches to the agg-join shape, identical rows") {
    val s = spark
    import s.implicits._
    // one boilerplate bigram set dominating the corpus — the shape whose
    // windowed plan would pin every occurrence of a hot key on one task
    val docs = ((0L until 200L).map(i => (i, "the same boilerplate line")) ++
      Seq((200L, "a b c"), (201L, "x"), (202L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    // full-sample pre-flight + tiny threshold → the dispatcher MUST take
    // the agg-join shape; witness at the plan level: no Window node
    val switched = Curation.bigramSupport(docs, skewSampleFrac = 1.0, maxWindowKeyRows = 10)
    assert(!switched.queryExecution.optimizedPlan.toString.contains("Window"),
      "skew fallback must not contain a window")
    // pre-flight disabled → the windowed default (plan witness: Window)
    val windowed = Curation.bigramSupport(docs, skewSampleFrac = 0.0)
    assert(windowed.queryExecution.optimizedPlan.toString.contains("Window"))
    // both shapes produce identical rows (the registered query's oracle
    // hash therefore holds whichever shape the pre-flight dispatches)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val sw = rows(switched)
    assert(sw == rows(windowed), s"shapes disagree:\n$sw")
    // spot-check the dominant docs: 3 bigrams each, every one at corpus
    // frequency 200 → support (3*200) div 3 = 200
    assert(sw.contains((0L, 3L, 200L)))
    assert(sw.contains((202L, 0L, -1L)), "null text → zero bigrams, null support")
    // benign corpus at default thresholds stays windowed (no false switch)
    val benign = Curation.bigramSupport(docs)
    assert(benign.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("bigramSupport shapes agree on randomized corpora (duplication, short docs, nulls)") {
    val s = spark
    import s.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    for (seed <- Seq(7, 19, 41)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
      val docs = (0L until 60L).map { i =>
        val t = rnd.nextInt(10) match {
          case 0 => null // null text
          case 1 => vocab(rnd.nextInt(vocab.size)) // sub-2-word: whole text as bigram
          case 2 => "" // empty string (also sub-2-word path)
          case _ =>
            // duplication-heavy: small vocab, geometric lengths
            Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        }
        (i, t)
      }.toDF("doc_id", "text")
      val windowed = rows(Curation.bigramSupport(docs, skewSampleFrac = 0.0))
      val aggjoin = rows(Curation.bigramSupportAggJoin(docs))
      assert(windowed == aggjoin,
        s"seed=$seed: shapes disagree\nwindow: $windowed\naggjoin: $aggjoin")
    }
  }

  test("packSequences: hand-computed offsets, boundary spans, nulls, partitioning-invariant") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c"),                       // 3 tokens, start 0
      (1L, null.asInstanceOf[String]),     // 0 tokens, start 3
      (2L, "d e f g"),                     // 4 tokens, start 3 — spans the maxLen=5 boundary
      (3L, "h"),                           // 1 token, start 7
      (4L, "i j k l m n"),                 // 6 tokens, start 8 — longer than maxLen itself
      (5L, "o"),                           // start 14
    ).toDF("doc_id", "text")
    def rows(np: Int) = Curation.packSequences(docs, maxLen = 5, numPartitions = np)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = rows(3)
    assert(got == Map(
      0L -> ((3L, 0L, 0L)),
      1L -> ((0L, 0L, 3L)), // null text: zero tokens, still positioned
      2L -> ((4L, 0L, 3L)), // starts in seq 0, spills into seq 1
      3L -> ((1L, 1L, 2L)),
      4L -> ((6L, 1L, 3L)), // longer than maxLen: starts at (1, 3)
      5L -> ((1L, 2L, 4L)),
    ), got.toString)
    // the two-level cumsum must be partitioning-invariant: 1 partition
    // (degenerate, pure local cumsum) == many partitions (offsets do the
    // work) == more partitions than rows (empty partitions contribute 0)
    assert(rows(1) == got && rows(16) == got)
  }

  test("chunkDocs: window starts/lengths, overlap, trailing short chunk, hash content") {
    val s = spark
    import s.implicits._
    val words = (0 until 11).map(i => s"w$i")
    val docs = Seq(
      (0L, words.mkString(" ")),        // 11 tokens, size 5 / stride 3 → starts 0,3,6,9
      (1L, "x y"),                      // shorter than one window → one chunk
      (2L, null.asInstanceOf[String]),  // no rows
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocs(docs, size = 5, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    def h(ws: Seq[String]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(ws.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L)))
    assert(got((0L, 0L)) == ((0L, 5L, h(words.slice(0, 5)))))
    assert(got((0L, 1L)) == ((3L, 5L, h(words.slice(3, 8)))))
    assert(got((0L, 2L)) == ((6L, 5L, h(words.slice(6, 11)))))
    assert(got((0L, 3L)) == ((9L, 2L, h(words.slice(9, 11))))) // trailing short chunk
    assert(got((1L, 0L)) == ((0L, 2L, h(Seq("x", "y")))))
    // coverage: the non-overlapping prefixes (stride tokens each, full tail
    // on the last chunk) reconstruct the token stream
    val starts = got.keys.filter(_._1 == 0L).toSeq.sortBy(_._2).map(k => got(k)._1)
    assert(starts == Seq(0L, 3L, 6L, 9L))
  }

  test("tokenBudgetSample: inclusive prefix in hash order, never overshoots, partitioning-invariant") {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L).map { i =>
      (i, if (i % 7 == 3) null else (0 until (1 + (i % 5)).toInt).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    def md5hex(x: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // reference: cumulative inclusive sum over (md5(id), id) order
    val ordered = (0L until 40L).sortBy(i => (md5hex(i.toString), i))
    val toks = (0L until 40L).map(i => i -> (if (i % 7 == 3) 0L else 1 + (i % 5))).toMap
    var cum = 0L
    val expect = scala.collection.mutable.Map[Long, (Long, Long)]()
    ordered.foreach { i => cum += toks(i); if (cum <= 37) expect(i) = (toks(i), cum) }
    def run(np: Int) = Curation.tokenBudgetSample(docs, budget = 37, numPartitions = np)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = run(4)
    assert(got == expect.toMap)
    assert(got.values.map(_._1).sum <= 37, "inclusive prefix must never overshoot")
    assert(run(1) == got && run(16) == got)
    // degenerate budgets
    assert(Curation.tokenBudgetSample(docs, budget = 0).count() ==
      expectZeroTokenPrefix(ordered, toks))
  }

  private def expectZeroTokenPrefix(ordered: Seq[Long], toks: Map[Long, Long]): Long = {
    // budget 0 keeps exactly the leading zero-token docs of the hash order
    var n = 0L
    val it = ordered.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val i = it.next()
      if (toks(i) == 0L) n += 1 else stop = true
    }
    n
  }

  test("pplBuckets: tercile ordering per source, null source bucketed, partition thirds") {
    val s = spark
    import s.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rows = (0 until 90).map { i =>
      val src = if (i % 10 == 9) null else s"s${i % 3}"
      val n = 6 + (i * 7) % 17
      val words = (0 until n).map(j => vocab((i * 13 + j * 5) % vocab.size))
      (i.toLong, words.mkString(" "), src)
    }
    val got = Curation.pplBuckets(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3)))
    assert(got.length == rows.length, "every doc (null source included) is bucketed")
    // per source: every tail score <= every middle score <= every head score
    got.groupBy(_._2).foreach { case (src, docs) =>
      val by = docs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      for (t <- by.get("tail"); m <- by.get("middle"))
        assert(t.max <= m.min, s"source $src: tail above middle")
      for (m <- by.get("middle"); h <- by.get("head"))
        assert(m.max <= h.min, s"source $src: middle above head")
      // discrete terciles: tail holds at least a third minus ties' slack
      val n = docs.size
      by.get("tail").foreach(t => assert(t.size * 3 >= n - 2 * 3, s"source $src tail too small"))
    }
    assert(got.exists(_._2.isEmpty), "fixture must exercise the null source")
  }

  test("corpusDiff: all four statuses, null-text flips read as changes") {
    val s = spark
    import s.implicits._
    val v1 = Seq(
      (1L, "same text"),
      (2L, "old text"),
      (3L, "gone"),
      (4L, null.asInstanceOf[String]),
      (5L, "becomes null"),
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "same text"),                  // unchanged
      (2L, "new text"),                   // changed
      (4L, null.asInstanceOf[String]),    // unchanged (null == null fingerprint)
      (5L, null.asInstanceOf[String]),    // changed (text -> null)
      (6L, "fresh"),                      // added
    ).toDF("doc_id", "text")
    val got = Curation.corpusDiff(v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("dsirWeights/dsirScore: smoothed ratios, neutral missing buckets, kernel parity") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta delta"),
      (2L, "epsilon zeta eta"),
      (3L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" < 2) // alpha/beta-heavy target
    val w = Curation.dsirWeights(raw, target, d = 64, scale = 1000L)
    val rows = w.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    // every weight is the integer smoothed ratio
    rows.foreach { case (b, (nt, nr, wt)) =>
      assert(wt == (nt + 1) * 1000L / (nr + 1), s"bucket $b")
      assert(nt <= nr, s"target is a subset of raw: bucket $b")
    }
    // target-only grams are over-weighted, raw-only grams under-weighted
    assert(rows.exists { case (_, (nt, nr, wt)) => nt > 0 && wt > 1000L / (nr + 1) })
    assert(rows.exists { case (_, (nt, _, wt)) => nt == 0 && wt < 1000L })
    // dsirScore parity with the per-row kernel using the SAME weight map
    val wm = rows.map { case (b, (_, _, wt)) => b -> wt }.toMap
    val scored = Curation.dsirScore(raw, w, d = 64, scale = 1000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val texts = Seq(0L -> "alpha beta gamma", 1L -> "alpha beta delta", 2L -> "epsilon zeta eta")
    texts.foreach { case (id, t) =>
      val expect = Curation.linearScoreJvm(t, 64, b => wm.getOrElse(b, 1000L))
      assert(scored(id) == expect, s"doc $id")
    }
    assert(!scored.contains(3L), "null text emits no score row")
    // deterministic under repartitioning
    val w2 = Curation.dsirWeights(raw.repartition(5), target.repartition(3), d = 64, scale = 1000L)
    assert(w2.orderBy("bucket").collect().toSeq == w.orderBy("bucket").collect().toSeq)
  }

  test("linearScore: unigram+bigram feature counts, pluggable weights, edge docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c"),                   // 3 unigrams + 2 bigrams = 5 grams
      (2L, "solo"),                    // 1 gram, no bigrams
      (3L, ""),                        // one empty unigram
      (4L, null.asInstanceOf[String]), // dropped
    ).toDF("doc_id", "text")
    // weightOf = const 1 turns score into a gram count — pins the gram
    // construction independently of the hash/weight formula (which the
    // DuckDB oracle pins end-to-end)
    val got = Curation.linearScore(docs, weightOf = _ => 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 5L, 5L), (2L, 1L, 1L), (3L, 1L, 1L)))
    // default weights are bounded by construction: |score| <= 500 * n_grams
    val bad = Curation.linearScore(docs)
      .filter(org.apache.spark.sql.functions.abs($"score") > $"n_grams" * 500L).count()
    assert(bad == 0)
  }

  test("packTokens materializes the exact concatenated id stream in fixed chunks") {
    val s = spark
    import s.implicits._
    // vocab: a=1, b=2, cc=3; 'z' is OOV (0)
    val vocab = Seq("a", "b", "cc")
    val docs = Seq(
      (0L, "a b cc"),                  // ids 1 2 3      (3 tokens, start 0)
      (1L, null.asInstanceOf[String]), // zero-width     (start 3)
      (2L, "z a"),                     // ids 0 1        (start 3 — spans the maxLen=4 boundary)
      (3L, "b b cc"),                  // ids 2 2 3      (start 5)
    ).toDF("doc_id", "text")
    val got = Curation.packTokens(docs, maxLen = 4, vocab = vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // stream: 1 2 3 | 0 1 | 2 2 3 → chunks [1,2,3,0], [1,2,2,3]
    assert(got == Set((0L, 4L, "1,2,3,0"), (1L, 4L, "1,2,2,3")))
    // the final partial chunk is emitted as-is
    val got2 = Curation.packTokens(docs.filter($"doc_id" <= 2), maxLen = 4, vocab = vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got2 == Set((0L, 4L, "1,2,3,0"), (1L, 1L, "1")))
    // partitioning-invariant like the offset face
    val many = Curation.packTokens(docs, maxLen = 4, vocab = vocab, numPartitions = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(many == got)
  }

  test("passageDupStats counts exactly the chunks shared across docs") {
    val s = spark
    import s.implicits._
    val bp = Dedup.boilerplate(0, 4) // "p0w0 p0w1 p0w2 p0w3"
    val docs = Seq(
      (1L, s"$bp alpha beta gamma delta unique one two three"), // bp + 2 own chunks
      (2L, s"$bp alpha beta gamma delta other words here now"), // shares bp AND chunk 2
      (3L, "totally different content with no shared passages at all ok"), // 3 chunks, unique
      (4L, "short"),                                            // 1 partial chunk, unique
      (5L, null.asInstanceOf[String]),                          // dropped
    ).toDF("doc_id", "text")
    val got = Dedup.passageDupStats(docs, w = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((3L, 2L)), // [bp, "alpha beta gamma delta", "unique one two three"] — first two shared
      2L -> ((3L, 2L)),
      3L -> ((3L, 0L)),
      4L -> ((1L, 0L)),
    ), got.toString)
  }

  test("ContaminationProbe: reusable across plans, release() frees the broadcast") {
    val s = spark
    import s.implicits._
    val bloom = Curation.contaminationBloom(
      Seq("one two three four five six").toDF("text"), k = 5)
    val probe = Curation.contaminationProbe(spark, bloom)
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "totally clean words only here"),
    ).toDF("doc_id", "text")
    def hits(): Set[Long] = docs
      .filter(probe(graft.functions.ShingleHash64(col("text"), 5)))
      .collect().map(_.getLong(0)).toSet
    // one probe, two independent query plans — the long-lived-service shape
    assert(hits() == Set(1L))
    assert(hits() == Set(1L))
    probe.release()
    // the broadcast is gone: a NEW plan referencing the released probe must
    // fail rather than silently return wrong membership
    intercept[Exception](hits())
  }

  // ---- repetitionSignals ------------------------------------------------

  test("repetitionSignals matches hand-computed rows incl. degenerate text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a a a b"),       // 4 words, 2 distinct; grams: "a a a","a a b" (2, distinct 2); top a=3
      (2L, "x y"),           // sub-3: grams = ["x y"]; top 1
      (3L, ""),              // words = [""], grams = [""]
      (4L, "   "),           // trim → same as empty
      (5L, "w w w w"),       // grams "w w w" ×2 → n_grams 2, distinct 1
      (6L, null.asInstanceOf[String]), // dropped
    ).toDF("doc_id", "text")
    val got = Curation.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val expected = Map(
      1L -> ((4L, 2L, 2L, 2L, 3L)),
      2L -> ((2L, 2L, 1L, 1L, 1L)),
      3L -> ((1L, 1L, 1L, 1L, 1L)),
      4L -> ((1L, 1L, 1L, 1L, 1L)),
      5L -> ((4L, 1L, 2L, 1L, 4L)),
    )
    assert(got == expected, s"got $got")
  }

  // ---- piiScan ----------------------------------------------------------

  test("piiScan counts all three pattern families and the redaction size") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", "contact bob@example.com or 10.0.0.1 x42"),
      ("a", null.asInstanceOf[String]), // → "" : zero hits but still a row
      ("b", "no digits here"),
      ("b", "ids 123 456 and jane.doe+x@sub.domain.org"),
      ("c", "256.1.2.3 is still ipv4-shaped; 1.2.3.4.5 matches once"),
    ).toDF("event_type", "props")
    val got = Curation.piiScan(rows, "props", "event_type").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // hand-computed: (n_rows, n_number_hits, n_with_number, n_email_hits, n_ip_hits, n_chars_redacted)
    // "a" row1: runs 10,0,0,1,42 → 5 (email local-part digits none); red: (2-1)+(1-1)+(1-1)+(1-1)+(2-1)=2
    //   NOTE the email/ip text contributes runs too? "bob@example.com" no digits; ok.
    // "b" row2: runs 123,456 → 2; red (3-1)+(3-1)=4; email 1
    // "c": runs 256,1,2,3, the 4 in "ipv4", 1,2,3,4,5 → 10; red (3-1)+0*9=2;
    //   ip: "256.1.2.3" matches ([0-9]{1,3} allows 256) and "1.2.3.4.5" —
    //   regex finds "1.2.3.4" then continues after it → ".5" no further match → 1. Total 2.
    val expected = Map(
      "a" -> ((2L, 5L, 1L, 1L, 1L, 2L)),
      "b" -> ((2L, 2L, 1L, 1L, 0L, 4L)),
      "c" -> ((1L, 10L, 1L, 0L, 2L, 2L)),
    )
    assert(got == expected, s"got $got")
  }

  // ---- piiRedact + withSyntheticPii --------------------------------------

  test("piiRedact applies email, then IP, then number runs — no re-matching inside placeholders") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "mail user42@ex3.org from 10.1.0.2 ref 99"),
      (2L, null.asInstanceOf[String]), // null → "" → unchanged empty
      (3L, "plain text only"),
      (4L, "42@ not an email, 1.2.3.4.5 one ip then 5"),
    ).toDF("doc_id", "text")
    val got = Curation.piiRedact(rows, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // digits INSIDE the matched email/IP (42, 3, 10.1.0.2) must come out as
    // the placeholder, not as '#' — order of application is observable here
    val expected = Map(
      1L -> "mail <EMAIL> from <IP> ref #",
      2L -> "",
      3L -> "plain text only",
      4L -> "#@ not an email, <IP>.# one ip then #",
    )
    assert(got == expected, s"got $got")
  }

  test("withSyntheticPii: every 3rd doc gains an email, every 5th an IP, all a number run") {
    val s = spark
    import s.implicits._
    val docs = (0L until 30L).map(id => (id, s"text$id", "s")).toDF("doc_id", "text", "source")
    val got = Curation.withSyntheticPii(docs)
      .select("doc_id", "pii_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 30)
    got.foreach { case (id, t) =>
      assert(t.contains(s"@ex${id % 7}.org") == (id % 3 == 0), s"$id: $t")
      assert(t.contains(s" from 10.${id % 256}.0.${id % 100}") == (id % 5 == 0), s"$id: $t")
      assert(t.endsWith(s" ref $id"), s"$id: $t")
      assert(t.startsWith(s"text$id"), s"$id: $t")
    }
    // and the scan over it sees all three families
    val scan = Curation.piiScan(Curation.withSyntheticPii(docs), "pii_text", "source")
      .collect().head
    assert(scan.getAs[Long]("n_email_hits") == 10 && scan.getAs[Long]("n_ip_hits") == 6 &&
      scan.getAs[Long]("n_number_hits") > 0)
  }

  // ---- capPerSource -----------------------------------------------------

  test("capPerSource is deterministic under repartitioning and hash-tie-broken by id") {
    val s = spark
    import s.implicits._
    val docs = (0L until 97L).map(id => (id, s"src${id % 3}")).toDF("doc_id", "source")
    def kept(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Int)]] =
      Curation.capPerSource(df, cap = 5).collect()
        .map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._2).toSeq).toMap
    val a = kept(docs)
    val b = kept(docs.repartition(7))
    assert(a == b, "cap selection must not depend on physical partitioning")
    // independent reference: per source, ids ordered by (md5(id), id), first 5
    val expected = (0L until 97L).groupBy(id => s"src${id % 3}").view.mapValues { ids =>
      ids.toSeq.sortBy(id => (md5Hex(id.toString), id)).take(5).zipWithIndex
        .map { case (id, i) => (id, i + 1) }
    }.toMap
    assert(a == expected, s"got $a\nexpected $expected")
  }

  test("capPerSource preReduce ≡ plain on a skewed, repartitioned fixture") {
    val s = spark
    import s.implicits._
    // realistic skew: one source holds 60% of the corpus, spread across
    // many physical partitions (the 100 TB shape preReduce exists for);
    // the rest split over 20 small sources
    val n = 5000L
    val docs = (0L until n).map { id =>
      val src = if (id < n * 6 / 10) "dominant" else s"src${id % 20}"
      (id, src)
    }.toDF("doc_id", "source").repartition(32)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val plain = rows(Curation.capPerSource(docs, cap = 7))
    val pre = rows(Curation.capPerSource(docs, cap = 7, preReduce = true))
    assert(pre == plain,
      "preReduce two-level cap must select exactly the plain window's rows")
    // and both match the independent reference on the skewed fixture
    val expected = (0L until n).groupBy(id =>
      if (id < n * 6 / 10) "dominant" else s"src${id % 20}")
      .flatMap { case (src, ids) =>
        ids.toSeq.sortBy(id => (md5Hex(id.toString), id)).take(7).zipWithIndex
          .map { case (id, i) => (id, src, i + 1) }
      }.toSet
    assert(plain == expected)
    // stability across a different physical layout (preReduce stage 1 keys
    // on spark_partition_id — the FINAL result must not)
    val pre2 = rows(Curation.capPerSource(docs.repartition(5), cap = 7, preReduce = true))
    assert(pre2 == plain, "preReduce result must be layout-independent")
  }

  // ---- shuffleSample ----------------------------------------------------

  test("shuffleSample ranks by (md5, id) stably across partitionings; n > corpus keeps all") {
    val s = spark
    import s.implicits._
    val docs = (0L until 61L).map(id => (id, s"t$id")).toDF("doc_id", "text")
    def sample(df: org.apache.spark.sql.DataFrame, n: Int): Seq[(Long, Long)] =
      Curation.shuffleSample(df, n).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val a = sample(docs, 10)
    val b = sample(docs.repartition(5), 10)
    assert(a == b, "sample must not depend on physical partitioning")
    val expected = (0L until 61L).sortBy(id => (md5Hex(id.toString), id)).take(10)
      .zipWithIndex.map { case (id, i) => ((i + 1).toLong, id) }
    assert(a == expected, s"got $a\nexpected $expected")
    // n beyond the corpus: every doc appears exactly once, ranks 1..61
    val all = sample(docs, 1000)
    assert(all.map(_._1) == (1L to 61L) &&
      all.map(_._2).toSet == (0L until 61L).toSet)
  }

  test("lmScore matches a pure-Scala bigram-LM mirror incl. OOV, short and null text") {
    val s = spark
    import s.implicits._
    def bkt(id: Long): Long =
      java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 4), 16) % 100
    // ids spanning both sides of the 90-bucket LM boundary, texts sharing
    // bigrams across the boundary plus every degenerate shape
    val ids = (0L until 300L).toVector
    val lmIds = ids.filter(bkt(_) >= 90)
    val applyIds = ids.filter(bkt(_) < 90)
    assert(lmIds.size >= 10 && applyIds.size >= 10, "fixture needs both buckets")
    val vocab = Vector("the", "cat", "sat", "on", "mat", "dog", "ran")
    val rnd = new scala.util.Random(13)
    def sentence(): String =
      Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts: Map[Long, String] = ids.map { id =>
      id -> (id % 17 match {
        case 0 => null                       // null text → (0,0,0)
        case 1 => "solo"                     // sub-2-word: whole text is the "bigram"
        case 2 => ""                         // empty string, same path
        case 3 => "zzz qqq zzz qqq zzz"      // likely-OOV unless an LM doc draws it
        case _ => sentence()
      })
    }.toMap
    val docs = ids.map(id => (id, texts(id))).toDF("doc_id", "text")

    // pure-Scala mirror, shared-code-free: LM = bigram occurrence counts
    // over the >=90-bucket docs; ll uses the bit length of the LM count
    val lmCounts: Map[String, Long] = lmIds
      .flatMap(id => Option(texts(id)).toSeq.flatMap(t => shingles(t, 2)))
      .groupBy(identity).map { case (bg, os) => bg -> os.size.toLong }
    def expected(id: Long): (Long, Long, Long) = Option(texts(id)) match {
      case None => (0L, 0L, 0L)
      case Some(t) =>
        val bgs = shingles(t, 2)
        val oov = bgs.count(!lmCounts.contains(_)).toLong
        val ll = bgs.flatMap(lmCounts.get)
          .map(n => (64 - java.lang.Long.numberOfLeadingZeros(n)).toLong).sum
        (bgs.size.toLong, oov, ll)
    }
    val got = Curation.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == ids.toSet, "every doc scores, including null text")
    for (id <- ids)
      assert(got(id) == expected(id), s"doc $id: got ${got(id)} want ${expected(id)}")
    // the fixture must actually exercise both evidence classes
    assert(got.values.exists(_._2 > 0), "no OOV mass in fixture")
    assert(got.values.exists(v => v._3 > 0), "no in-LM mass in fixture")
  }

  test("shardAssign: dense per-shard ranks in (md5, id) order, partitioning-invariant") {
    val s = spark
    import s.implicits._
    val nShards = 4
    val ids = (0L until 157L).toVector
    val docs = ids.map(id => (id, s"t$id")).toDF("doc_id", "text")
    def shardOf(id: Long): Int =
      (java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 4), 16) % nShards).toInt
    // naive mirror: per-shard rank under (md5 hex, id) order
    val expected: Map[Long, (Int, Long)] = ids.groupBy(shardOf).flatMap {
      case (sh, members) =>
        members.sortBy(id => (md5Hex(id.toString), id)).zipWithIndex
          .map { case (id, i) => id -> ((sh, i.toLong)) }
    }
    def run(np: Int): Map[Long, (Int, Long)] =
      Curation.shardAssign(docs, nShards, numPartitions = np).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val got = run(3)
    assert(got == expected, s"two-level rank disagrees with the naive window\n$got")
    // invariance: degenerate single partition == many == more than rows
    assert(run(1) == got && run(16) == got && run(200) == got)
    // dense positions 0..n-1 within every shard (no gaps, no dupes)
    got.toSeq.groupBy(_._2._1).foreach { case (sh, rows) =>
      val ps = rows.map(_._2._2).sorted
      assert(ps == (0L until ps.size.toLong), s"shard $sh positions not dense: $ps")
    }
  }

  test("capPerSourceSqrt: sub-linear quotas, null source kept, preReduce ≡ plain") {
    val s = spark
    import s.implicits._
    // skewed sources: big=100 docs (cap 3·10=30), small=9 (cap 3·3=9, all
    // kept), tiny=2 (cap 3·1=3 > n, all kept), plus TWO null-source docs
    // (cap 3·⌊√2⌋=3 — a null group, not dropped rows)
    val rows: Seq[(Long, String)] =
      (0L until 100L).map(i => (i, "big")) ++
        (100L until 109L).map(i => (i, "small")) ++
        Seq((200L, "tiny"), (201L, "tiny"), (300L, null), (301L, null))
    val docs = rows.toDF("doc_id", "source")
    def run(pre: Boolean) =
      Curation.capPerSourceSqrt(docs.repartition(5), c = 3, preReduce = pre).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("∅"), r.getInt(2))).toSet
    val got = run(pre = false)
    // pure-Scala mirror: per-source (md5, id) order, cap 3·floor(sqrt(n))
    val expected = rows.groupBy(_._2).flatMap { case (src, members) =>
      val cap = 3 * math.floor(math.sqrt(members.size.toDouble)).toLong
      members.map(_._1).sortBy(id => (md5Hex(id.toString), id)).take(cap.toInt)
        .zipWithIndex.map { case (id, i) => (id, Option(src).getOrElse("∅"), i + 1) }
    }.toSet
    assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")
    assert(got.count(_._2 == "big") == 30 && got.count(_._2 == "small") == 9 &&
      got.count(_._2 == "tiny") == 2 && got.count(_._2 == "∅") == 2)
    assert(run(pre = true) == got, "preReduce staging must not change the result")
  }

  test("urlDomainStats: extraction edges (case, path, multiples, none, null)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "see http://A.Example.com/x and https://a.example.com no path"),
      (2L, "dup http://a.example.com/y http://a.example.com/y"), // same doc twice
      (3L, "plain text, no urls at all"),
      (4L, null.asInstanceOf[String]),
      (5L, "ftp://not.matched.org and httpx://also.not https://b.org/p_1/q-2"),
      // sentence-final periods must NOT join the domain (no phantom
      // "b.org." group splitting the provenance counts)
      (6L, "end http://b.org. Twice http://b.org."),
    ).toDF("doc_id", "url_text")
    val got = Curation.urlDomainStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // hosts lowercased; doc 1 cites a.example.com twice (n_urls 2, n_docs 1);
    // doc 2 adds 2 more urls as one more distinct doc; non-http schemes
    // skipped; doc 6's two sentence-terminal cites fold into b.org
    assert(got == Map(
      "a.example.com" -> ((4L, 2L)),
      "b.org" -> ((3L, 2L)),
    ), got.toString)
    // the synthetic fixture column drives every 3rd/5th doc non-vacuously
    val syn = Curation.urlDomainStats(
      Curation.withSyntheticUrls(Seq((3L, "t"), (5L, null.asInstanceOf[String]), (7L, "u"))
        .toDF("doc_id", "text"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(syn == Map(
      "site3.example.com" -> ((1L, 1L)),   // doc 3: id%7=3
      "cdn.example.org" -> ((1L, 1L)),     // doc 5 (null text still gains its URL)
    ), syn.toString)
  }
}
