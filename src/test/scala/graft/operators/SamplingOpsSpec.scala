package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The round-15 sampling/selection faces vs straight-line pure-Scala
  * references (the CurationSpec discipline): exact stratified split,
  * vocabulary drift, α=1/2 temperature language balancing, and the
  * Jaccard-threshold dedup curve. Fixtures exercise the degenerate shapes
  * the sf corpora never produce — skewed strata, null text/lang, perfect
  * squares and ±1 sqrt edges, empty pair frames.
  */
class SamplingOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("sampling-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  // ---- stratifiedSplit ---------------------------------------------------

  test("stratifiedSplit: exact per-stratum counts, hash-rank order, repartition-stable") {
    val s = spark
    import s.implicits._
    // skewed strata: 23 / 7 / 3 / 1 docs, plus a null-source doc
    val rows = (0L until 23L).map(i => (i, Option("big"))) ++
      (23L until 30L).map(i => (i, Option("mid"))) ++
      (30L until 33L).map(i => (i, Option("small"))) ++
      Seq((33L, Option("solo")), (34L, Option.empty[String]))
    val docs = rows.toDF("doc_id", "source")

    // pure-Scala mirror: rank by (md5(id), id) within coalesced stratum
    val expected = rows
      .groupBy(_._2.getOrElse(""))
      .flatMap { case (st, rs) =>
        val ordered = rs.map(_._1).sortBy(id => (md5Hex(id.toString), id))
        val n = ordered.size.toLong
        val testN = n * 250 / 1000
        val validN = n * 125 / 1000
        ordered.zipWithIndex.map { case (id, r) =>
          val split =
            if (r < testN) "test" else if (r < testN + validN) "valid" else "train"
          (id, st, r.toLong, split)
        }
      }
      .toSet

    for (parts <- Seq(1, 7)) {
      val got = Curation
        .stratifiedSplit(docs.repartition(parts), testPm = 250, validPm = 125)
        .as[(Long, String, Long, String)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // exact proportions: big (23 docs) gives exactly 5 test / 2 valid
    val big = expected.filter(_._2 == "big")
    assert(big.count(_._4 == "test") == 5 && big.count(_._4 == "valid") == 2)
    // a single-doc stratum never loses its doc to eval at these rates
    assert(expected.filter(_._2 == "solo").head._4 == "train")
  }

  test("stratifiedSplit: bounds validated, zero rates put everything in train") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Curation.stratifiedSplit(docs, testPm = 600, validPm = 500)
    }
    val all = Curation.stratifiedSplit(docs, testPm = 0, validPm = 0)
      .select("split").as[String].collect()
    assert(all.forall(_ == "train"))
  }

  // ---- vocabDrift ----------------------------------------------------------

  test("vocabDrift: exact deltas, |delta| DESC + term ASC cut, null text ignored") {
    val s = spark
    import s.implicits._
    val v1 = Seq(
      (1L, "a a a b c"),
      (2L, "b c d"),
      (3L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "a b c zz zz zz zz"),
      (2L, "c d e"),
    ).toDF("doc_id", "text")
    // counts v1: a=3 b=2 c=2 d=1 ; v2: a=1 b=1 c=2 d=1 e=1 zz=4
    // deltas: zz=+4, a=-2, b=-1, e=+1 (c,d unchanged → excluded)
    val got = Curation.vocabDrift(v1, v2, k = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("zz", 0L, 4L, 4L), ("a", 3L, 1L, -2L), ("b", 2L, 1L, -1L)))
    // k larger than the drift set returns the whole set
    val all = Curation.vocabDrift(v1, v2, k = 100)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(all.map(_._1) == Seq("zz", "a", "b", "e"))
  }

  // ---- langBalance ---------------------------------------------------------

  test("langBalance: isqrt exact on square/±1 edges, allocations sum to budget") {
    val s = spark
    import s.implicits._
    // token counts per lang: en=16 (square), fr=15 (sq-1), de=17 (sq+1),
    // xx=0 (empty text), plus a null-lang doc
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, Option("en"), words(16)),
      (2L, Option("fr"), words(15)),
      (3L, Option("de"), words(17)),
      (4L, Option("xx"), null.asInstanceOf[String]),
      (5L, Option.empty[String], words(9)),
    ).toDF("doc_id", "lang", "text")
    val got = Curation.langBalance(docs, budget = 100L)
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val byLang = got.map(r => r._1 -> r).toMap
    // quotas: isqrt(16)=4, isqrt(15)=3, isqrt(17)=4, isqrt(0)=0, isqrt(9)=3
    assert(byLang("en")._4 == 4 && byLang("fr")._4 == 3 && byLang("de")._4 == 4)
    assert(byLang("xx")._4 == 0 && byLang("")._4 == 3)
    // largest remainder: totq=14, floors = 100*q/14 → 28,21,28,0,21 (sum 98);
    // remainders 100*q%14 → en 400%14=8, fr 300%14=6, de 8, ''(9 tokens) 6;
    // k=2 bonuses go to (rem DESC, lang ASC) = de, en
    assert(got.map(_._5).sum == 100L)
    assert(byLang("de")._5 == 29 && byLang("en")._5 == 29)
    assert(byLang("fr")._5 == 21 && byLang("")._5 == 21 && byLang("xx")._5 == 0)
  }

  test("langBalance: largest-remainder arithmetic exact where the naive product overflows") {
    val s = spark
    import s.implicits._
    // 1e13 tokens/lang, 1e15-token budget: quota ≈ 3.16e6, so the naive
    // quota·budget ≈ 3e21 wraps a long; the divide-first identity stays
    // within T·q_max ≈ 3e13. Expected allocations via a BigInt mirror.
    val toks = Seq("aa" -> 10000000000000L, "bb" -> 9999999999999L, "cc" -> 4000000000000L)
    val budget = 1000000000000000L
    val docs = toks.toDF("lang", "n").withColumn("doc_id", lit(1L))
    val got = Curation.langBalance(docs, budget, textCol = "n", countOf = c => c)
      .orderBy("lang").as[(String, Long, Long, Long, Long)].collect().toSeq
    def isqrt(n: Long): Long = {
      var q = math.floor(math.sqrt(n.toDouble)).toLong
      if (q * q > n) q -= 1 else if ((q + 1) * (q + 1) <= n) q += 1
      q
    }
    val quotas = toks.map { case (l, n) => l -> isqrt(n) }
    val t = quotas.map(_._2).sum
    val flr = quotas.map { case (l, q) => l -> (BigInt(q) * budget / t).toLong }.toMap
    val remOrd = quotas
      .map { case (l, q) => (l, (BigInt(q) * budget % t).toLong) }
      .sortBy { case (l, r) => (-r, l) }.map(_._1)
    val k = budget - flr.values.sum
    val bonus = remOrd.take(k.toInt).toSet
    got.foreach { case (lang, _, _, quota, alloc) =>
      assert(quota == quotas.toMap.apply(lang), s"quota drift for $lang")
      assert(alloc == flr(lang) + (if (bonus(lang)) 1L else 0L), s"alloc wrong for $lang")
    }
    assert(got.map(_._5).sum == budget)
  }

  test("langBalance: isqrt correction survives large counts near square boundaries") {
    val s = spark
    import s.implicits._
    // (1L << 31)^2 and ±1 — the double-sqrt ulp zone a naive floor(sqrt)
    // misreads; emulate the per-lang agg by checking quota directly
    val big = 1L << 31
    val docs = Seq(
      ("sq", big * big), ("sqm1", big * big - 1), ("sqp1", big * big + 1),
    ).toDF("lang", "n")
    // feed pre-counted tokens via countOf = the n column itself
    val got = Curation.langBalance(
        docs.withColumn("doc_id", lit(1L)), budget = 0L,
        textCol = "n", countOf = c => c)
      .select("lang", "quota").as[(String, Long)].collect().toMap
    assert(got("sq") == big && got("sqm1") == big - 1 && got("sqp1") == big)
  }

  // ---- dedupThresholdCurve -------------------------------------------------

  test("dedupThresholdCurve: brute-force Jaccard curve, zero-filled clean corpus") {
    val s = spark
    import s.implicits._
    // word-shingle (k=3) sets engineered for a spread of exact Jaccards:
    // doc 0/1 identical (J=1), doc 2 shares most of doc 0 (high J),
    // doc 3 partial (mid J), doc 4 disjoint
    val texts = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "a b c d q r s t"),
      (4L, "m n o p q1 r1 s1 t1"),
    )
    val docs = texts.toDF("doc_id", "text")

    def shingleSet(t: String): Set[String] = {
      val ws = t.trim.split("\\s+", -1).toSeq
      if (ws.size < 3) Set(ws.mkString(" "))
      else (0 to ws.size - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = texts.map { case (id, t) => id -> shingleSet(t) }
    val thresholds = Seq((3, 10), (1, 2), (3, 5), (7, 10), (4, 5), (9, 10))
    val expected = thresholds.map { case (num, den) =>
      val qual = for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        ni = (sa & sb).size
        if ni * (den + num) >= (sa.size + sb.size) * num
      } yield (ia, ib)
      (num, den, qual.size.toLong, qual.map(_._2).distinct.size.toLong)
    }
    val got = MinHash.dedupThresholdCurve(docs)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(got == expected)
    // sanity: the fixture is non-vacuous at both ends of the curve
    assert(expected.head._3 > expected.last._3 && expected.last._3 >= 1)

    // disjoint corpus → all six rows present, zero-filled
    val clean = Seq((0L, "a b c d"), (1L, "e f g h")).toDF("doc_id", "text")
    val zeros = MinHash.dedupThresholdCurve(clean)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(zeros.map(r => (r._1, r._2)) == thresholds)
    assert(zeros.forall(r => r._3 == 0 && r._4 == 0))
  }

  // ---- sourceBudgetSample --------------------------------------------------

  test("sourceBudgetSample: per-source inclusive hash-order prefix, repartition-stable") {
    val s = spark
    import s.implicits._
    def words(n: Int): String = (0 until n).map(j => s"t$j").mkString(" ")
    val rows = (0L until 12L).map(i => (i, "big", words(3 + (i % 4).toInt))) ++
      Seq((20L, "tiny", words(2)), (21L, "tiny", null.asInstanceOf[String]),
        (22L, "none", words(5)))
    val quotas = Map("big" -> 20L, "tiny" -> 100L)
    // pure mirror: per source, (md5(id), id) order, inclusive cum <= quota
    val expected = rows
      .groupBy(_._2)
      .flatMap { case (src, rs) =>
        val q = quotas.getOrElse(src, 0L)
        var cum = 0L
        rs.sortBy(r => (md5Hex(r._1.toString), r._1)).flatMap { case (id, _, t) =>
          val n = if (t == null) 0L else t.trim.split("\\s+", -1).length.toLong
          cum += n
          if (cum <= q) Some((id, src, n, cum)) else None
        }
      }
      .toSet
    for (parts <- Seq(1, 5)) {
      val got = Curation
        .sourceBudgetSample(rows.toDF("doc_id", "source", "text").repartition(parts), quotas)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // the cut is real on "big" and vacuous on "tiny"; "none" drops entirely
    assert(expected.count(_._2 == "big") < 12 && expected.count(_._2 == "tiny") == 2)
    assert(!expected.exists(_._2 == "none"))
  }

  // ---- noveltyStats --------------------------------------------------------

  test("noveltyStats: brute-force distinct-shingle novelty incl. sub-k and null text") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "one two three four five six"), (2L, "sub k"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((10L, "one two three four five seven"), (11L, "sub k"),
      (12L, "all brand new shingle content here")).toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] = {
      val ws = t.trim.split("\\s+", -1).toSeq
      if (ws.size < 5) Set(ws.mkString(" "))
      else (0 to ws.size - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toSet
    }
    val g1 = Set("one two three four five six", "sub k").flatMap(shingleSet)
    val g2 = Set("one two three four five seven", "sub k",
      "all brand new shingle content here").flatMap(shingleSet)
    val (nAll, nSeen) = (g2.size.toLong, (g2 & g1).size.toLong)
    val got = Curation.noveltyStats(v1, v2, k = 5)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((nAll, nAll - nSeen, nSeen)))
    assert(nSeen >= 2 && nAll - nSeen >= 2) // both arms non-vacuous
  }

  // ---- urlDedup ------------------------------------------------------------

  test("urlDedup: first URL is the crawl address, min-id canonical, case-normalized") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "see http://a.example.com/x for details"),
      (2L, "also http://A.EXAMPLE.COM/x mirrored"),        // same address, host case-folded
      // (an UPPERCASE SCHEME would not extract at all — UrlRe is the
      // shared lowercase-scheme family of the established URL faces)
      (3L, "http://b.example.com/y then http://a.example.com/x"), // FIRST url wins → b
      (4L, "no links in this doc at all"),
      (5L, null.asInstanceOf[String]),
      (6L, "http://b.example.com/y again"),
    )
    val got = Curation.urlDedup(rows.toDF("doc_id", "url_text"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 3L))
  }

  // ---- deconReport ---------------------------------------------------------

  test("deconReport: per-benchmark contamination counts, zero-filled clean benchmark") {
    val s = spark
    import s.implicits._
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 4), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    // 4 real-split train ids (the operator's train side is split-gated)
    val trainIds = (0L until 300L).filter(splitOf(_) == "train").take(4)
    val trainTexts = Seq(
      "one two three four five six seven",   // overlaps bench_x doc
      "one two three four five zz",          // shares one 5-shingle with bench_x
      "alpha beta gamma delta epsilon zeta", // overlaps nothing
      null,
    )
    val rows = trainIds.zip(trainTexts).map { case (id, t) => (id, t) } ++ Seq(
      (1000L, "one two three four five six"),        // bench_x
      (1001L, "totally disjoint benchmark content"), // bench_x, no overlap
      (1002L, "clean benchmark nothing shared here"), // bench_y — stays zero
      (1003L, null.asInstanceOf[String]),             // bench_y null text
    )
    val benchOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      id => when(id >= 1002, "bench_y").when(id >= 1000, "bench_x")
    val got = Curation.deconReport(rows.toDF("doc_id", "text"), benchOf)
      .as[(String, Long, Long, Long)].collect().toSet
    // mirror: bench_x's 5-shingles = {"one two three four five",
    // "two three four five six"} (+ 1 disjoint doc); train doc 0 shares
    // both, train doc 1 shares the first → 2 contaminated docs, 2 shingles
    assert(got == Set(("bench_x", 2L, 2L, 2L), ("bench_y", 2L, 0L, 0L)))
  }

  // ---- packDocsGreedy ------------------------------------------------------

  test("packDocsGreedy: reset-cumsum mirror, oversize own-bin, repartition-stable") {
    val s = spark
    import s.implicits._
    def words(n: Int): String = (0 until n).map(j => s"w$j").mkString(" ")
    // token counts engineered around maxLen=10: fits, exact fit, overflow,
    // oversize (>maxLen), zero-token (null text) riders
    val rows = (0L until 40L).map { i =>
      val n = (i % 7) match {
        case 0 => 3; case 1 => 7; case 2 => 10; case 3 => 15
        case 4 => 1; case 5 => 0; case _ => 6
      }
      (i, if (n == 0) null else words(n.toInt))
    }
    def toks(t: String): Long =
      if (t == null) 0L else t.trim.split("\\s+", -1).length.toLong
    val nB = 4
    def bktOf(id: Long): Int =
      (java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 4), 16) % nB).toInt
    val expected = rows
      .groupBy(r => bktOf(r._1))
      .flatMap { case (bk, rs) =>
        var bin = 0L; var fill = 0L; var empty = true
        rs.sortBy(r => (md5Hex(r._1.toString), r._1)).map { case (id, t) =>
          val n = toks(t)
          if (empty || fill + n <= 10L) { fill += n; empty = false }
          else { bin += 1L; fill = n }
          (id, bk, bin, n, fill)
        }
      }
      .toSet
    for (parts <- Seq(1, 3, 13)) {
      val got = Curation
        .packDocsGreedy(rows.toDF("doc_id", "text").repartition(parts),
          maxLen = 10L, nBuckets = nB)
        .as[(Long, Int, Long, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // the fixture exercises both branches and the oversize arm
    val byBin = expected.groupBy(r => (r._2, r._3))
    assert(byBin.values.exists(_.size > 1), "no shared bin — fixture too coarse")
    assert(expected.exists(_._5 > 10L), "no oversize own-bin in fixture")
    // no bin exceeds maxLen except single-oversize-doc bins
    byBin.foreach { case (_, ds) =>
      val tot = ds.map(_._4).sum
      assert(tot <= 10L || ds.size == 1, s"overfull multi-doc bin: $ds")
    }
  }

  // ---- fuzz ----------------------------------------------------------------

  test("sampling fuzz: split/budget/balance/curve ≡ mirrors on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (iter <- 0 until 6) {
      val nSrc = 1 + rnd.nextInt(4)
      val ids = rnd.shuffle((0 until 200).toList).take(8 + rnd.nextInt(40)).map(_.toLong)
      val rows = ids.map { id =>
        val src = if (rnd.nextInt(10) == 0) null else s"s${rnd.nextInt(nSrc)}"
        val text =
          if (rnd.nextInt(10) == 0) null
          else Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        (id, src, text)
      }
      val docs = rows.toDF("doc_id", "source", "text")
      def toks(t: String): Long =
        if (t == null) 0L else t.trim.split("\\s+", -1).length.toLong
      def srcOf(r: (Long, String, String)): String = Option(r._2).getOrElse("")
      val hashOrd = (r: (Long, String, String)) => (md5Hex(r._1.toString), r._1)

      // stratifiedSplit under random per-mille rates
      val tpm = rnd.nextInt(400); val vpm = rnd.nextInt(1000 - tpm)
      val expSplit = rows.groupBy(srcOf).flatMap { case (st, rs) =>
        val ordered = rs.sortBy(hashOrd)
        val n = ordered.size.toLong
        val (tn, vn) = (n * tpm / 1000, n * vpm / 1000)
        ordered.zipWithIndex.map { case (r, i) =>
          (r._1, st, i.toLong,
            if (i < tn) "test" else if (i < tn + vn) "valid" else "train")
        }
      }.toSet
      val gotSplit = Curation.stratifiedSplit(docs, tpm, vpm)
        .as[(Long, String, Long, String)].collect().toSet
      assert(gotSplit == expSplit, s"stratifiedSplit iter=$iter tpm=$tpm vpm=$vpm")

      // sourceBudgetSample under random (sometimes missing) quotas
      val quotas = (0 until nSrc).flatMap { i =>
        if (rnd.nextInt(4) == 0) None else Some(s"s$i" -> rnd.nextInt(40).toLong)
      }.toMap
      val expBudget = rows.groupBy(srcOf).flatMap { case (st, rs) =>
        val q = quotas.getOrElse(st, 0L)
        var cum = 0L
        rs.sortBy(hashOrd).flatMap { r =>
          cum += toks(r._3)
          if (cum <= q) Some((r._1, st, toks(r._3), cum)) else None
        }
      }.toSet
      val gotBudget = Curation.sourceBudgetSample(docs, quotas)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(gotBudget == expBudget, s"sourceBudgetSample iter=$iter quotas=$quotas")

      // langBalance on the source column: exact isqrt + exact-sum allocation
      val budget = rnd.nextInt(5000).toLong
      val gotBal = Curation.langBalance(docs, budget, langCol = "source")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      val tokBySrc = rows.groupBy(srcOf).view.mapValues(_.map(r => toks(r._3)).sum).toMap
      gotBal.foreach { case (lang, _, nTok, quota, _) =>
        assert(nTok == tokBySrc(lang), s"iter=$iter lang=$lang")
        assert(quota * quota <= nTok && (quota + 1) * (quota + 1) > nTok,
          s"isqrt wrong: iter=$iter lang=$lang n=$nTok q=$quota")
      }
      if (gotBal.map(_._4).sum > 0)
        assert(gotBal.map(_._5).sum == budget, s"alloc sum != budget iter=$iter")

      // threshold curve vs brute force (k=3 shingle sets, string mirror)
      def shingleSet(t: String): Set[String] = {
        val ws = t.trim.split("\\s+", -1).toSeq
        if (ws.size < 3) Set(ws.mkString(" "))
        else (0 to ws.size - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
      }
      val sets = rows.filter(_._3 != null).map(r => r._1 -> shingleSet(r._3))
      val ths = Seq((3, 10), (1, 2), (3, 5), (7, 10), (4, 5), (9, 10))
      val expCurve = ths.map { case (num, den) =>
        val qual = for {
          (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
          ni = (sa & sb).size
          if ni * (den + num) >= (sa.size + sb.size) * num
        } yield (ia, ib)
        (num, den, qual.size.toLong, qual.map(_._2).distinct.size.toLong)
      }
      val gotCurve = MinHash.dedupThresholdCurve(docs)
        .as[(Int, Int, Long, Long)].collect().toSeq
      assert(gotCurve == expCurve, s"dedupThresholdCurve iter=$iter")
    }
  }

  // ---- c_pipeline_release --------------------------------------------------

  test("c_pipeline_release equals the hand-chained component faces at sf0.01") {
    val s = spark
    import s.implicits._
    // sf0.01, not sf0.001: at the smaller scale the corpus has no
    // near-dups and fewer tokens than the 8000 budget, so the dedup and
    // quota stages would both be vacuous — the strictness asserts below
    // need every stage to bite
    val dir = "/root/testdata/sf0.01"
    val got = graft.SparkEntry.queries("c_pipeline_release")(s, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    // recompose from the component faces, step by step
    val docs = graft.Tables(s, dir, "documents")
    val train = docs.filter(TextAnalysis.splitName(col("doc_id")) === "train")
    val canon = MinHash.nearDupCanonicalMd5(train).select("doc_id", "canonical_id")
    val surv = train.join(canon, Seq("doc_id"))
      .filter(col("canonical_id") === col("doc_id")).drop("canonical_id")
    val quotas = Curation.langBalance(surv, budget = 8000L)
      .select("lang", "alloc").as[(String, Long)].collect().toMap
    val expected = Curation.sourceBudgetSample(surv, quotas, srcCol = "lang")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // every stage bites: admitted ⊂ survivors ⊂ train ⊂ docs, and per-lang
    // admitted tokens respect the quota
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    val survIds = surv.select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet.subsetOf(survIds) && survIds.subsetOf(trainIds))
    assert(got.nonEmpty && got.size < survIds.size && survIds.size < trainIds.size)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= quotas(lang), s"quota exceeded for $lang")
    }
  }

  // ---- qualityCalibration --------------------------------------------------

  test("qualityCalibration: tercile cut matches a pure-Scala histogram mirror") {
    val s = spark
    import s.implicits._
    // enough docs for three non-trivial terciles; interleave rule-passing
    // text (30 words, mean length ≥4, two stopwords, distinct) with
    // rule-failing text so n_pass discriminates across buckets
    val good =
      (0 until 27).map(j => s"alpha$j").mkString(" ") + " the value the"
    val rows = (0L until 30L).map { i =>
      val t = if (i % 3 == 0) good + s" extra$i" else s"short fail$i text"
      (i, t)
    }
    val docs = rows.toDF("doc_id", "text")
    // mirror: per-doc JVM score (independently specced kernel), discrete
    // histogram terciles, pass flags from the pinned rules face
    val scores = rows.map { case (id, t) =>
      id -> Curation.linearScoreJvm(t, 4096, Curation.defaultWeight)._2
    }.toMap
    val n = scores.size
    val sorted = scores.values.toSeq.sorted
    def thAt(mult: Int): Long =
      sorted.find(v => sorted.count(_ <= v) * 3 >= n * mult).get
    val (t33, t66) = (thAt(1), thAt(2))
    val pass = TextAnalysis.qualityRules(docs)
      .select(col("doc_id"), (col("ok_words") * col("ok_mean_len") *
        col("ok_stopwords") * col("ok_distinct") === 1).as("q"))
      .as[(Long, Boolean)].collect().toMap
    val expected = rows
      .map { case (id, _) =>
        val sc = scores(id)
        val b = if (sc <= t33) "tail" else if (sc <= t66) "middle" else "head"
        (b, pass(id))
      }
      .groupBy(_._1)
      .map { case (b, xs) => (b, xs.size.toLong, xs.count(_._2).toLong) }
      .toSet
    val got = Curation.qualityCalibration(docs)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.map(_._1) == Set("head", "middle", "tail"))
  }

  // ---- sourceOverlap -------------------------------------------------------

  test("sourceOverlap: brute-force distinct-shingle intersections, degenerate shapes") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Option("a"), "one two three four five six"),
      (2L, Option("a"), "unique alpha beta gamma delta words"),
      (3L, Option("b"), "one two three four five seven"),   // shares a 5-prefix run with src a
      (4L, Option("b"), "totally different content here now"),
      (5L, Option("c"), "one two three four five six"),     // exact dup of doc 1 → full overlap with a
      (6L, Option("c"), null.asInstanceOf[String]),          // null text ignored
      (7L, Option.empty[String], "one two three"),           // sub-k doc, null source → ""
      (8L, Option("d"), "nothing shared at all anywhere"),  // overlaps nobody → absent
    )
    val docs = rows.toDF("doc_id", "source", "text")
    def shingleSet(t: String): Set[String] = {
      val ws = t.trim.split("\\s+", -1).toSeq
      if (ws.size < 5) Set(ws.mkString(" "))
      else (0 to ws.size - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toSet
    }
    val bySrc = rows
      .filter(_._3 != null)
      .groupBy(_._2.getOrElse(""))
      .map { case (src, rs) => src -> rs.map(r => shingleSet(r._3)).reduce(_ ++ _) }
    val expected = (for {
      (sa, ga) <- bySrc; (sb, gb) <- bySrc if sa < sb
      shared = (ga & gb).size if shared > 0
    } yield (sa, sb, shared.toLong)).toSet
    val got = Curation.sourceOverlap(docs, k = 5)
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
    // the fixture exercises both a partial and a full overlap, and d is absent
    assert(expected.exists(_._3 >= 2) && !expected.exists(r => r._1 == "d" || r._2 == "d"))
  }
}
