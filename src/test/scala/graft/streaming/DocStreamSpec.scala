package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Streaming document-pipeline front-end: watermark-bounded exact dedup,
  * windowed quality aggregation, and batch-identical split routing.
  */
class DocStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("doc-stream-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("streaming dedup keeps the first arrival of each fingerprint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.dedupByFingerprint(docs)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((1L, ts(10), "alpha beta"), (2L, ts(11), "gamma delta"))
      query.processAllAvailable()
      // same text again (different id) + a new doc + TWO null-text docs
      // (null fingerprints must NOT dedup against each other)
      input.addData((3L, ts(12), "alpha beta"), (4L, ts(13), "epsilon zeta"),
        (5L, ts(14), null), (6L, ts(15), null))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L, 5L, 6L),
        s"duplicate text dropped, null-text docs all kept — got $ids")
      // null-text sentinels must be deterministic (id-derived, not random):
      // replay/retry re-evaluates the projection and a random sentinel would
      // re-fingerprint the same row differently across attempts
      val nullFps = spark.sql("SELECT doc_id, fp FROM dedup_out WHERE doc_id IN (5, 6)")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(nullFps == Map(5L -> "null:5", 6L -> "null:6"),
        s"sentinel fingerprints must derive from doc_id — got $nullFps")
    } finally query.stop()
  }

  test("dedupNearMinHash: multi-batch stream equals the batch LSH canonical on in-order arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // three near-dup clusters (exact dups + tail-perturbed variants),
    // distinct singletons, and a null-text doc — ids in event-time order
    val rows: Seq[(Long, Timestamp, String)] = Seq(
      (0L, ts(100), base),
      (1L, ts(101), "completely different content about spark catalyst optimizer rules"),
      (2L, ts(102), base),                   // exact dup of 0
      (3L, ts(103), base + " tail3"),        // near dup of 0
      (4L, ts(104), "another unrelated document with its very own words entirely"),
      (5L, ts(105), null),
      (6L, ts(106), base + " tail6"),        // near dup of 0
      (7L, ts(107), "completely different content about spark catalyst optimizer rules"),
      (8L, ts(108), "yet more unrelated text that shares nothing with the others"),
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.dedupNearMinHash(docs, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      input.addData(rows.slice(0, 3): _*)
      query.processAllAvailable()
      input.addData(rows.slice(3, 6): _*)
      query.processAllAvailable()
      input.addData(rows.slice(6, 9): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, canonical_id FROM neardup_out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.operators.MinHash
        .nearDupCanonical(rows.toDF("doc_id", "event_time", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        s"stream must equal batch on in-order arrival\nstream $streamed\nbatch  $batch")
      // non-vacuity: the equality must be exercised by real cross-batch
      // claims, not an all-self-canonical corpus
      assert(streamed(2L) == 0L && streamed(7L) == 1L, s"exact dups must fold: $streamed")
      assert(streamed.count { case (id, c) => c != id } >= 3, s"too few dups: $streamed")
      assert(streamed(5L) == 5L, "null-text doc must stay self-canonical")
    } finally query.stop()
  }

  test("streaming image dedup keeps first arrival per perceptual hash; undecodables all kept") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def png(seed: Long) = graft.operators.Multimodal.syntheticPng(seed, 16, 12)
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val docs = input.toDF().toDF("doc_id", "event_time", "blob")
    val query = DocStream.dedupByImageHash(docs)
      .writeStream.format("memory").queryName("imgdedup_out").outputMode("append").start()
    try {
      input.addData((1L, ts(10), png(7)), (2L, ts(11), png(9)))
      query.processAllAvailable()
      // same image again (different doc), a new image, and TWO
      // undecodable blobs — which must NOT dedup against each other
      input.addData((3L, ts(12), png(7)), (4L, ts(13), png(11)),
        (5L, ts(14), "junk".getBytes("UTF-8")), (6L, ts(15), null))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM imgdedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L, 5L, 6L),
        s"duplicate image dropped, undecodable blobs all kept — got $ids")
    } finally query.stop()
  }

  test("streaming audio dedup keeps first arrival per fingerprint; undecodables all kept") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def wav(seed: Long) = graft.operators.Audio.syntheticWav(seed)
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val docs = input.toDF().toDF("doc_id", "event_time", "blob")
    val query = DocStream.dedupByAudioFingerprint(docs)
      .writeStream.format("memory").queryName("audedup_out").outputMode("append").start()
    try {
      input.addData((1L, ts(10), wav(3)), (2L, ts(11), wav(4)))
      query.processAllAvailable()
      // same waveform again (different doc), a truncated blob and a junk
      // blob — undecodables must NOT dedup against each other
      input.addData((3L, ts(12), wav(3)),
        (4L, ts(13), wav(3).dropRight(100)), (5L, ts(14), "junk".getBytes("UTF-8")))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM audedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L, 5L),
        s"duplicate waveform dropped, undecodable blobs all kept — got $ids")
    } finally query.stop()
  }

  test("dedupNearMinHash fuzz: random corpora × random batch splits ≡ batch (in-order)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // randomized corpora of near-dup families + singletons + nulls, cut at
    // random micro-batch boundaries — the cross-batch bucket-state
    // accounting is the risky part of the face, and a fixed corpus only
    // exercises one path through it (the shape that found real bugs in
    // the trail-stream fuzz arm)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val families = (0 until 3).map(f =>
        (0 until 8).map(_ => s"fam$f word${rnd.nextInt(6)}").mkString(" "))
      val n = 24 + rnd.nextInt(12)
      val rows: Seq[(Long, Timestamp, String)] = (0 until n).map { i =>
        val text = rnd.nextInt(10) match {
          case 0 => null
          case 1 | 2 | 3 => families(rnd.nextInt(families.length)) + s" tail${rnd.nextInt(3)}"
          case 4 | 5 => families(rnd.nextInt(families.length))
          case _ => (0 until 10).map(_ => s"uniq${i}w${rnd.nextInt(9)}").mkString(" ")
        }
        (i.toLong, ts(1000 + i), text)
      }
      val input = MemoryStream[(Long, Timestamp, String)]
      val docs = input.toDF().toDF("doc_id", "event_time", "text")
      val sink = s"neardup_fuzz_$seed"
      val query = DocStream.dedupNearMinHash(docs, watermarkDelay = "2 hours")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        var off = 0
        while (off < n) {
          val take = 1 + rnd.nextInt(7)
          input.addData(rows.slice(off, off + take): _*)
          query.processAllAvailable()
          off += take
        }
        val streamed = spark.sql(s"SELECT doc_id, canonical_id FROM $sink")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val batch = graft.operators.MinHash
          .nearDupCanonical(rows.toDF("doc_id", "event_time", "text"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(streamed == batch,
          s"seed $seed: stream != batch\nstream $streamed\nbatch  $batch")
        // non-vacuity: every seed's corpus must actually fold some dups
        assert(streamed.count { case (id, c) => c != id } >= 3,
          s"seed $seed produced too few dups to be meaningful: $streamed")
      } finally query.stop()
    }
  }

  test("dedupNearMinHash: documented stream semantics — first ARRIVAL claims, cap is prospective") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "a stable piece of shared text used by every document in this test"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    // maxBucket = 3: the cap trips cheaply
    val query = DocStream.dedupNearMinHash(docs, watermarkDelay = "2 hours", maxBucket = 3)
      .writeStream.format("memory").queryName("neardup_sem").outputMode("append").start()
    try {
      // OUT-OF-ORDER arrival: the higher id arrives in an earlier batch.
      // Stream semantics: a bucket claims with its RUNNING MIN member id,
      // so the already-emitted row for id 7 keeps canonical 7 (streams
      // can't retract), while the later-arriving smaller id 2 becomes the
      // bucket's min and claims itself — the one-sided divergence from
      // the batch operator (which would fold 7 → 2 retroactively).
      input.addData((7L, ts(100), text))
      query.processAllAvailable()
      input.addData((2L, ts(101), text))
      query.processAllAvailable()
      // prospective hot-bucket cap: these two arrivals push every shared
      // bucket's running count past maxBucket=3 — from the batch where
      // the count crosses the cap onward, the bucket claims nothing
      input.addData((8L, ts(102), text))
      query.processAllAvailable()
      input.addData((9L, ts(103), text))
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_id, canonical_id FROM neardup_sem")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(7L) == 7L && got(2L) == 2L,
        s"running-min claim; earlier emissions are not retracted — got $got")
      // doc 8 is the bucket's 3rd member (count 3 ≤ cap): claimed by the
      // running min 2; doc 9 is the 4th (count 4 > cap): the bucket is
      // hot, claims nothing, doc 9 stays self-canonical
      assert(got(8L) == 2L, s"at-cap member folds to the running min — got $got")
      assert(got(9L) == 9L, s"past-cap member must be unclaimed — got $got")
    } finally query.stop()
  }

  test("dedupNearMinHash: bucket state evicts past the watermark horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "some shared boilerplate text that repeats across far apart arrivals exactly"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.dedupNearMinHash(docs, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_evict").outputMode("append").start()
    try {
      input.addData((0L, ts(1000), text))
      query.processAllAvailable()
      // far-future unrelated doc advances the watermark past 1000 + 10 min
      input.addData((1L, ts(1000 + 7200), "unrelated words one two three four five six"))
      query.processAllAvailable()
      // next trigger fires doc 0's bucket timeouts (expired groups are
      // evicted on a trigger where they receive no data)
      input.addData((2L, ts(1000 + 7260), "still unrelated filler text seven eight nine ten"))
      query.processAllAvailable()
      // same text as doc 0 — its buckets were evicted, so it re-claims them
      input.addData((3L, ts(1000 + 7320), text))
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_id, canonical_id FROM neardup_evict")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(3L) == 3L,
        s"doc 0's buckets must be forgotten past the horizon — got $got")
      assert(got(0L) == 0L && got(1L) == 1L && got(2L) == 2L, got.toString)
    } finally query.stop()
  }

  test("windowed quality stats emit once the watermark passes the window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.qualityByWindow(
      docs, windowDuration = "1 minute", watermarkDelay = "1 minute", minTokens = 3)
      .writeStream.format("memory").queryName("quality_out").outputMode("append").start()
    try {
      // window [0, 60): 2 docs, one passing the 3-token gate
      input.addData((1L, ts(10), "one two three four"), (2L, ts(20), "too short"))
      query.processAllAvailable()
      // advance the watermark well past the first window
      input.addData((3L, ts(300), "later doc entirely"))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT n_docs, n_tokens, n_quality FROM quality_out WHERE window_start = timestamp'1970-01-01 00:00:00'")
        .collect()
      assert(rows.length == 1, "first window must have closed exactly once")
      assert(rows.head.getLong(0) == 2 && rows.head.getLong(1) == 6 && rows.head.getLong(2) == 1)
    } finally query.stop()
  }

  test("streaming split routing matches the batch splitBucket exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.withSplit(docs, org.apache.spark.sql.functions.col("doc_id"))
      .writeStream.format("memory").queryName("split_out").outputMode("append").start()
    try {
      input.addData((0 until 50).map(i => (i.toLong, ts(i), s"doc $i")): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, split FROM split_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = (0 until 50).map(_.toLong).toDF("doc_id")
        .select($"doc_id", graft.operators.TextAnalysis.splitName($"doc_id").as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
    } finally query.stop()
  }

  test("qualityLinearFilter on a stream keeps exactly the batch score>=min rows; null text drops") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // inline corpus (the suite's self-contained convention): seeded word
    // soup so the default +-500 bucket weights score both signs
    val vocabWords = Array("table", "scan", "merge", "row", "value", "fast",
      "slow", "batch", "window", "key", "sort", "filter", "join", "agg")
    val rnd = new scala.util.Random(42)
    val corpus: Array[(Long, String)] = (0 until 80).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i.toLong, (0 until n).map(_ => vocabWords(rnd.nextInt(vocabWords.length))).mkString(" "))
    }.toArray
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.qualityLinearFilter(docs, minScore = 0L)
      .writeStream.format("memory").queryName("qlf_out").outputMode("append").start()
    try {
      input.addData(corpus.take(40).map { case (id, t) => (id, ts(id.toInt), t) }.toIndexedSeq)
      query.processAllAvailable()
      // a null-text row in a later batch must drop silently
      input.addData(Seq((9999L, ts(0), null.asInstanceOf[String])) ++
        corpus.drop(40).map { case (id, t) => (id, ts(id.toInt), t) })
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM qlf_out").collect().map(_.getLong(0)).toSet
      val batch = graft.operators.Curation
        .linearScore(corpus.toSeq.toDF("doc_id", "text"))
        .filter($"score" >= 0L).collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.size < corpus.length) // the gate bites both ways
    } finally query.stop()
  }

  test("sourceQuotaFilter: hash-order stream ≡ batch sourceBudgetSample; strict-prefix, bounded state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(n: Int): String = (0 until n).map(j => s"w$j").mkString(" ")
    // per-source token counts engineered so quota semantics all trigger:
    // src a (quota 10): docs fit 4+4, then a 5-token doc overshoots and
    //   CLOSES the budget — a later 2-token doc must NOT backfill
    // src b (quota 100): everything admitted (oversized quota)
    // src c: no quota entry → all dropped
    val rows = Seq(
      (1L, "a", words(4)), (2L, "a", words(4)), (3L, "a", words(5)), (4L, "a", words(2)),
      (5L, "b", words(7)), (6L, "b", words(3)),
      (7L, "c", words(6)),
    )
    val quotas = Map("a" -> 10L, "b" -> 100L)
    val batch = graft.operators.Curation
      .sourceBudgetSample(rows.toDF("doc_id", "source", "text"), quotas)
      .as[(Long, String, Long, Long)].collect().toSet

    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "source", "text")
    val query = DocStream.sourceQuotaFilter(docs, quotas)
      .writeStream.format("memory").queryName("quota_out").outputMode("append").start()
    try {
      // feed in the batch face's (md5(id), id) hash order, split across
      // three micro-batches — the equality the scaladoc promises
      def md5Hex(x: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      val ordered = rows.sortBy { case (id, _, _) => (md5Hex(id.toString), id) }
      ordered.grouped(3).foreach { g =>
        input.addData(g.map { case (id, src, t) => (id, ts(id), src, t) })
        query.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM quota_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
      // semantics bite: src a admits a strict prefix (not all four docs),
      // src b admits everything, src c admits nothing
      assert(streamed.count(_._2 == "a") >= 1 && streamed.count(_._2 == "a") < 4)
      assert(streamed.count(_._2 == "b") == 2 && !streamed.exists(_._2 == "c"))
      // state rows = one counter per seen source, NEVER per doc
      val st = Option(query.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
        .map(_.numRowsTotal).sum
      assert(st == 3, s"expected one state row per source, got $st")
    } finally query.stop()
  }

  test("sourceQuotaFilter: within-batch order is HASH order, not id order (frontier pair)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(n: Int): String = (0 until n).map(j => s"w$j").mkString(" ")
    // md5("4") = a87f... < md5("3") = eccb..., so hash order INVERTS id
    // order; at quota 10, the batch face admits {4} (8 tokens first),
    // a bare-id sort would admit {3} instead
    val rows = Seq((3L, "a", words(4)), (4L, "a", words(8)))
    val quotas = Map("a" -> 10L)
    val batch = graft.operators.Curation
      .sourceBudgetSample(rows.toDF("doc_id", "source", "text"), quotas)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(batch.map(_._1) == Set(4L), s"fixture assumption broken: $batch")
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "source", "text")
    val query = DocStream.sourceQuotaFilter(docs, quotas)
      .writeStream.format("memory").queryName("quota_ord_out").outputMode("append").start()
    try {
      input.addData(rows.map { case (id, src, t) => (id, ts(id), src, t) }) // ONE batch
      query.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM quota_ord_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("dsirFilter on a stream keeps exactly the docs whose batch dsirScore clears the bar") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vocabWords = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "theta", "iota", "kappa", "lambda")
    val rnd = new scala.util.Random(7)
    val corpus: Array[(Long, String)] = (0 until 60).map { i =>
      val n = 4 + rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocabWords(rnd.nextInt(vocabWords.length))).mkString(" "))
    }.toArray
    val raw = corpus.toSeq.toDF("doc_id", "text")
    // frozen weights trained on a target slice of the same snapshot
    val weights = graft.operators.Curation
      .dsirWeights(raw, raw.filter($"doc_id" % 3 === 0), d = 256, scale = 1000L)
      .localCheckpoint(true)
    val scored = graft.operators.Curation.dsirScore(raw, weights, d = 256, scale = 1000L)
    val minScore = scored.selectExpr("percentile_approx(score, 0.5) AS m").head.getLong(0)
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream
      .dsirFilter(docs, weights, minScore = minScore, d = 256, scale = 1000L)
      .writeStream.format("memory").queryName("dsir_out").outputMode("append").start()
    try {
      input.addData(corpus.take(30).map { case (id, t) => (id, ts(id.toInt), t) }.toIndexedSeq)
      query.processAllAvailable()
      input.addData(Seq((9999L, ts(0), null.asInstanceOf[String])) ++
        corpus.drop(30).map { case (id, t) => (id, ts(id.toInt), t) })
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM dsir_out").collect().map(_.getLong(0)).toSet
      val batch = scored.filter($"score" >= minScore).collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.size < corpus.length) // the gate bites both ways
    } finally query.stop()
  }

  test("qualityRulesFilter on a stream keeps exactly the batch pass rows across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus mixing passers (long, distinct-rich, stopword-bearing) with
    // each failure mode: too short, 1-char salad, no stopwords, repetitive
    val good = (1 to 30).flatMap(i => Seq("the", s"token$i")).mkString(" ")
    val corpus: Seq[(Long, String)] = Seq(
      1L -> good, 2L -> "short one", 3L -> (Seq.fill(40)("a").mkString(" ") + " the value"),
      4L -> Seq.fill(60)("tok").mkString(" "), 5L -> good, 6L -> null,
    ) ++ (10L to 40L).map(i => i -> (good + s" extra$i"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.qualityRulesFilter(docs)
      .writeStream.format("memory").queryName("qrf_out").outputMode("append").start()
    try {
      input.addData(corpus.take(4).map { case (id, t) => (id, ts(id.toInt), t) })
      query.processAllAvailable()
      input.addData(corpus.drop(4).map { case (id, t) => (id, ts(id.toInt % 100), t) })
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM qrf_out").collect().map(_.getLong(0)).toSet
      val batch = graft.operators.TextAnalysis
        .qualityRules(corpus.toDF("doc_id", "text"))
        .filter($"pass" === 1L).collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.size < corpus.length) // gate bites both ways
    } finally query.stop()
  }

  test("streaming repetitionSignals matches the batch Curation operator row for row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts(10), "a a a b"),
      (2L, ts(11), "x y"),
      (3L, ts(12), ""),
      (4L, ts(13), "   "),
      (5L, ts(20), "w w w w"),
      (6L, ts(21), null.asInstanceOf[String]), // dropped on both sides
      (7L, ts(22), "one two three one two three one"),
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.repetitionSignals(docs)
      .writeStream.format("memory").queryName("rep_out").outputMode("append").start()
    try {
      input.addData(rows.take(4): _*)  // two micro-batches
      query.processAllAvailable()
      input.addData(rows.drop(4): _*)
      query.processAllAvailable()
      def asMap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val streamed = asMap(spark.sql(
        "SELECT doc_id, n_words, n_distinct_words, n_grams, n_distinct_grams, top_word_n FROM rep_out").collect())
      val batch = asMap(graft.operators.Curation
        .repetitionSignals(rows.map(r => (r._1, r._3)).toDF("doc_id", "text"))
        .select("doc_id", "n_words", "n_distinct_words", "n_grams", "n_distinct_grams", "top_word_n")
        .collect())
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
    } finally query.stop()
  }

  test("bloom decontamination drops exactly the contaminated docs on a 2-batch stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the held-out split defining the contamination surface
    val testTexts = Seq(
      "one two three four five six",
      "alpha beta gamma delta epsilon",
      "a b", // sub-k: single shingle
    ).toDF("text")
    val bloom = DocStream.contaminationBloom(testTexts, k = 5, expectedItems = 1000)
    // incoming train docs: identical, interior-overlap, clean, sub-k match,
    // null text (no shingles — must pass), clean again
    val rows = Seq(
      (1L, ts(10), "one two three four five six"),          // contaminated
      (2L, ts(11), "zz alpha beta gamma delta epsilon zz"), // contaminated (interior)
      (3L, ts(12), "nothing here overlaps at all friend"),  // clean
      (4L, ts(20), "a b"),                                  // contaminated (sub-k)
      (5L, ts(21), null.asInstanceOf[String]),              // no shingles → passes
      (6L, ts(22), "completely clean later document text"), // clean
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.decontaminateFilter(docs, bloom, k = 5)
      .writeStream.format("memory").queryName("decon_out").outputMode("append").start()
    try {
      input.addData(rows.take(3): _*) // two micro-batches
      query.processAllAvailable()
      input.addData(rows.drop(3): _*)
      query.processAllAvailable()
      val passed = spark.sql("SELECT doc_id FROM decon_out").collect().map(_.getLong(0)).toSet
      // independent string-semantics reference: shingle-set intersection
      def shingles(t: String, k: Int): Seq[String] = {
        val ws = t.trim.split("\\s+", -1).toSeq
        if (ws.size < k) Seq(ws.mkString(" "))
        else (0 to ws.size - k).map(i => ws.slice(i, i + k).mkString(" "))
      }
      val surface = Seq("one two three four five six",
        "alpha beta gamma delta epsilon", "a b").flatMap(shingles(_, 5)).toSet
      val exactClean = rows.collect {
        case (id, _, t) if t == null || !shingles(t, 5).exists(surface.contains) => id
      }.toSet
      // zero false negatives is a bloom guarantee; zero false positives on
      // this fixture is deterministic (same bloom bits every run)
      assert(passed == exactClean, s"passed $passed\nexact clean set $exactClean")
      assert(passed == Set(3L, 5L, 6L))
    } finally query.stop()
  }

  test("deconFilter gates a stream exactly like the batch substring-decon spans") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val testSplit = Seq(
      (100L, "t0 t1 t2 t3 t4 t5 t6 t7 tail token"),
      (101L, "u0 u1 u2 u3 u4 u5 u6 u7"),
    ).toDF("doc_id", "text")
    val rows = Seq(
      (1L, ts(10), "x0 t0 t1 t2 t3 t4 t5 t6 t7 y0"),     // interior 8-shingle overlap
      (2L, ts(11), "clean words here nothing matches anything eight nine"), // clean
      (3L, ts(12), "u0 u1 u2 u3 u4 u5 u6"),              // 7 tokens < k — passes
      (4L, ts(20), null.asInstanceOf[String]),           // no shingles — passes
      (5L, ts(21), "t1 t2 t3 t4 t5 t6 t7 tail"),         // exact trailing shingle
      (6L, ts(22), "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),     // clean, >= k tokens
    )
    val directory = graft.operators.Dedup.substrDirectory(testSplit, k = 8)
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.deconFilter(docs, directory, k = 8)
      .writeStream.format("memory").queryName("sdecon_out").outputMode("append").start()
    try {
      input.addData(rows.take(3): _*)
      query.processAllAvailable()
      input.addData(rows.drop(3): _*)
      query.processAllAvailable()
      val passed = spark.sql("SELECT doc_id FROM sdecon_out").collect().map(_.getLong(0)).toSet
      // batch reference: ids with ANY contaminated span are exactly the
      // dropped ones — the stream gate IS the batch semi-join's verdict
      val train = rows.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
      val contaminated = graft.operators.Dedup
        .substrContaminatedSpans(train, testSplit, k = 8)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(passed == rows.map(_._1).toSet -- contaminated,
        s"passed $passed, batch-contaminated $contaminated")
      assert(passed == Set(2L, 3L, 4L, 6L))
    } finally query.stop()
  }

  test("lineStrip on a stream rewrites text exactly like the batch line-dedup clean face") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "hdr nav\nkeep a\nftr legal"),
      (2L, "hdr nav\nkeep b\nftr legal"),
      (3L, "  hdr nav  \nsolo content\n\n   "), // padded dup + blanks
      (4L, null.asInstanceOf[String]),
    )
    val corpusDf = corpus.toDF("doc_id", "text")
    val directory = graft.operators.Dedup.lineDirectory(corpusDf)
    assert(directory.length == 2, directory.mkString(",")) // hdr + ftr lines

    val input = MemoryStream[(Long, String)]
    val query = DocStream.lineStrip(input.toDF().toDF("doc_id", "text"), directory)
      .writeStream.format("memory").queryName("lstrip_out").outputMode("append").start()
    try {
      input.addData(corpus.take(2): _*)
      query.processAllAvailable()
      input.addData(corpus.drop(2): _*)
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_id, text FROM lstrip_out").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      // batch reference: the clean face on the same corpus (it drops the
      // null-text doc; the stream transform passes it through as null)
      val batch = graft.operators.Dedup.lineDedupClean(corpusDf).collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(got.filterKeys(batch.contains).toMap ==
        batch.map { case (k, v) => k -> Some(v) },
        s"got=$got batch=$batch")
      assert(got(4L).isEmpty, "null text must pass through as null")
      assert(got(1L).contains("keep a") && got(3L).contains("solo content"))
    } finally query.stop()
  }

  test("mojibakeFix on a stream repairs text exactly like the batch column face") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "donâ€™t cafÃ© â€œgarbledâ€“text"),
      (2L, "clean résumé stays"),
      (3L, null.asInstanceOf[String]),
    )
    val input = MemoryStream[(Long, String)]
    val query = DocStream.mojibakeFix(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mfix_out").outputMode("append").start()
    try {
      input.addData(corpus.take(1): _*)
      query.processAllAvailable()
      input.addData(corpus.drop(1): _*)
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_id, text FROM mfix_out").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val batch = corpus.toDF("doc_id", "text")
        .select($"doc_id", graft.operators.TextAnalysis.fixMojibake($"text").as("t"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == batch, s"got=$got batch=$batch")
      assert(got(1L).contains("don’t café “garbled–text"))
      assert(got(2L).contains("clean résumé stays"))
      assert(got(3L).isEmpty)
    } finally query.stop()
  }

  test("sampleBySourceWeights on a stream keeps exactly the batch-kept rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 200L).map(id => (id, s"src${id % 4}"))
    val weights = Map("src0" -> 0, "src1" -> 100, "src2" -> 40)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "source")
    val query = graft.operators.Curation.sampleBySourceWeights(docs, weights, defaultPct = 25)
      .writeStream.format("memory").queryName("mix_out").outputMode("append").start()
    try {
      input.addData(rows.take(120): _*) // two micro-batches
      query.processAllAvailable()
      input.addData(rows.drop(120): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM mix_out").collect().map(_.getLong(0)).toSet
      val batch = graft.operators.Curation
        .sampleBySourceWeights(rows.toDF("doc_id", "source"), weights, defaultPct = 25)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch, "stateless hash sampling must be batch ≡ stream")
      assert(!streamed.exists(_ % 4 == 0) && rows.filter(_._1 % 4 == 1).map(_._1).toSet.subsetOf(streamed))
    } finally query.stop()
  }

  test("windowed PII stats sum to the batch piiScan over the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts(10), "contact bob@example.com or 10.0.0.1 x42"),
      (2L, ts(20), null.asInstanceOf[String]), // null → "" still counted as a row
      (3L, ts(70), "ids 123 456 and jane.doe+x@sub.domain.org"),
      (4L, ts(80), "no digits here"),
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.piiByWindow(docs, windowDuration = "1 minute", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("pii_out").outputMode("append").start()
    try {
      input.addData(rows.take(2): _*)
      query.processAllAvailable()
      input.addData(rows.drop(2): _*)
      query.processAllAvailable()
      input.addData((5L, ts(600), "flush")) // advance watermark past both windows
      query.processAllAvailable()
      val streamed = spark.sql(
        """SELECT SUM(n_rows), SUM(n_number_hits), SUM(n_with_number), SUM(n_email_hits),
                  SUM(n_ip_hits), SUM(n_chars_redacted)
           FROM pii_out WHERE window_start < timestamp'1970-01-01 00:05:00'""").collect().head
      assert(spark.sql("SELECT COUNT(*) FROM pii_out WHERE window_start < timestamp'1970-01-01 00:05:00'")
        .head.getLong(0) == 2, "both 1-minute windows must have closed")
      val batch = graft.operators.Curation
        .piiScan(rows.map(r => ("all", r._3)).toDF("grp", "text"), "text", "grp")
        .select("n_rows", "n_number_hits", "n_with_number", "n_email_hits", "n_ip_hits", "n_chars_redacted")
        .collect().head
      assert((0 until 6).forall(i => streamed.getLong(i) == batch.getLong(i)),
        s"streamed $streamed\nbatch $batch")
    } finally query.stop()
  }

  test("dedupAgainstFilter gates a 2-batch stream exactly like the batch flags") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val existing = Seq(
      100L -> "alpha beta gamma delta epsilon zeta",
      101L -> "unrelated totally different words here",
    ).toDF("doc_id", "text")
    val bloom = graft.operators.MinHash.directoryBloom(existing)
    val rows = Seq(
      (1L, ts(10), "alpha beta gamma delta epsilon zeta"), // dup of existing → dropped
      (2L, ts(20), "fresh new content nothing shared anywhere"), // passes
      (3L, ts(30), null.asInstanceOf[String]), // null text passes
      (4L, ts(40), "alpha beta gamma delta epsilon zeta"), // dup again, later batch
      (5L, ts(50), "fresh new content nothing shared anywhere"), // stream-dup of 2: passes (not gated)
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.dedupAgainstFilter(docs, bloom)
      .writeStream.format("memory").queryName("gate_out").outputMode("append").start()
    try {
      input.addData(rows.take(3): _*)
      query.processAllAvailable()
      input.addData(rows.drop(3): _*)
      query.processAllAvailable()
      val passed = spark.sql("SELECT doc_id FROM gate_out").collect().map(_.getLong(0)).toSet
      assert(passed == Set(2L, 3L, 5L), s"got $passed")
      // parity: exactly the docs the BATCH two-corpus operator leaves
      // unflagged (zero false negatives; no false positive on this fixture)
      val batchUnflagged = graft.operators.MinHash
        .nearDupAgainst(rows.map(r => (r._1, r._3)).toDF("doc_id", "text"), existing)
        .filter("NOT dup_of_existing").collect().map(_.getLong(0)).toSet
      assert(passed == batchUnflagged, s"stream $passed vs batch $batchUnflagged")
    } finally query.stop()
  }

  test("lmScoreByWindow against a frozen LM equals the batch lmScoreAgainst") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // frozen LM corpus (every doc in the LM bucket: trainBucketMin = 0)
    val lmDocs = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "the cat ran"),
      (102L, "dog ran far"),
    ).toDF("doc_id", "text")
    val lm = graft.operators.Curation.lmTable(lmDocs, trainBucketMin = 0)
      .localCheckpoint(true) // freeze: static side of the stream-static join
    val rows = Seq(
      (1L, ts(10), "the cat sat"),          // all bigrams in-LM
      (2L, ts(20), "the cat zzz qqq"),      // mixed in-LM / OOV
      (3L, ts(25), null.asInstanceOf[String]), // null text: absent from stream out
      (4L, ts(70), "solo"),                 // sub-2-word whole-text "bigram", OOV
      (5L, ts(80), "dog ran far far far"),  // partly in-LM, repeats
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "event_time", "text")
    val query = DocStream.lmScoreByWindow(docs, lm,
        windowDuration = "1 minute", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("lm_out").outputMode("append").start()
    try {
      input.addData(rows.take(3): _*)
      query.processAllAvailable()
      input.addData(rows.drop(3): _*)
      query.processAllAvailable()
      input.addData((6L, ts(600), "flush")) // advance watermark past both windows
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, n_bigrams, n_oov, ll_score FROM lm_out WHERE doc_id <= 5")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val batch = graft.operators.Curation
        .lmScoreAgainst(rows.map(r => (r._1, r._3)).toDF("doc_id", "text"), lm)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // null-text doc 3 scores (0,0,0) in batch and is absent on the stream
      assert(streamed.keySet == Set(1L, 2L, 4L, 5L), s"got ${streamed.keySet}")
      assert(batch(3L) == ((0L, 0L, 0L)))
      for (id <- streamed.keySet)
        assert(streamed(id) == batch(id),
          s"doc $id: streamed ${streamed(id)} batch ${batch(id)}")
      // the fixture exercises both evidence classes through the stream
      assert(streamed.values.exists(_._2 > 0) && streamed.values.exists(_._3 > 0))
    } finally query.stop()
  }

  test("cmsByWindow: windowed streaming sketch equals the batch Aggregator matrix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (depth, width) = (4, 64)
    val rows = Seq(
      (1L, ts(10), "alpha beta alpha"),
      (2L, ts(20), "beta gamma"),
      (3L, ts(30), null.asInstanceOf[String]),
      (4L, ts(70), "alpha delta delta"), // second window
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = DocStream.cmsByWindow(
      input.toDF().toDF("doc_id", "event_time", "text"), depth, width)
      .writeStream.format("memory").queryName("cms_out").outputMode("complete").start()
    try {
      input.addData(rows.take(2): _*)
      query.processAllAvailable()
      input.addData(rows.drop(2): _*)
      query.processAllAvailable()
      val got = spark.sql("SELECT window_start, sketch, n_docs FROM cms_out")
        .collect()
        .map(r => r.getTimestamp(0).getTime / 1000 ->
          ((r.getSeq[Long](1).toVector, r.getLong(2)))).toMap
      assert(got.keySet == Set(0L, 60L), got.keySet.toString)
      // window [0,60): docs 1+2 (null-text 3 contributes nothing)
      def batchMatrix(texts: Seq[String]): Vector[Long] = {
        val m = new Array[Long](depth * width)
        texts.foreach(t =>
          t.split("\\s+").filter(_.nonEmpty).foreach(tok =>
            (0 until depth).foreach(r =>
              m(r * width + graft.functions.CmsSketch.bucket(r, tok, width)) += 1L)))
        m.toVector
      }
      assert(got(0L) == ((batchMatrix(Seq(rows(0)._3, rows(1)._3)), 2L)))
      assert(got(60L) == ((batchMatrix(Seq(rows(3)._3)), 1L)))
      // the emitted matrix serves the same estimate kernel as batch
      val m0 = got(0L)._1.toArray
      assert(graft.functions.CmsSketch.estimate(m0, "alpha", depth, width) >= 2L)
      assert(graft.functions.CmsSketch.estimate(m0, "beta", depth, width) >= 2L)
    } finally query.stop()
  }

  test("qsketchByWindow: windowed streaming quantile histogram equals the batch kernel") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts(10), 0L),
      (2L, ts(20), 15L),
      (3L, ts(30), 17L),   // same bucket (17 -> 17) as nothing; distinct buckets
      (4L, ts(40), 558L),
      (5L, ts(70), 1024L), // second window
    )
    val input = MemoryStream[(Long, Timestamp, Long)]
    val query = DocStream.qsketchByWindow(
      input.toDF().toDF("doc_id", "event_time", "n_chars"))
      .writeStream.format("memory").queryName("qs_out").outputMode("complete").start()
    try {
      input.addData(rows.take(2): _*)
      query.processAllAvailable()
      input.addData(rows.drop(2): _*)
      query.processAllAvailable()
      val got = spark.sql("SELECT window_start, sketch, n_docs FROM qs_out")
        .collect()
        .map(r => r.getTimestamp(0).getTime / 1000 ->
          ((r.getSeq[Long](1).toVector, r.getLong(2)))).toMap
      assert(got.keySet == Set(0L, 60L), got.keySet.toString)
      def batchMatrix(vs: Seq[Long]): Vector[Long] = {
        val m = new Array[Long](graft.functions.LogHistogram.NumBuckets)
        vs.foreach(v => m(graft.functions.LogHistogram.bucket(v)) += 1L)
        m.toVector
      }
      assert(got(0L) == ((batchMatrix(Seq(0L, 15L, 17L, 558L)), 4L)))
      assert(got(60L) == ((batchMatrix(Seq(1024L)), 1L)))
      // linearity across windows: the summed stream matrices == one batch
      // matrix over all values (the rollup a daily job would run)
      val summed = got(0L)._1.zip(got(60L)._1).map { case (a, b) => a + b }
      assert(summed == batchMatrix(rows.map(_._3)))
    } finally query.stop()
  }

  test("qsketchDriftByWindow: in-distribution window near zero, planted drift fires") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lh = graft.functions.LogHistogram
    // frozen baseline: lengths 20 and 300, half each
    val baseVals = Seq(20L, 300L, 20L, 300L)
    val baseline = DocStream.qsketchBaselineFracPpm(baseVals.toDF("n_chars"))
    assert(baseline(lh.bucket(20L)) == 500000L && baseline(lh.bucket(300L)) == 500000L)
    val rows = Seq(
      // window [0,60): same 50/50 mix as the baseline -> drift 0
      (1L, ts(10), 20L), (2L, ts(20), 300L),
      // window [60,120): all docs 100k chars -> full mass displaced
      (3L, ts(70), 100000L), (4L, ts(80), 100000L),
    )
    val input = MemoryStream[(Long, Timestamp, Long)]
    val query = DocStream.qsketchDriftByWindow(
      input.toDF().toDF("doc_id", "event_time", "n_chars"), baseline)
      .writeStream.format("memory").queryName("qd_out").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.sql("SELECT window_start, n_docs, drift_ppm FROM qd_out")
        .collect()
        .map(r => r.getTimestamp(0).getTime / 1000 -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.keySet == Set(0L, 60L))
      assert(got(0L) == ((2L, 0L)), s"in-distribution window must read zero: ${got(0L)}")
      // displaced mass: window puts 10^6 ppm on an unseen bucket (counted
      // once) and zero on the two baseline buckets (5·10^5 each) -> 2·10^6
      assert(got(60L) == ((2L, 2000000L)), s"planted drift: ${got(60L)}")
      // streamed arithmetic == the batch face's integer contract, replayed
      val win2 = Seq(100000L, 100000L)
      val m = new Array[Long](lh.NumBuckets)
      win2.foreach(v => m(lh.bucket(v)) += 1)
      val expect = m.toSeq.zip(baseline).map { case (c, f) =>
        math.abs(c * 1000000L / win2.length - f)
      }.sum
      assert(got(60L)._2 == expect)
    } finally query.stop()
  }
}
