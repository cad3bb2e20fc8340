package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Seeded fuzz over the round-16 families: random corpora (shared lines,
  * padding, blanks, unicode, nulls, within-doc repeats) checked against
  * PURE-SCALA mirrors of the declared semantics — the sampling-family
  * fuzz discipline. Catches the classes a fixed fixture can't: dup rules
  * at boundary multiplicities, reconstruction order under adversarial
  * positions, integer-formula drift.
  */
class R16FuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("r16-fuzz").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val lineVocab = Vector(
    "shared header", "cookie banner", " padded banner ", "unique-ish",
    "中文 行", "tail...", "- bullet", "plain words here", "x")

  private def randCorpus(rnd: scala.util.Random, n: Int): Seq[(Long, String)] =
    (0L until n).map { id =>
      if (rnd.nextInt(10) == 0) (id, null.asInstanceOf[String])
      else {
        val nl = 1 + rnd.nextInt(5)
        val lines = Seq.fill(nl)(
          if (rnd.nextInt(4) == 0) "" // blank lines drop
          else lineVocab(rnd.nextInt(lineVocab.size)) +
            (if (rnd.nextInt(3) == 0) s" u$id" else ""))
        (id, lines.mkString("\n"))
      }
    }

  /** The declared normalization: sqlTrim each \n-split line, drop blanks. */
  private def mirrorLines(t: String): Seq[String] =
    t.split("\n", -1).toSeq.map(OpChecks.sqlTrim).filter(_.nonEmpty)

  test("line dedup family == pure mirror across random corpora") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val corpus = randCorpus(rnd, 30 + rnd.nextInt(30))
      val df = corpus.toDF("doc_id", "text")
      val docLines = corpus.collect { case (id, t) if t != null => id -> mirrorLines(t) }
      val dupSet = docLines.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).collect { case (l, xs) if xs.map(_._2).distinct.size >= 2 => l }.toSet

      val stats = Dedup.lineDupStats(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val expectStats = docLines.collect { case (id, ls) if ls.nonEmpty =>
        id -> ((ls.size.toLong, ls.count(dupSet).toLong))
      }.toMap
      assert(stats == expectStats, s"seed $seed stats")

      val clean = Dedup.lineDedupClean(df).collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      val expectClean = docLines.collect { case (id, ls) if ls.nonEmpty =>
        id -> ls.filterNot(dupSet).mkString("\n")
      }.toMap
      assert(clean == expectClean, s"seed $seed clean")

      // the streaming strip (applied batch-side: same udf) == clean face
      val dir = Dedup.lineDirectory(df)
      val stripped = graft.streaming.DocStream.lineStrip(df, dir).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      expectClean.foreach { case (id, want) =>
        assert(stripped(id).contains(want), s"seed $seed strip doc $id")
      }
    }
  }

  test("bm25TopK == pure integer mirror across random corpora and term bags") {
    val s = spark
    import s.implicits._
    def bitlen(x: Long): Long = if (x == 0) 1L else 64L - java.lang.Long.numberOfLeadingZeros(x)
    val words = Vector("alpha", "beta", "gamma", "delta", "pad")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val corpus = (0L until (20 + rnd.nextInt(20))).map { id =>
        (id, Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      val terms = rnd.shuffle(words).take(1 + rnd.nextInt(3))
      val df = corpus.toDF("doc_id", "text")
      val got = TextAnalysis.bm25TopK(df, terms, kTop = 1000).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      // mirror
      val dls = corpus.map { case (id, t) => id -> t.split("\\s+").length.toLong }.toMap
      val tfs = corpus.map { case (id, t) =>
        id -> terms.map(q => t.split("\\s+").count(_ == q).toLong)
      }.toMap
      val n = corpus.size.toLong
      val dlsum = dls.values.sum
      val dfs = terms.indices.map(i => corpus.count { case (id, _) => tfs(id)(i) > 0 }.toLong)
      val expect = corpus.map { case (id, _) =>
        val sc = terms.indices.map { i =>
          val idf = bitlen(((n - dfs(i) + 1) * 1024) / (dfs(i) + 1))
          val tf = tfs(id)(i)
          idf * ((22000L * tf * dlsum) / (10 * tf * dlsum + 3 * dlsum + 9 * dls(id) * n))
        }.sum
        id -> sc
      }.toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("clusterStats invariants: histogram mass equals doc count, any canonical frame") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(200 + seed)
      val corpus = (0L until 40L).map(id =>
        (id, s"t${rnd.nextInt(8)}")) // heavy exact dups
      val df = corpus.toDF("doc_id", "text")
      val hist = Dedup.clusterStats(Dedup.exactCanonical(df)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(hist.map(_._3).sum == 40L, s"seed $seed mass")
      assert(hist.forall { case (sz, nc, nd) => sz * nc == nd }, s"seed $seed product")
      // mirror from the canonical assignment itself
      val sizes = Dedup.exactCanonical(df).collect().map(_.getLong(1))
        .groupBy(identity).map(_._2.length.toLong)
      val expect = sizes.groupBy(identity).map { case (sz, xs) => (sz, xs.size.toLong) }
      assert(hist.map(h => h._1 -> h._2).toMap == expect, s"seed $seed hist")
    }
  }

  test("stripMarkup: script/style contents vanish, body survives, malformed markup never throws") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "<p>keep me</p><script>var SECRET = 1;</script><b>and me</b>"),
      (2L, "<style>body { x: y }</style>plain"),
      (3L, "a &lt;tag&gt; &amp; &quot;quote&quot;&nbsp;end"),
      (4L, "<div <p unclosed attr=\" >still fine"),
      (5L, "no markup at all"),
      (6L, null.asInstanceOf[String]),
      // escaped entity must single-decode (&amp; decodes LAST)
      (7L, "show &amp;lt; literally"),
      // case-insensitive block tags
      (8L, "<SCRIPT>var S = 2;</SCRIPT>kept<STYLE>a{}</STYLE>"),
    ).toDF("doc_id", "html")
    val out = rows.select(col("doc_id"), Dedup.normalizeText(lit("x")).as("__touch"),
      TextAnalysis.stripMarkup(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L).contains("keep me and me"))
    assert(!out(1L).get.contains("SECRET"))
    assert(out(2L).contains("plain"))
    assert(out(3L).contains("a <tag> & \"quote\" end"))
    assert(out(4L).contains("still fine"))
    assert(out(5L).contains("no markup at all"))
    assert(out(6L).isEmpty)
    assert(out(7L).contains("show &lt; literally"), out(7L).toString)
    assert(out(8L).contains("kept"), out(8L).toString)
    assert(!out(8L).get.contains("S = 2") && !out(8L).get.contains("a{}"), out(8L).toString)
  }

  test("normalizeText is idempotent and whitespace-canonical on hostile strings") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val pool = "aB7!?,;:中 .\t-_()[]«»é "
    val rows = (0L until 60L).map(id =>
      (id, Seq.fill(1 + rnd.nextInt(30))(pool(rnd.nextInt(pool.length))).mkString))
    val df = rows.toDF("doc_id", "text")
    val once = df.select(col("doc_id"), Dedup.normalizeText(col("text")).as("n1"))
    val twice = once.select(col("doc_id"), col("n1"),
      Dedup.normalizeText(col("n1")).as("n2"))
    twice.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2), s"not idempotent: '${r.getString(1)}'")
      val v = r.getString(1)
      assert(!v.contains("  ") && v == v.trim, s"not canonical: '$v'")
    }
  }
}
