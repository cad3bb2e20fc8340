package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for substring-level exact dedup (Lee et al. 2022
  * ExactSubstr semantics via the shingle-coverage reduction): planted
  * cross-doc repeats produce exactly the expected maximal spans, within-doc
  * repeats obey the crossDoc switch, adjacent coverage merges, short docs
  * and null text are safe, and the clean face removes precisely the
  * covered tokens.
  */
class SubstrDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("substr-dedup-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spanSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // a b c d e f g h — an 8-token block shared verbatim by docs 1 and 2,
  // embedded at different offsets, surrounded by per-doc unique words
  private val block = "a b c d e f g h"

  test("a planted cross-doc 8-token repeat yields exactly its covering span in both docs") {
    val d = docs(
      1L -> s"u1 u2 $block u3 u4",
      2L -> s"v1 $block v2 v3 v4")
    val spans = spanSet(Dedup.substrDupSpans(d, k = 8))
    // doc 1: block occupies tokens 3..10; doc 2: tokens 2..9. The
    // boundary shingles (straddling into u*/v*) are unique, so the span
    // is the block exactly — nothing bleeds.
    assert(spans == Set((1L, 3L, 10L), (2L, 2L, 9L)))
  }

  test("a longer shared run merges its overlapping shingles into ONE maximal span") {
    // 12 shared tokens → five overlapping duplicated 8-shingles → one span
    val run = "a b c d e f g h i j k l"
    val d = docs(1L -> s"u1 $run u2", 2L -> s"$run v1 v2")
    val spans = spanSet(Dedup.substrDupSpans(d, k = 8))
    assert(spans == Set((1L, 2L, 13L), (2L, 1L, 12L)))
  }

  test("two separated repeats stay two spans; abutting coverage merges") {
    // doc 1 carries the block twice with a 3-token unique gap → the gap's
    // straddling shingles are unique, coverage is disjoint → two spans
    val d = docs(
      1L -> s"$block g1 g2 g3 $block",
      2L -> s"$block w1 w2 w3 w4 w5 w6 w7 $block")
    val spans = Dedup.substrDupSpans(d, k = 8)
    val byDoc = spans.collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc == Map(1L -> 2, 2L -> 2))
  }

  test("crossDoc=true ignores a repeat confined to one document; crossDoc=false flags it") {
    val d = docs(
      1L -> s"$block x1 x2 x3 $block", // block repeats only within doc 1
      2L -> "y1 y2 y3 y4 y5 y6 y7 y8 y9")
    assert(Dedup.substrDupSpans(d, k = 8, crossDoc = true).count() == 0)
    val self = spanSet(Dedup.substrDupSpans(d, k = 8, crossDoc = false))
    assert(self == Set((1L, 1L, 8L), (1L, 12L, 19L)))
  }

  test("stats: complete per-doc accounting with zeros, short and null docs safe") {
    val d = docs(
      1L -> s"u1 $block u2",
      2L -> s"$block",
      3L -> "too short",
      4L -> null.asInstanceOf[String])
    val rows = Dedup.substrDupStats(d, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // null text is excluded (module contract); short doc has 0 shingles
    assert(rows == Set((1L, 10L, 1L, 8L), (2L, 8L, 1L, 8L), (3L, 2L, 0L, 0L)))
  }

  test("clean face removes exactly the covered tokens and keeps span-free docs verbatim") {
    val d = docs(
      1L -> s"u1 u2 $block u3",
      2L -> s"$block v1",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9")
    val out = Dedup.substrDedupClean(d, k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "u1 u2 u3", 2L -> "v1", 3L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
  }

  test("a doc that is ENTIRELY duplicated cleans to the empty string") {
    val d = docs(1L -> block, 2L -> s"$block tail")
    val out = Dedup.substrDedupClean(d, k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "")
    assert(out(2L) == "tail")
  }

  test("decontamination: only test-overlapping train spans are marked; removal is exact") {
    val train = docs(
      1L -> s"u1 u2 $block u3",          // shares block with the test doc
      2L -> "v1 v2 v3 v4 v5 v6 v7 v8 v9") // clean
    val test = docs(100L -> s"t1 $block t2")
    val stats = Dedup.substrDecontaminateStats(train, test, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stats == Set((1L, 11L, 1L, 8L), (2L, 9L, 0L, 0L)))
    val clean = Dedup.substrDecontaminate(train, test, k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(clean == Map(1L -> "u1 u2 u3", 2L -> "v1 v2 v3 v4 v5 v6 v7 v8 v9"))
    // contamination is DIRECTIONAL: two train docs sharing a block among
    // themselves (but absent from test) are untouched
    val train2 = docs(1L -> s"$block a1", 2L -> s"$block b1")
    val clean2 = Dedup.substrDecontaminate(train2, test.filter("doc_id < 0"), k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(clean2 == Map(1L -> s"$block a1", 2L -> s"$block b1"))
  }

  test("fuzz: spans equal a brute-force reference on random small-vocab corpora") {
    // a SMALL vocab makes natural k-gram collisions common, stressing the
    // merge logic far beyond the planted cases; the reference recomputes
    // coverage by definition (mark every position whose k-window token
    // sequence occurs elsewhere, merge runs) with none of the operator's
    // machinery
    val vocabWords = Array("a", "b", "c", "d", "e", "f")
    val k = 4
    def reference(corpus: Seq[(Long, Array[String])], crossDoc: Boolean): Set[(Long, Long, Long)] = {
      val grams = scala.collection.mutable.HashMap[Seq[String], List[(Long, Int)]]()
      for ((id, ws) <- corpus; p <- 0 to ws.length - k)
        grams.updateWith(ws.slice(p, p + k).toSeq)(o => Some((id, p) :: o.getOrElse(Nil)))
      val out = Set.newBuilder[(Long, Long, Long)]
      for ((id, ws) <- corpus if ws.length >= k) {
        val covered = new Array[Boolean](ws.length)
        for (p <- 0 to ws.length - k) {
          val occ = grams(ws.slice(p, p + k).toSeq)
          val dup = if (crossDoc) occ.exists(_._1 != id) else occ.size > 1
          if (dup) (p until p + k).foreach(covered(_) = true)
        }
        var i = 0
        while (i < covered.length) {
          if (covered(i)) {
            val s = i
            while (i < covered.length && covered(i)) i += 1
            out += ((id, (s + 1).toLong, i.toLong)) // 1-based inclusive
          } else i += 1
        }
      }
      out.result()
    }
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0 until (6 + rnd.nextInt(8))).map { i =>
        val n = rnd.nextInt(30)
        (i.toLong, Array.fill(n)(vocabWords(rnd.nextInt(vocabWords.length))))
      }
      val df = corpus.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
      for (crossDoc <- Seq(true, false)) {
        val got = spanSet(Dedup.substrDupSpans(df, k = k, crossDoc = crossDoc))
        val want = reference(corpus, crossDoc)
        assert(got == want,
          s"seed=$seed crossDoc=$crossDoc\ngot:  ${got.toSeq.sorted}\nwant: ${want.toSeq.sorted}")
      }
    }
  }

  test("coverage equivalence: spans equal the union of repeated >=k-substrings (planted 3-way)") {
    // the same 10-token run in three docs plus an unrelated 8-block pair:
    // every covered token must be inside SOME cross-doc-repeated >=8-token
    // substring and vice versa — here that union is exactly the planted
    // regions, whatever their multiplicity
    val run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"
    val d = docs(
      1L -> s"$run a1 $block",
      2L -> s"b1 b2 $run",
      3L -> s"$run c1 c2 c3",
      4L -> s"d1 $block d2")
    val stats = Dedup.substrDupStats(d, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(stats == Set((1L, 2L, 18L), (2L, 1L, 10L), (3L, 1L, 10L), (4L, 1L, 8L)))
  }
}
