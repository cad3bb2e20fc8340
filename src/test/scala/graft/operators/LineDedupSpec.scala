package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for line-level exact dedup (the RefinedWeb/CCNet
  * line-dedup stage): the cross-document dup rule, the within-doc-repeat
  * exclusion, normalization (trim + blank drop), order-preserving clean
  * reconstruction, and the all-boilerplate fail-visible contract.
  */
class LineDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("line-dedup-spec").getOrCreate()

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  override def afterAll(): Unit = spark.stop()

  test("cross-doc dup counted, within-doc repeat alone is NOT a dup") {
    val d = docs(
      1L -> "shared header\nbody one\nbody one\nonly in doc1",
      2L -> "shared header\nbody two",
    )
    val stats = Dedup.lineDupStats(d).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 4 lines; "shared header" dups cross-doc; the repeated
    // "body one" appears in no OTHER doc -> not a dup (both copies clean)
    assert(stats(1L) == ((4L, 1L)))
    assert(stats(2L) == ((2L, 1L)))
  }

  test("trim + blank-line normalization: padded copies dedup, blanks drop from accounting") {
    val d = docs(
      1L -> "  cookie banner  \n\n  real content a",
      2L -> "cookie banner\n   \nreal content b",
    )
    val stats = Dedup.lineDupStats(d).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // blank/whitespace-only lines vanish before counting; the padded and
    // unpadded banner copies are the SAME line after trim
    assert(stats(1L) == ((2L, 1L)) && stats(2L) == ((2L, 1L)))
  }

  test("clean face: order preserved, every occurrence removed, all-boilerplate doc kept empty") {
    val d = docs(
      1L -> "hdr\nkeep a\nhdr\nkeep b\nftr",
      2L -> "hdr\nftr",
      3L -> "solo line",
    )
    val out = Dedup.lineDedupClean(d).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc1: BOTH hdr occurrences removed (no keep-one), survivors in
    // original order rejoined with newlines
    assert(out(1L) == ((5L, 2L, "keep a\nkeep b")))
    // doc2 is pure boilerplate: present with empty clean_text, not dropped
    assert(out(2L) == ((2L, 0L, "")))
    assert(out(3L) == ((1L, 1L, "solo line")))
  }

  test("lineRules: zero-line docs fail both flags, thresholds are inclusive, guards fire") {
    val d = docs(
      1L -> "- a\n- b\n- c\nbody",            // 3/4 bullets = 75% <= 90 -> ok
      2L -> "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\nbody", // 10/11 = 90.9% -> fail
      3L -> "one ...\ntwo\nthree",             // 1/3 ellipsis = 33.3% -> fail (> 30)
      4L -> "   \n\n  ",                       // zero lines -> both fail
      5L -> "plain line",
    )
    val r = TextAnalysis.lineRules(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(4), x.getLong(5)))).toMap
    assert(r(1L) == ((1L, 1L)) && r(2L) == ((0L, 1L)))
    assert(r(3L) == ((1L, 0L)) && r(4L) == ((0L, 0L)) && r(5L) == ((1L, 1L)))
    intercept[IllegalArgumentException](TextAnalysis.lineRules(d, maxBulletPct = 101))
  }

  test("normalizeText folds case/punct/whitespace variants that raw exact dedup misses") {
    val d = docs(
      1L -> "Hello, World!",
      2L -> "hello   world",
      3L -> "HELLO WORLD!!  ",
      4L -> "different entirely",
    )
    val raw = Dedup.exactCanonical(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      s"raw exact dedup must MISS the variants: $raw")
    val norm = Dedup.exactCanonical(
      d.select(org.apache.spark.sql.functions.col("doc_id"),
        Dedup.normalizeText(org.apache.spark.sql.functions.col("text")).as("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(norm == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L), norm.toString)
  }

  test("clusterStats histogram: sizes sum back to the doc count, singletons counted") {
    val d = docs(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "c", 6L -> "c")
    val stats = Dedup.clusterStats(Dedup.exactCanonical(d)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
  }

  test("null text drops the doc from both faces; single-doc corpus has zero dups") {
    val d = docs(3L -> "a\nb").union(
      docs().select(org.apache.spark.sql.functions.lit(9L).as("doc_id"),
        org.apache.spark.sql.functions.lit(null).cast("string").as("text")))
    assert(Dedup.lineDupStats(d).collect().map(_.getLong(0)).toSet == Set(3L))
    val r = Dedup.lineDedupClean(d).collect()
    assert(r.length == 1 && r.head.getString(3) == "a\nb")
  }

  test("linedText fixture excludes null-text docs (matches the oracle's null arm)") {
    val d = docs(4L -> "body").union(
      docs().select(org.apache.spark.sql.functions.lit(8L).as("doc_id"),
        org.apache.spark.sql.functions.lit(null).cast("string").as("text")))
    val ids = Dedup.linedText(d).collect().map(_.getLong(0)).toSet
    assert(ids == Set(4L), ids.toString)
  }
}
