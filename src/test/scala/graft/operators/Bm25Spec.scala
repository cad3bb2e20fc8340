package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Property specs for the integer-exact BM25 face: tf monotonicity,
  * length normalization, idf ordering between rare and common terms, and
  * the term-validation guard.
  */
class Bm25Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("bm25-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scores(rows: Seq[(Long, String)], terms: Seq[String]): Map[Long, Long] =
    TextAnalysis.bm25TopK(corpus(rows: _*), terms, kTop = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("tf monotone: more occurrences at equal length score higher") {
    val s = scores(Seq(
      1L -> "cat pad pad pad pad pad",
      2L -> "cat cat pad pad pad pad",
      3L -> "cat cat cat pad pad pad",
    ), Seq("cat"))
    assert(s(3L) > s(2L) && s(2L) > s(1L), s.toString)
  }

  test("length normalization: same tf, longer doc scores lower") {
    val s = scores(Seq(
      1L -> "cat pad pad pad",
      2L -> "cat pad pad pad pad pad pad pad pad pad pad pad",
    ), Seq("cat"))
    assert(s(1L) > s(2L), s.toString)
  }

  test("idf: a hit on a rare term outscores a hit on a near-ubiquitous term") {
    val docs = Seq(
      1L -> "rare pad",
      2L -> "common pad",
      3L -> "common pad",
      4L -> "common pad",
      5L -> "common pad",
      6L -> "common pad",
    )
    val rare = scores(docs, Seq("rare"))(1L)
    val common = scores(docs, Seq("common"))(2L)
    assert(rare > common, s"rare=$rare common=$common")
  }

  test("zero-hit docs score 0 and rank after any hit; guard rejects malformed terms") {
    val s = scores(Seq(1L -> "cat pad", 2L -> "dog pad"), Seq("cat"))
    assert(s(1L) > 0 && s(2L) == 0)
    val d = corpus(1L -> "x")
    intercept[IllegalArgumentException](TextAnalysis.bm25TopK(d, Seq.empty))
    intercept[IllegalArgumentException](TextAnalysis.bm25TopK(d, Seq("two words")))
    intercept[IllegalArgumentException](TextAnalysis.bm25TopK(d, Seq("o'quote")))
  }

  test("degenerate corpus (every doc tokenizes to zero words) scores 0, no div-by-zero") {
    val s = scores(Seq(1L -> "", 2L -> "   ", 3L -> ""), Seq("cat"))
    assert(s.values.toSet == Set(0L), s.toString)
  }
}
