package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for the round-17 crawl-hygiene operators: mojibake
  * repair (ftfy's deterministic core), The Stack-style code layout rules,
  * and the UT1-style domain blocklist.
  */
class CrawlHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("crawl-hygiene-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fixOf(t: String): String =
    docs(1L -> t).select(TextAnalysis.fixMojibake(col("text"))).head.getString(0)

  private def countOf(t: String): Long =
    docs(1L -> t).select(TextAnalysis.mojibakeCount(col("text"))).head.getLong(0)

  test("every mojibake table entry repairs; the count matches; adjacency safe") {
    for ((bad, good) <- TextAnalysis.MojibakeTable) {
      assert(fixOf(s"x ${bad}y") == s"x ${good}y", s"entry $bad")
      assert(countOf(s"x ${bad}y") == 1L, s"count $bad")
    }
    // adjacent distinct sequences both count and both repair
    assert(fixOf("donâ€™tâ€œq cafÃ©Ã¨") == "don’t“q caféè")
    assert(countOf("donâ€™tâ€œq cafÃ©Ã¨") == 4L)
    // repeats of one sequence all count
    assert(countOf("Ã©Ã©Ã©") == 3L && fixOf("Ã©Ã©Ã©") == "ééé")
  }

  test("fix is idempotent and clean unicode survives untouched") {
    val clean = "résumé naïve “real quotes” – dash … done"
    assert(fixOf(clean) == clean)
    assert(countOf(clean) == 0L)
    val once = fixOf(TextAnalysis.MojibakeGarble)
    assert(fixOf(once) == once, "not a fixed point")
    assert(countOf(once) == 0L, "repaired text still counts as damaged")
  }

  test("no mojibake table LHS is a substring of another (the count-sum premise)") {
    val keys = TextAnalysis.MojibakeTable.map(_._1)
    for (a <- keys; b <- keys if a != b)
      assert(!a.contains(b), s"'$b' inside '$a' would double-count")
  }

  test("codeRules: each planted failure mode trips exactly its own arm") {
    val d = docs(
      1L -> TextAnalysis.CodeMinified,
      2L -> TextAnalysis.CodeBlob,
      3L -> TextAnalysis.CodeSoup,
      4L -> TextAnalysis.CodeWide,
      5L -> "short prose line\nanother fine line of code();",
    )
    val r = TextAnalysis.codeRules(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap
    // (max_line, avg_milli, alnum_milli, has_blob, keep)
    assert(r(1L)._1 > 200 && r(1L)._2 <= 100000 && r(1L)._3 >= 250 && r(1L)._4 == 0 && r(1L)._5 == 0)
    assert(r(2L)._1 <= 200 && r(2L)._2 <= 100000 && r(2L)._3 >= 250 && r(2L)._4 == 1 && r(2L)._5 == 0)
    assert(r(3L)._1 <= 200 && r(3L)._2 <= 100000 && r(3L)._3 < 250 && r(3L)._4 == 0 && r(3L)._5 == 0)
    assert(r(4L)._1 <= 200 && r(4L)._2 > 100000 && r(4L)._3 >= 250 && r(4L)._4 == 0 && r(4L)._5 == 0)
    assert(r(5L)._5 == 1, r(5L).toString)
  }

  test("codeRules edge cases: empty and null text fail the alnum floor; 63-run is not a blob") {
    val d = docs(1L -> "", 3L -> ("A" * 63), 4L -> ("A" * 64))
      .union(docs(2L -> "x").select(col("doc_id"), lit(null).cast("string").as("text")))
    val r = TextAnalysis.codeRules(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    assert(r(1L) == ((0L, 0L, 0L)), r(1L).toString)
    assert(r(2L) == ((0L, 0L, 0L)), r(2L).toString)
    assert(r(3L)._2 == 0L && r(3L)._3 == 1L, r(3L).toString)
    assert(r(4L)._2 == 1L && r(4L)._3 == 0L, r(4L).toString)
    intercept[IllegalArgumentException](TextAnalysis.codeRules(d, maxLineLen = 0))
  }

  private def urls(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "url_text")
  }

  private def blockMap(rows: Seq[(Long, String)], bl: Seq[String]): Map[Long, (String, Option[String], Long)] =
    Curation.domainBlock(urls(rows: _*), bl).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2)), r.getLong(3))))
      .toMap

  test("domainBlock: exact host, parent suffix, label boundary, and no-URL pass") {
    val rows = Seq(
      1L -> "see http://bad.example.com/x",        // exact host entry
      2L -> "see http://cdn.bad.example.com/x",    // parent-domain suffix
      3L -> "see http://ample.com/x",              // label boundary: must NOT match example.com-like tails
      4L -> "no url at all",                       // passes, empty domain
      5L -> "see http://fine.org/x",               // unblocked host
    )
    val r = blockMap(rows, Seq("bad.example.com", "xample.com"))
    assert(r(1L) == (("bad.example.com", Some("bad.example.com"), 1L)), r(1L).toString)
    assert(r(2L) == (("cdn.bad.example.com", Some("bad.example.com"), 1L)), r(2L).toString)
    assert(r(3L) == (("ample.com", None, 0L)), r(3L).toString)
    assert(r(4L) == (("", None, 0L)), r(4L).toString)
    assert(r(5L) == (("fine.org", None, 0L)), r(5L).toString)
  }

  test("domainBlock: most-specific rule wins; guard rejects malformed blocklists") {
    val r = blockMap(Seq(1L -> "see http://a.b.example.org/x"),
      Seq("example.org", "b.example.org"))
    assert(r(1L)._2.contains("b.example.org"), r(1L).toString)
    val d = urls(1L -> "x")
    intercept[IllegalArgumentException](Curation.domainBlock(d, Seq.empty))
    intercept[IllegalArgumentException](Curation.domainBlock(d, Seq("UPPER.com")))
    intercept[IllegalArgumentException](Curation.domainBlock(d, Seq("has space.com")))
  }
}
