package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Rule-level pins for URL canonicalization: each rule in isolation,
  * their composition, param-order insensitivity, and what must NOT be
  * touched (content params, path case).
  */
class UrlCanonSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("url-canon-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(raw: String): String = {
    val s = spark
    import s.implicits._
    Seq(raw).toDF("t").select(Curation.canonicalizeUrl(col("t")).as("c"))
      .collect()(0).getString(0)
  }

  test("host case folds; path case survives") {
    assert(canon("x HTTP is not matched http://WWW.Example.COM/Path/To") ==
      "http://www.example.com/Path/To")
  }

  test("fragment drops") {
    assert(canon("see http://a.com/p#section-2") == "http://a.com/p")
  }

  test("tracking params strip; content params survive sorted") {
    assert(canon("http://a.com/p?utm_source=x&id=7&utm_campaign=y") ==
      "http://a.com/p?id=7")
    assert(canon("http://a.com/p?b=2&a=1") == "http://a.com/p?a=1&b=2")
    assert(canon("http://a.com/p?a=1&b=2") == "http://a.com/p?a=1&b=2")
    // ref/fbclid/gclid by exact name; a 'reference=' param is NOT stripped
    assert(canon("http://a.com/p?ref=tw&reference=kept") ==
      "http://a.com/p?reference=kept")
  }

  test("all-tracking query string vanishes entirely (no dangling '?')") {
    assert(canon("http://a.com/p?utm_source=x&utm_medium=y") == "http://a.com/p")
  }

  test("trailing slash strips; rules compose") {
    assert(canon("http://a.com/p/") == "http://a.com/p")
    assert(canon("z http://A.com/p/?utm_source=x&q=1#f") == "http://a.com/p?q=1")
  }

  test("no URL -> empty string; null-safe") {
    assert(canon("no urls here") == "")
    val s = spark
    import s.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(Curation.canonicalizeUrl(col("t")).as("c")).collect()(0).getString(0)
    assert(out == "")
  }

  test("noise variants of one address all fold to one canonical id") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://A.com/p?utm_source=x"),
      (2L, "http://a.com/p#frag"),
      (3L, "http://a.com/p/"),
      (4L, "http://a.com/p"),
      (5L, "http://a.com/other"),
      (6L, "no url"),
    ).toDF("doc_id", "url_text")
    val got = Curation.urlCanonDedup(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L), got.toString)
  }
}
