package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for the Gopher-style rules filter, the dataset card,
  * and the distinctive-terms (tf-idf skeleton) ranking.
  */
class QualityRulesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("quality-rules-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // 60 words, 31 distinct (ratio ≥ 1/2), stopword-rich, mean length ≥ 4
  private val longGood =
    (1 to 30).flatMap(i => Seq("the", s"token$i")).mkString(" ")

  test("each rule flags its own failure mode and the conjunction demands all four") {
    val d = docs(
      1L -> longGood,                               // passes all
      2L -> "short text only",                      // fails ok_words (3 < 30)
      3L -> (Seq.fill(40)("a").mkString(" ") + " the value"), // fails mean-len (mostly 1-char)
      4L -> (Seq.fill(15)("table value row scan").mkString(" ") + " extra"), // no stopwords? "the" absent
      5L -> null,
    )
    val r = TextAnalysis.qualityRules(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap
    assert(r(1L) == ((1L, 1L, 1L, 1L, 1L)))
    assert(r(2L)._1 == 0L && r(2L)._5 == 0L)
    assert(r(3L)._2 == 0L && r(3L)._5 == 0L)
    // doc 4: 61 words of a 4-word vocab — fails both stopwords and distinct-ratio
    assert(r(4L)._3 == 0L && r(4L)._4 == 0L && r(4L)._5 == 0L)
    // null text coalesces to "" → 1 empty token, fails word count, never NPEs
    assert(r(5L)._1 == 0L && r(5L)._5 == 0L)
  }

  test("stopword occurrence counting is overlap-safe (adjacent matches all count)") {
    val d = docs(1L -> "a a a")
    val n = d.select(TextAnalysis.wordOccurrences(col("text"), "a")).head.getLong(0)
    assert(n == 3L) // the naive replace-count trick would see 2
  }

  test("dataset card equals per-doc recomputation and counts injected exact dups") {
    val d = docs(
      1L -> longGood, 2L -> longGood, 3L -> longGood, // 3 copies → 2 exact dups
      4L -> "tiny doc",
    ).withColumn("source", concat(lit("s"), col("doc_id") % 2))
      .withColumn("lang", lit("en"))
    val card = TextAnalysis.datasetCard(d).head
    assert(card.getLong(0) == 4L)                // n_docs
    assert(card.getLong(1) == 2L)                // n_sources
    assert(card.getLong(2) == 1L)                // n_langs
    assert(card.getLong(5) == 2L)                // n_exact_dup_docs
    val passSum = TextAnalysis.qualityRules(d).agg(sum("pass")).head.getLong(0)
    assert(card.getLong(6) == passSum)           // card ≡ per-doc face
    val tokSum = d.select(TextAnalysis.tokenCount(col("text")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(card.getLong(3) == tokSum)
  }

  test("tfidf top-k ranks tf-major with rare-term tie-break and caps at k") {
    // doc 1: "x x x common rare"; x is unique to doc1 (tf 3, df 1) → rank 1;
    // common appears in both docs (df 2), rare only in doc1 (df 1): both
    // tf 1 → rare wins the df tie-break over common.
    val d = docs(
      1L -> "x x x common rare",
      2L -> "common other words here",
    )
    val top = TextAnalysis.tfidfTopK(d, kTop = 3)
      .filter(col("doc_id") === 1L).orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(top.toSeq == Seq((1L, "x", 3L, 1L), (2L, "rare", 1L, 1L), (3L, "common", 1L, 2L)))
    // k caps: doc 2 has 4 distinct terms but only 3 rows emerge
    assert(TextAnalysis.tfidfTopK(d, kTop = 3).filter(col("doc_id") === 2L).count() == 3L)
  }

  test("curation funnel stages equal their component faces and decrease monotonically") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents")
    val rows = graft.SparkEntry.queries("c_curation_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("1_raw", "2_dedup", "3_quality"))
    assert(rows("1_raw")._1 == docs.count())
    val kept = docs.join(
      MinHash.nearDupCanonicalMd5(docs).filter(col("canonical_id") === col("doc_id"))
        .select("doc_id"), Seq("doc_id"))
    assert(rows("2_dedup")._1 == kept.count())
    assert(rows("3_quality")._1 == kept.filter(TextAnalysis.qualityPass(col("text"))).count())
    assert(rows("1_raw")._1 >= rows("2_dedup")._1 && rows("2_dedup")._1 >= rows("3_quality")._1)
    assert(rows("1_raw")._2 >= rows("2_dedup")._2 && rows("2_dedup")._2 >= rows("3_quality")._2)
  }

  test("tfidf ranking is invariant under input partitioning") {
    val d8 = docs((1L to 40L).map(i => i -> s"w$i shared tok${i % 5} the value"): _*)
    val a = TextAnalysis.tfidfTopK(d8.repartition(8), kTop = 2)
      .orderBy("doc_id", "rk").collect().toSeq
    val b = TextAnalysis.tfidfTopK(d8.coalesce(1), kTop = 2)
      .orderBy("doc_id", "rk").collect().toSeq
    assert(a == b)
  }

  test("lengthQuantiles: discrete ceil-index semantics, ties, single-doc source, null text") {
    val s = spark
    import s.implicits._
    // source A lengths: 1,2,2,3,10 (n=5): idx50=ceil(2.5)=3 → 2;
    // idx90=ceil(4.5)=5 → 10; idx99=ceil(4.95)=5 → 10
    // source B: single doc of 4 tokens → every quantile = 4
    // source C: null text → 0 tokens
    val df = Seq(
      (0L, "a", "A"), (1L, "a b", "A"), (2L, "c d", "A"),
      (3L, "a b c", "A"), (4L, (1 to 10).map(i => s"w$i").mkString(" "), "A"),
      (5L, "p q r s", "B"),
      (6L, null.asInstanceOf[String], "C"),
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.lengthQuantiles(df)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      "A" -> ((5L, 2L, 10L, 10L)),
      "B" -> ((1L, 4L, 4L, 4L)),
      "C" -> ((1L, 0L, 0L, 0L))))
    // partitioning-invariant (histogram + window, no per-source sort)
    val again = TextAnalysis.lengthQuantiles(df.repartition(7))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(again == got)
  }
}
