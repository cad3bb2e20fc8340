package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** word2vec phrase-score pins: a collocation that ONLY ever co-occurs
  * outranks frequent-but-independent pairs, the δ discount kills
  * singletons, and the sequential-division ppm score matches the direct
  * rational on small counts.
  */
class PmiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("pmi-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def topOf(rows: Seq[String], k: Int = 10) = {
    val s = spark
    import s.implicits._
    Curation.pmiTopK(rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
  }

  test("a pure collocation outranks frequent independent pairs") {
    // "new york" always together (5×); "the cat"/"the dog"/"cat the"…
    // mix freely so each pairing is diluted by its parts' frequencies
    val docs = Seq(
      "new york new york new york",
      "new york new york",
      "the cat the dog the cat the dog",
      "the dog the cat the dog the cat",
      "cat dog the cat dog the",
    )
    val top = topOf(docs)
    assert(top.nonEmpty)
    assert(top.head._1 == "new york", top.mkString("; "))
  }

  test("delta discount: bigrams at count <= delta never appear") {
    val top = topOf(Seq("alpha beta", "gamma delta"), k = 20)
    assert(top.isEmpty, top.mkString("; "))
  }

  test("sequential ppm division equals the direct rational on known counts") {
    // corpus: "a b a b" ×3 docs → cab(a b)=6, cab(b a)=3, ca=cb=6
    val docs = Seq.fill(3)("a b a b")
    val byBigram = topOf(docs).map(t => t._1 -> t._3).toMap
    // (6-1)*1e6 / (6*6) = 138888.88 → floor chain: 5e6/6=833333, /6=138888
    assert(byBigram("a b") == 138888L, byBigram.toString)
    // (3-1)*1e6/(6*6) = 55555.55 → 2e6/6=333333, /6=55555
    assert(byBigram("b a") == 55555L, byBigram.toString)
  }
}
