package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for the greedy longest-match BPE-lite counter: match
  * preference, OOV fallback at code-point granularity, whitespace
  * separation, null/empty safety, codegen-vs-interpreted parity, and a
  * reference-implementation cross-check on corpus text.
  */
class BpeTokenCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("bpe-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val vocab = Seq("table", "tab", "le", "value", "val", "ue", "an", "a", "s", "é")

  private def countOne(text: String, v: Seq[String] = vocab): Long = {
    import spark.implicits._
    Seq(text).toDF("t").select(BpeTokenCount(col("t"), v).as("n")).head().getLong(0)
  }

  /** Straightforward per-word reference: greedy longest match over chars. */
  private def reference(text: String, v: Seq[String]): Long = {
    val sorted = v.sortBy(-_.length)
    text.split("\\s+").filter(_.nonEmpty).map { w =>
      var i = 0
      var n = 0L
      while (i < w.length) {
        sorted.find(t => w.regionMatches(i, t, 0, t.length)) match {
          case Some(t) => i += t.length
          case None    => i += Character.charCount(w.codePointAt(i))
        }
        n += 1
      }
      n
    }.sum
  }

  test("longest match wins: 'table' is one token, not tab+le") {
    assert(countOne("table") == 1L)
    assert(countOne("tab") == 1L)
    assert(countOne("tale") == 3L) // t(OOV) + a + le
  }

  test("greedy decomposition matches the hand computation") {
    // "values" = value + s (greedy takes the 5-char match over val+ue)
    assert(countOne("values") == 2L)
    // "vale" = val + e(OOV): 'e' not in vocab → 1 OOV char
    assert(countOne("vale") == 2L)
    // "banana" = b(OOV) + an + an + a
    assert(countOne("banana") == 4L)
  }

  test("whitespace separates words and is never a token; empty and null are safe") {
    assert(countOne("table value") == 2L)
    assert(countOne("  table \t\n value  ") == 2L)
    assert(countOne("") == 0L)
    assert(countOne("   ") == 0L)
    import spark.implicits._
    val n = Seq[Option[String]](None).toDF("t")
      .select(BpeTokenCount(col("t"), vocab).as("n")).head()
    assert(n.isNullAt(0))
  }

  test("a vocab entry can never span whitespace between words") {
    // 'ta' + 'ble' apart: "ta ble" must NOT match 'table'
    assert(countOne("ta ble") == countOne("ta") + countOne("ble"))
  }

  test("OOV fallback advances one full code point, multi-byte included") {
    // 'é' IS in vocab (2 bytes) — one token; 'ü' is not — one OOV token,
    // not two byte-tokens
    assert(countOne("é") == 1L)
    assert(countOne("ü") == 1L)
    assert(countOne("üü") == 2L)
    // 4-byte astral plane code point, absent from vocab → one OOV token
    assert(countOne(new String(Character.toChars(0x1F600))) == 1L)
  }

  test("vocab preconditions are enforced") {
    intercept[IllegalArgumentException](countOne("x", Seq.empty))
    intercept[IllegalArgumentException](countOne("x", Seq("a b")))
    intercept[IllegalArgumentException](countOne("x", Seq("a", "a")))
    intercept[IllegalArgumentException](countOne("x", Seq("")))
  }

  private def idsOne(text: String, v: Seq[String] = vocab): Seq[Long] = {
    import spark.implicits._
    Seq(text).toDF("t").select(BpeTokenize(col("t"), v).as("ids"))
      .head().getSeq[Long](0)
  }

  test("tokenize: 1-based vocab ids in greedy order, 0 for OOV, size equals count") {
    // "values" = value(4) + s(9); "banana" = b(OOV=0) + an(7) + an(7) + a(8)
    assert(idsOne("values") == Seq(4L, 9L))
    assert(idsOne("banana") == Seq(0L, 7L, 7L, 8L))
    assert(idsOne("table tab") == Seq(1L, 2L))
    assert(idsOne("") == Seq.empty)
    // invariant: the id sequence length IS the count, on corpus text too
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull).limit(50)
    val v = graft.operators.TextAnalysis.BpeVocab
    val bad = docs.select(
        size(BpeTokenize(col("text"), v)).cast("long").as("a"),
        BpeTokenCount(col("text"), v).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
    // ids decode back to the exact consumed entries where nothing is OOV
    assert(idsOne("values").map(i => vocab(i.toInt - 1)).mkString == "values")
  }

  test("fuzz: random overlapping vocabs and multi-byte texts match the reference, both faces") {
    import spark.implicits._
    val alphabet = "abcdé€" // mixed 1/2/3-byte UTF-8
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      def randTok(maxLen: Int): String =
        (0 until (1 + rnd.nextInt(maxLen))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // distinct vocab with deliberately overlapping prefixes (short
      // entries are prefixes of longer ones with high probability on a
      // 6-char alphabet) — the greedy longest-match stressor
      val v = Iterator.continually(randTok(4)).distinct.take(8 + rnd.nextInt(8)).toSeq
      val texts = (0 until 30).map { _ =>
        (0 until rnd.nextInt(8)).map(_ => randTok(6)).mkString(" ")
      }
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val got = df.select(col("id"), BpeTokenCount(col("t"), v).as("n"),
          BpeTokenize(col("t"), v).as("ids"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (n, ids) = got(i.toLong)
        assert(n == reference(t, v), s"seed=$seed count mismatch on '$t' vocab=$v")
        assert(ids.length == n, s"seed=$seed size!=count on '$t'")
        // every non-OOV id decodes to an entry that matches at its spot —
        // reconstruct by replaying the greedy walk over the words
        val sorted = v.sortBy(-_.length)
        val replayed = t.split("\\s+").filter(_.nonEmpty).flatMap { w =>
          val out = scala.collection.mutable.ArrayBuffer[Long]()
          var p = 0
          while (p < w.length) {
            sorted.find(e => w.regionMatches(p, e, 0, e.length)) match {
              case Some(e) => out += (v.indexOf(e) + 1).toLong; p += e.length
              case None    => out += 0L; p += Character.charCount(w.codePointAt(p))
            }
          }
          out
        }.toSeq
        assert(ids == replayed, s"seed=$seed id sequence mismatch on '$t' vocab=$v")
      }
    }
  }

  test("OOV accounting: zeros in the id stream equal the per-word OOV code points") {
    import spark.implicits._
    // vocab covers ascii letters a/b/cd; 'é' and 'x' are OOV (é is
    // multi-byte — one zero per CODE POINT, not per byte)
    val v = Seq("a", "b", "cd")
    val rows = Seq("a b cd", "ax éb", "ééé").toDF("t")
      .select(BpeTokenize(col("t"), v).as("ids"))
      .select(size(col("ids")).cast("long").as("n"),
        (size(col("ids")) - size(array_remove(col("ids"), lit(0L)))).cast("long").as("z"))
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((3L, 0L), (4L, 2L), (3L, 3L)))
  }

  test("parity with the reference implementation on real corpus text, codegen on") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull).limit(60)
    val v = graft.operators.TextAnalysis.BpeVocab
    val got = docs.select(col("doc_id"), BpeTokenCount(col("text"), v).as("n"))
      .as[(Long, Long)].collect().toMap
    val want = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> reference(t, v) }.toMap
    assert(got == want)
    assert(got.values.sum > 0)
  }
}
