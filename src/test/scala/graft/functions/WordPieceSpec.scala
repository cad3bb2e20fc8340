package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.operators.TextAnalysis

/** WordPiece semantics pins: the two rules that distinguish it from the
  * BPE faces — position-dependent vocab faces and whole-word UNK with
  * piece discard — plus longest-match at both faces, multi-word layout,
  * and validation guards.
  */
class WordPieceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("wordpiece-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val vocab = Seq(
    "un", "##afford", "##able", "afford", "a", "##a", "##b", "b", "##un")

  private def ids(text: String, v: Seq[String] = vocab): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("t")
      .select(TextAnalysis.wordpieceTokenize(col("t"), v).as("ids"))
      .collect()(0).getSeq[Long](0).toSeq
  }

  private def idOf(entry: String): Long = (vocab.indexOf(entry) + 1).toLong

  test("continuation pieces compose: unaffordable -> un ##afford ##able") {
    assert(ids("unaffordable") ==
      Seq(idOf("un"), idOf("##afford"), idOf("##able")))
  }

  test("whole-word UNK discards already-matched pieces") {
    // unaffordablez: un ##afford ##able then 'z' fails -> the WHOLE word
    // is one UNK, not three pieces plus a failure
    assert(ids("unaffordablez") == Seq(0L))
  }

  test("initial-position failure is UNK (continuation face never applies at pos 0)") {
    // 'afford' exists but '##afford' must not match word-initially:
    // 'affordx' starts with 'afford' (init face), then x fails -> UNK;
    // 'zb' has no init 'z' -> UNK immediately
    assert(ids("zb") == Seq(0L))
  }

  test("init and continuation faces are distinct id spaces") {
    // 'aa' = init 'a' + cont '##a'; 'ab' = init 'a' + cont '##b'
    assert(ids("aa") == Seq(idOf("a"), idOf("##a")))
    assert(ids("ab") == Seq(idOf("a"), idOf("##b")))
  }

  test("greedy longest-match on the continuation face") {
    // 'unun': init 'un', then cont '##un' (length 2) must beat nothing
    // shorter since ##u absent; succeeds as two pieces
    assert(ids("unun") == Seq(idOf("un"), idOf("##un")))
  }

  test("multi-word text tokenizes per word; whitespace never consumed") {
    assert(ids("a b") == Seq(idOf("a"), idOf("b")))
    assert(ids("  a \t b \n") == Seq(idOf("a"), idOf("b")))
    assert(ids("") == Seq.empty)
  }

  test("fixture vocab exercises every arm on the corpus word stock") {
    val v = TextAnalysis.WordPieceVocab
    def of(e: String) = (v.indexOf(e) + 1).toLong
    // whole-word longest match beats prefix pieces
    assert(ids("table", v) == Seq(of("table")))
    assert(ids("value", v) == Seq(of("value")))
    // multi-char continuation longest match: ##dow beats ##d
    assert(ids("window", v) == Seq(of("win"), of("##dow")))
    // init-position failure (no 'p'/'q' init entries)
    assert(ids("part", v) == Seq(0L))
    assert(ids("query", v) == Seq(0L))
    // mid-word failure discards matched pieces (no ##p)
    assert(ids("group", v) == Seq(0L))
    assert(ids("spark", v) == Seq(0L))
    // plain decomposition
    assert(ids("big", v) == Seq(of("b"), of("##i"), of("##g")))
  }

  test("validation: empty vocab, whitespace entries, bare ## rejected") {
    intercept[IllegalArgumentException](ids("x", Seq.empty))
    intercept[IllegalArgumentException](ids("x", Seq("a b")))
    intercept[IllegalArgumentException](ids("x", Seq("##")))
    intercept[IllegalArgumentException](ids("x", Seq("a", "a")))
  }
}
