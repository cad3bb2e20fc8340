package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** scriptStats pins: counts per block, the greatest-then-first-match
  * argmax (ties to the EARLIER block), the all-zero 'und' arm, and
  * null-safety.
  */
class ScriptStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("script-stats-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def row(text: String): (Seq[Long], String) = {
    val s = spark
    import s.implicits._
    val r = TextAnalysis.scriptStats(Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
    (TextAnalysis.ScriptRanges.indices.map(i => r.getLong(i + 1)), r.getString(6))
  }

  test("per-block counts: mixed text counted exactly") {
    val (counts, script) = row("ab мир 你好 γ!")
    // latin 2, cyrillic 3, greek 1, cjk 2, arabic 0
    assert(counts == Seq(2L, 3L, 1L, 2L, 0L), counts.toString)
    assert(script == "cyrillic")
  }

  test("tie goes to the earlier block in ScriptRanges order") {
    // 2 latin vs 2 cyrillic: latin declared first wins
    assert(row("ab мм")._2 == "latin")
    // 2 cyrillic vs 2 greek: cyrillic precedes greek
    assert(row("12 мм γγ !?")._2 == "cyrillic")
  }

  test("no script characters -> und; digits/punct never count") {
    assert(row("123 456 !?")._2 == "und")
    assert(row("")._2 == "und")
  }

  test("null text -> und with zero counts") {
    val s = spark
    import s.implicits._
    val r = TextAnalysis.scriptStats(
      Seq((1L, Option.empty[String])).toDF("doc_id", "text")).collect()(0)
    assert((1 to 5).forall(i => r.getLong(i) == 0L) && r.getString(6) == "und")
  }

  test("accented Latin (the C0/C1 extension block) counts as latin") {
    assert(row("résumé naïve")._2 == "latin")
  }
}
