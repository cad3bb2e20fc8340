package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The tokenizer families through the SQL function registry
  * (GraftExtensions): each SQL face must equal its Column-API twin, and
  * non-literal vocabularies must fail at plan time, not mid-job.
  */
class TokenizerSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("tokenizer-sql-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bpe_token_count / bpe_tokenize SQL == Column API") {
    val s = spark
    import s.implicits._
    Seq((1L, "table value scan"), (2L, "qqq")).toDF("id", "t")
      .createOrReplaceTempView("tok_docs")
    val vocabSql = graft.operators.TextAnalysis.BpeVocab
      .map(v => s"'$v'").mkString("array(", ", ", ")")
    val viaSql = spark.sql(
      s"SELECT id, bpe_token_count(t, $vocabSql) AS n, bpe_tokenize(t, $vocabSql) AS ids FROM tok_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toMap2
    val viaCol = Seq((1L, "table value scan"), (2L, "qqq")).toDF("id", "t")
      .select($"id",
        graft.operators.TextAnalysis.bpeTokenCount($"t").as("n"),
        graft.operators.TextAnalysis.bpeTokenize($"t").as("ids"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toMap2
    assert(viaSql == viaCol)
  }

  test("wordpiece_tokenize SQL == Column API (both UNK arms live)") {
    val s = spark
    import s.implicits._
    Seq((1L, "table window part group")).toDF("id", "t")
      .createOrReplaceTempView("wp_docs")
    val vocabSql = graft.operators.TextAnalysis.WordPieceVocab
      .map(v => s"'$v'").mkString("array(", ", ", ")")
    val got = spark.sql(s"SELECT wordpiece_tokenize(t, $vocabSql) AS ids FROM wp_docs")
      .collect()(0).getSeq[Long](0).toSeq
    val want = Seq((1L, "table window part group")).toDF("id", "t")
      .select(graft.operators.TextAnalysis.wordpieceTokenize($"t").as("ids"))
      .collect()(0).getSeq[Long](0).toSeq
    assert(got == want && got.contains(0L))
  }

  test("unigram_tokenize SQL == Column API (Viterbi arm live)") {
    val s = spark
    import s.implicits._
    Seq((1L, "scan table query")).toDF("id", "t")
      .createOrReplaceTempView("ug_docs")
    val v = graft.operators.TextAnalysis.UnigramVocab
    val piecesSql = v.map(p => s"'${p._1}'").mkString("array(", ", ", ")")
    val scoresSql = v.map(p => s"${p._2}L").mkString("array(", ", ", ")")
    val got = spark.sql(
      s"SELECT unigram_tokenize(t, $piecesSql, $scoresSql) AS ids FROM ug_docs")
      .collect()(0).getSeq[Long](0).toSeq
    val want = Seq((1L, "scan table query")).toDF("id", "t")
      .select(graft.operators.TextAnalysis.unigramTokenize($"t").as("ids"))
      .collect()(0).getSeq[Long](0).toSeq
    assert(got == want && got.contains(0L))
  }

  test("non-literal vocabulary fails at plan time") {
    val s = spark
    import s.implicits._
    Seq((1L, "x")).toDF("id", "t").createOrReplaceTempView("bad_docs")
    val e = intercept[Exception](
      spark.sql("SELECT bpe_tokenize(t, array(t)) FROM bad_docs").collect())
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  private implicit class Tupled(rows: Array[(Long, Long, Seq[Long])]) {
    def toMap2: Map[Long, (Long, Seq[Long])] =
      rows.map { case (id, n, ids) => id -> ((n, ids)) }.toMap
  }
}
