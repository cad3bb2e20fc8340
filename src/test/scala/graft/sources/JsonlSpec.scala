package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** The JSONL interchange contract: round-trip identity on hostile text
  * (newlines, quotes, backslashes, unicode, nulls), and corrupt-line
  * classification instead of job failure.
  */
class JsonlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("jsonl-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_jsonl").toString

  test("round-trip identity incl. embedded newlines, quotes, unicode, null text") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "line one\nline two\nline three", "en", "src0", 30L),
      (2L, "quote \" backslash \\ tab\tdone", "en", "src1", 28L),
      (3L, "中文 текст emoji éü", "zh", "src2", 15L),
      (4L, null.asInstanceOf[String], "en", "src3", 0L),
    )
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmp()
    Jsonl.write(df, dir)
    // Spark disallows querying ONLY the corrupt column straight off the
    // raw file source — cache first (its own documented recipe)
    val back = Jsonl.read(spark, dir).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
    val got = back.drop("_corrupt_record").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    val want = rows.map { case (a, b, c, d, e) => (a, Option(b), c, d, e) }.toSet
    assert(got == want)
  }

  test("real corpus round-trips through JSONL with planted multi-line text") {
    val docs = graft.operators.Dedup
      .linedText(Tables(spark, "/root/testdata/sf0.001", "documents"))
      .select(col("doc_id"), col("ltext").as("text"), col("lang"),
        col("source"), col("n_chars"))
    val dir = tmp()
    Jsonl.write(docs, dir, nFiles = 3)
    val back = Jsonl.read(spark, dir).drop("_corrupt_record")
    val a = docs.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val b = back.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(a == b, s"sizes ${a.size}/${b.size}")
  }

  test("corrupt lines classify into _corrupt_record; clean lines still parse") {
    val dir = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      ("""{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}""" + "\n" +
        """{"doc_id": broken not json""" + "\n" +
        """{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}""" + "\n")
        .getBytes("UTF-8"))
    val back = Jsonl.read(spark, dir).cache()
    assert(back.count() == 3)
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(back.filter(col("_corrupt_record").isNull).count() == 2)
    assert(back.filter(col("doc_id") === 2L).head.getString(1) == "also good")
  }

  test("re-reading a dump whose schema already carries _corrupt_record works") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    Jsonl.write(Seq((1L, "ok", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val classified = Jsonl.read(spark, dir)
    // the classified frame's own schema (incl. _corrupt_record) must be
    // accepted verbatim — no duplicate-column failure
    val again = Jsonl.read(spark, dir, classified.schema).cache()
    assert(again.count() == 1)
    assert(again.filter(col("_corrupt_record").isNull).count() == 1)
  }
}
