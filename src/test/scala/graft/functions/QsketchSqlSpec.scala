package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** SQL faces of the quantile-sketch arithmetic: registry presence,
  * value parity with the Scala kernel over the boundary sweep, NULL
  * propagation, the out-of-domain NULL contract, and the declarative
  * SQL histogram (GROUP BY qsketch_bucket) matching the registered
  * Aggregator face.
  */
class QsketchSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("qsketch-sql-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("qsketch_bucket/lo/hi match the kernel on the boundary sweep; nulls propagate") {
    val s = spark
    import s.implicits._
    val sweep = Seq(0L, 1L, 15L, 16L, 17L, 31L, 32L, 44L, 558L, 1024L,
      (1L << 40) - 1, 1L << 40, Long.MaxValue)
    sweep.toDF("v").createOrReplaceTempView("sweep")
    spark.sql(
      """SELECT v, qsketch_bucket(v) AS b,
                qsketch_lo(qsketch_bucket(v)) AS lo,
                qsketch_hi(qsketch_bucket(v)) AS hi
         FROM sweep""").collect().foreach { r =>
      val v = r.getLong(0)
      val b = LogHistogram.bucket(v)
      assert(r.getLong(1) == b.toLong, s"bucket($v)")
      assert(r.getLong(2) == LogHistogram.lowerBound(b), s"lo($v)")
      assert(r.getLong(3) == LogHistogram.upperBound(b), s"hi($v)")
    }
    // negative clamps to bucket 0 (the Aggregator's corrupt-length arm)
    assert(spark.sql("SELECT qsketch_bucket(CAST(-5 AS BIGINT))").head.getLong(0) == 0L)
    // NULL in, NULL out; out-of-domain bucket decodes to NULL, not an error
    val nulls = spark.sql(
      """SELECT qsketch_bucket(CAST(NULL AS BIGINT)),
                qsketch_lo(CAST(960 AS BIGINT)),
                qsketch_hi(CAST(-1 AS BIGINT))""").head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("declarative SQL histogram == the registered Aggregator face") {
    val dir = "/root/testdata/sf0.001"
    graft.Tables(spark, dir, "documents").createOrReplaceTempView("documents")
    val sqlHist = spark.sql(
      """SELECT source, qsketch_bucket(COALESCE(n_chars, 0)) AS bucket, COUNT(*) AS cnt
         FROM documents GROUP BY source, bucket""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val aggHist = graft.operators.TextAnalysis
      .qsketchHistogram(graft.Tables(spark, dir, "documents"))
      .select("source", "bucket", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlHist == aggHist)
  }
}
