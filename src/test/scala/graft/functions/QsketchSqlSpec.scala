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

  test("integral widths widen in place: INT literals and INT columns work (r17 advice)") {
    // qsketch_bucket(42) — a plain INT literal — and INT/SMALLINT bucket
    // columns (e.g. written by another engine) must analyze and match the
    // kernel, like the built-ins
    val r = spark.sql(
      """SELECT qsketch_bucket(42),
                qsketch_lo(CAST(20 AS INT)),
                qsketch_hi(CAST(959 AS SMALLINT))""").head
    assert(r.getLong(0) == LogHistogram.bucket(42L).toLong)
    assert(r.getLong(1) == LogHistogram.lowerBound(20))
    assert(r.getLong(2) == Long.MaxValue)
    val s = spark
    import s.implicits._
    Seq(1, 100, 5000).toDF("v").createOrReplaceTempView("intcol") // IntegerType column
    val got = spark.sql("SELECT v, qsketch_bucket(v) FROM intcol ORDER BY v").collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 100 -> 102L, 5000 -> 132L).map {
      case (k, _) => k -> LogHistogram.bucket(k.toLong).toLong
    }, got)
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
