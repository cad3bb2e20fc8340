package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.trck.Hll

/** `trck_hll` / `trck_hll_estimate` as SQL functions (GraftExtensions):
  * the SQL form must produce the reference RLE-hex byte-identically to
  * both the Column-API aggregator and a driver-side `Hll.add` over the
  * same items — the same sketch semantics HllParitySpec pins against
  * test/tr/test_hll_result.tr's program.
  */
class HllSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("hll-sql-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def directHex(items: Seq[String]): String = {
    val buf = new Array[Byte](Hll.M)
    items.foreach(s => Hll.wrap(buf).add(s.getBytes("UTF-8")))
    Hll.wrap(buf).toHexString
  }

  test("SELECT trck_hll == Column API == direct reference-path sketch") {
    val s = spark
    import s.implicits._
    val items = (1 to 300).map(i => s"user-${i % 97}") // 97 distinct, with dups
    val df = items.toDF("s").withColumn("item", encode(col("s"), "UTF-8"))
    df.createOrReplaceTempView("hll_t")
    val sqlHex = spark.sql("SELECT trck_hll(item) AS sketch FROM hll_t").head.getString(0)
    val colHex = df.agg(HllAggregator.trckHllHex(col("item"))).head.getString(0)
    val direct = directHex(items)
    assert(sqlHex == colHex, "SQL and Column API must serialize identically")
    assert(sqlHex == direct, "SQL sketch must match the driver-side reference path")
    // estimate round-trip, SQL end-to-end
    val est = spark.sql(
      "SELECT trck_hll_estimate(trck_hll(item)) FROM hll_t").head.getDouble(0)
    assert(est == Hll.fromHexString(direct).estimate)
    assert(math.abs(est - 97.0) / 97.0 < 0.05, s"estimate off: $est")
  }

  test("empty and null edge cases: empty sketch form, null-safe estimate") {
    val s = spark
    import s.implicits._
    // a group whose items are all NULL serializes as the reference's
    // empty-sketch form "0e00" (hll_to_string NULL case), not a
    // version-01 RLE of zero registers
    val df = Seq(("g1", Some("x")), ("g2", None), ("g2", None))
      .toDF("g", "s").withColumn("item", encode(col("s"), "UTF-8"))
    val hexes = df.groupBy("g").agg(HllAggregator.trckHllHex(col("item")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hexes("g2") == Hll.EmptyHex, hexes.toString)
    assert(hexes("g1") != Hll.EmptyHex)
    // NULL sketch → NULL estimate (not an NPE), in both the Column UDF and
    // the SQL function
    val nulls = Seq((1, Option.empty[String])).toDF("i", "h")
    assert(nulls.select(HllAggregator.estimateUdf(col("h"))).head.isNullAt(0))
    nulls.createOrReplaceTempView("hll_null_t")
    assert(spark.sql("SELECT trck_hll_estimate(h) FROM hll_null_t").head.isNullAt(0))
    // the empty form estimates 0 distinct
    assert(Hll.fromHexString(Hll.EmptyHex).estimate == 0.0)
  }

  test("grouped + repartitioned SQL sketches merge to per-group reference sketches") {
    val s = spark
    import s.implicits._
    val rows = (1 to 500).map(i => (s"g${i % 3}", s"item-${i % 131}"))
    // shuffle-heavy layout so partial aggregation exercises the register merge
    val df = rows.toDF("k", "s").repartition(13)
      .withColumn("item", encode(col("s"), "UTF-8"))
    df.createOrReplaceTempView("hll_g")
    val sqlByKey = spark.sql(
      "SELECT k, trck_hll(item) AS sketch FROM hll_g GROUP BY k")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = rows.groupBy(_._1).map { case (k, kv) => k -> directHex(kv.map(_._2)) }
    assert(sqlByKey == expected)
  }
}
