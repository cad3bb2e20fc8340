package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for registered-query edge cases the shipped corpora
  * cannot exercise (the advice-review class: latent until the data gets
  * weirder).
  */
class QueryRegressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("query-regression").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("a4_hll_estimate_check keeps a NULL event_type group's true count (null-safe join)") {
    // the sf corpora carry no NULL event_type, so the <=> join fix is
    // latent there: a plain equi-join would drop the NULL key's aggregate
    // row and misreport n_exact=0 while the DuckDB oracle's GROUP BY
    // keeps the group with its true distinct count
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nullet").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, t0, "click"),
      (2L, t0, "click"),
      (3L, t0, null.asInstanceOf[String]),
      (4L, t0, null.asInstanceOf[String]),
      (5L, t0, null.asInstanceOf[String]),
    ).toDF("user_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a4_hll_estimate_check")(spark, dir).collect()
    assert(out.length == 2, out.mkString(","))
    val nullRow = out.find(_.isNullAt(0)).getOrElse(fail(s"NULL group missing: ${out.mkString(",")}"))
    assert(nullRow.getLong(1) == 3L && nullRow.getBoolean(2),
      s"NULL event_type group must report its true distinct count: $nullRow")
    val clickRow = out.find(r => !r.isNullAt(0) && r.getString(0) == "click").get
    assert(clickRow.getLong(1) == 2L && clickRow.getBoolean(2))
  }
}
