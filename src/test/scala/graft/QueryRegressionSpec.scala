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

  test("Tables.events normalizes a TIMESTAMP_NTZ ts column (pandas-written parquet)") {
    // round-12 regression: the driver's regenerated testdata stores ts as
    // timestamp[us] WITHOUT timezone, which Spark reads as TIMESTAMP_NTZ —
    // and `cast(ts as long)` on NTZ fails analysis outright
    // (DATATYPE_MISMATCH), taking down every events-family query. The fix
    // hops NTZ → TimestampType (UTC session) → long; pin both the value
    // semantics and an end-to-end FSM query over such a dir.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val utc = java.time.ZoneOffset.UTC
    val rows = Seq(
      (1L, java.time.LocalDateTime.ofEpochSecond(1700000000L, 0, utc), 10L, "click"),
      (2L, java.time.LocalDateTime.ofEpochSecond(1700000060L, 500000000, utc), 10L, "view"),
    ).toDF("event_id", "ts", "user_id", "event_type")
    assert(rows.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType,
      "parquet round-trip must preserve NTZ or this spec pins nothing")
    val got = ev.select("event_id", "ts_sec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1700000000L, s"exact-second value: $got")
    assert(got(2L) == 1700000060L, s"fractional second must floor: $got")

    val n = SparkEntry.queries("m1_fsm_count")(spark, dir).collect()
    assert(n.head.getLong(0) == 1L, "FSM query must analyze and run over an NTZ events dir")
  }

  test("durableTrailEvents honors a repointed graft.durable.root in a live session") {
    // regression: root was read inside a cache keyed only by (session, dir)
    // with a root-less table name, so re-pointing the conf silently kept
    // serving the old files — on a cluster that means node-local /tmp data
    val dir = "/root/testdata/sf0.001"
    val newRoot = java.nio.file.Files.createTempDirectory("graft_durable_alt").toString
    val before = graft.engine.TrckQueries.durableTrailEvents(spark, dir).count()
    spark.conf.set(graft.engine.TrckQueries.DurableRootKey, newRoot)
    try {
      val after = graft.engine.TrckQueries.durableTrailEvents(spark, dir).count()
      assert(after == before, "same corpus, different root: row counts must match")
      val written = new java.io.File(newRoot).listFiles()
      assert(written != null && written.exists(_.getName.startsWith("trails_durable_")),
        s"repointed root must receive the bucketed table, found ${Option(written).map(_.toSeq)}")
    } finally spark.conf.unset(graft.engine.TrckQueries.DurableRootKey)
  }
}
