package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Checkpoint-recovery equality: killing a stateful streaming query with a
  * batch in flight and restarting it from its checkpoint must reproduce
  * the uninterrupted run's outputs exactly (state store + watermark
  * reloaded, in-flight batch replayed, batchId-keyed sink idempotent).
  */
class RestartProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("restart-probe-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val corpus: Array[(Long, String)] = {
    import spark.implicits._
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].limit(120).collect()
  }

  test("dedupNearMinHash: restart-from-checkpoint equals uninterrupted") {
    val work = java.nio.file.Files.createTempDirectory("restart_spec_dedup").toString
    def build(d: org.apache.spark.sql.DataFrame) = DocStream.dedupNearMinHash(d)
    val base = RestartProbe.drive(spark, corpus, build, 4, -1, s"$work/base")
    val rst = RestartProbe.drive(spark, corpus, build, 4, 2, s"$work/restart")
    assert(base.values.sum == corpus.length * 4)
    assert(base == rst)
  }

  test("deconFilter: restart-from-checkpoint equals uninterrupted (stateless arm)") {
    import spark.implicits._
    // test split: the first 10 corpus texts — the remaining 110 replayed
    // docs must gate identically across the kill/restart boundary
    val testSplit = corpus.take(10).toSeq.toDF("doc_id", "text")
    val directory = graft.operators.Dedup.substrDirectory(testSplit)
    val work = java.nio.file.Files.createTempDirectory("restart_spec_decon").toString
    def build(d: org.apache.spark.sql.DataFrame) = DocStream.deconFilter(d, directory)
    val base = RestartProbe.drive(spark, corpus, build, 4, -1, s"$work/base")
    val rst = RestartProbe.drive(spark, corpus, build, 4, 2, s"$work/restart")
    assert(base.values.sum > 0 && base.values.sum < corpus.length * 4,
      s"vacuous gate: ${base.values.sum} of ${corpus.length * 4} passed")
    assert(base == rst)
  }

  test("lmScoreByWindow: restart-from-checkpoint equals uninterrupted") {
    val lm = graft.operators.Curation.lmTable(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents")).localCheckpoint(true)
    val work = java.nio.file.Files.createTempDirectory("restart_spec_lm").toString
    def build(d: org.apache.spark.sql.DataFrame) = DocStream.lmScoreByWindow(d, lm)
    val base = RestartProbe.drive(spark, corpus, build, 4, -1, s"$work/base")
    val rst = RestartProbe.drive(spark, corpus, build, 4, 2, s"$work/restart")
    // append mode holds the final batch's window open — 3 of 4 batches emit
    assert(base.values.sum == corpus.length * 3)
    assert(base == rst)
  }
}
