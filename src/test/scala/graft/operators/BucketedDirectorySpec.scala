package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** The 100 TB compaction story for incremental dedup, pinned as a plan:
  * the band-bucket directory is persisted ONCE as a table bucketed on its
  * 64-bit key, and every subsequent ingest batch probes it with NO shuffle
  * on the directory side — only the (small) batch memberships exchange to
  * the directory's bucketing. Re-shuffling a corpus-sized directory per
  * nightly batch is exactly the cost this layout deletes.
  */
class BucketedDirectorySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("bucketed-directory-spec").getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS dedup_dir_bucketed")
    spark.stop()
  }

  test("directory probe == nearDupAgainst flags; bucketed table probes with zero directory-side shuffle") {
    val docs = Tables(spark, sfDir, "documents")
    val bkt = TextAnalysis.splitBucket(col("doc_id"))
    val existing = docs.filter(bkt < 80)
    val incoming = docs.filter(bkt >= 80)

    // semantics: probing the persisted key directory is EXACTLY the
    // corpus-rescan face (hot-bucket policy baked in at build time)
    val dir = MinHash.bucketDirectory64(existing)
    val viaDir = MinHash.nearDupAgainstDirectory(incoming, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaCorpus = MinHash.nearDupAgainst(incoming, existing)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaDir == viaCorpus)
    assert(viaDir.values.exists(identity), "fixture must flag some dups")

    // layout: directory written bucketed on key; the probe join must not
    // exchange the directory side. Broadcast would hide the property at
    // test size (at 100 TB the directory does not broadcast), so force
    // sort-merge; AQE hides exchanges from executedPlan.collect.
    val nBuckets = 8
    spark.sql("DROP TABLE IF EXISTS dedup_dir_bucketed")
    dir.repartition(nBuckets, col("key"))
      .write.bucketBy(nBuckets, "key").sortBy("key")
      .mode("overwrite").saveAsTable("dedup_dir_bucketed")
    val dirTable = spark.table("dedup_dir_bucketed")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probed = MinHash.nearDupAgainstDirectory(incoming, dirTable)
      val plan = probed.queryExecution.executedPlan
      // bucketed scan engaged
      assert(plan.toString.contains("Bucketed: true"), plan.toString.take(3000))
      // the directory side never shuffles: the semi join's right (build)
      // subtree reads the bucketed relation with NO exchange below the
      // join, while the batch memberships side does exchange to the
      // directory's bucketing
      val semi = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType.toString == "LeftSemi" => j
      }
      assert(semi.nonEmpty, plan.toString.take(3000))
      val dirSide = semi.head.right
      assert(dirSide.toString.contains("dedup_dir_bucketed"), dirSide.toString.take(2000))
      assert(dirSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        dirSide.toString.take(2000))
      assert(semi.head.left.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        "batch memberships side expected to exchange to the bucketing")
      // and the flags are still the corpus-rescan flags
      val viaTable = probed.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(viaTable == viaCorpus)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS dedup_dir_bucketed")
    }
  }
}
