package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The codegen'd bloom probe must agree with a driver-side reference probe
  * on hits, misses, empty arrays and null propagation — via both the
  * interpreted eval and the generated code path.
  */
class BloomAnyContainsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("bloom-any-contains-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("probe matches reference semantics: hit, miss, empty, null") {
    val s = spark
    import s.implicits._
    val members = (0L until 1000L).map(_ * 7919L) // the inserted keys
    val bf = BloomFilter.create(members.size.toLong, 0.001)
    members.foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)

    val rows = Seq(
      (1L, Seq(7919L, 1L, 2L)),            // one member → true
      (2L, Seq(1L, 2L, 3L)),               // (almost surely) no members
      (3L, Seq.empty[Long]),               // empty array → false
      (4L, null.asInstanceOf[Seq[Long]]),  // null array → null out
      (5L, members.take(3)),               // all members → true
    ).toDF("id", "hs")
    val got = rows
      .select(col("id"), BloomAnyContains(col("hs"), bc).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    val want = Seq(
      (1L, Seq(7919L, 1L, 2L)), (2L, Seq(1L, 2L, 3L)), (3L, Seq.empty[Long]),
      (4L, null.asInstanceOf[Seq[Long]]), (5L, members.take(3)),
    ).map { case (id, hs) =>
      id -> Option(hs).map(_.exists(bf.mightContainLong))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
  }

  test("generated code path engages and agrees with eval on non-foldable input") {
    val s = spark
    import s.implicits._
    val bf = BloomFilter.create(100L, 0.01)
    (0L until 50L).foreach(i => bf.putLong(i * 3L))
    val bc = spark.sparkContext.broadcast(bf)
    // non-foldable arrays so ConvertToLocalRelation can't pre-evaluate
    val df = spark.range(200).select(array(col("id"), col("id") * 3L).as("hs"))
    val exec = df.select(BloomAnyContains(col("hs"), bc)).queryExecution.executedPlan
    assert(exec.toString.contains("*("), exec.toString) // whole-stage codegen
    val viaCodegen = df.select(BloomAnyContains(col("hs"), bc).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    val reference = (0L until 200L)
      .map(i => Seq(i, i * 3L).exists(bf.mightContainLong))
    assert(viaCodegen == reference)
  }
}
