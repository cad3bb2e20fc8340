package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("skew-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join is row-identical to the plain join under a planted hot key") {
    val s = spark
    import s.implicits._
    // 90% of the fact rows hit one key — the classic skew shape
    val big = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) (i % 7) + 1 else 0
      (k.toLong, i.toLong)
    }.toDF("k", "v")
    val small = (0 to 7).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = rows(big.join(small, "k"))
    val salted = rows(Skew.saltedJoin(big, small, "k", factor = 8))
    assert(salted == plain)
    assert(plain.size == 10000)
  }

  test("salted distinct count is exact (disjoint value-hash partitions)") {
    val s = spark
    import s.implicits._
    // hot key 0 has 5000 distinct values plus repeats; other keys small
    val df = ((1 to 5000).map(i => (0L, s"v$i")) ++ (1 to 2500).map(i => (0L, s"v$i")) ++
      (1 to 50).flatMap(k => (1 to 20).map(i => (k.toLong, s"x$k-$i")))).toDF("k", "value")
    val salted = Skew.saltedDistinctCount(df, "k", "value", factor = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("k").agg(count_distinct(col("value")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == exact)
    assert(salted(0L) == 5000L)
  }

  test("salts are stable under repartitioning (no rand in the plan)") {
    val s = spark
    import s.implicits._
    val big = (1 to 1000).map(i => (0L, i.toLong)).toDF("k", "v")
    val small = Seq((0L, "dim")).toDF("k", "name")
    val a = Skew.saltedJoin(big, small, "k").collect().map(_.toSeq).toSet
    val b = Skew.saltedJoin(big.repartition(13), small, "k").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
