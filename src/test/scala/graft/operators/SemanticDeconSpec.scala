package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** Specs for semantic decontamination: the broadcast asymmetric kernel
  * must agree exactly with the symmetric pair kernel restricted to
  * cross-split pairs, and the eval-split broadcast guard must fail loudly.
  */
class SemanticDeconSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("semantic-decon-spec").getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("decon set == symmetric quantized pairs restricted to cross-split, hit counts match") {
    val emb = Tables(spark, sfDir, "embeddings")
    val bkt = TextAnalysis.splitBucket(col("vec_id"))
    val split = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), (bkt >= 90).as("is_test"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // reference: ALL symmetric pairs at the same threshold, then keep
    // (train, test) crossings and aggregate per train id
    val pairs = Similarity
      .quantizedPairsAbove(emb, tNum = 7, tDen = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .flatMap { case (a, b) =>
        (split(a), split(b)) match {
          case (false, true) => Seq(a -> b)
          case (true, false) => Seq(b -> a)
          case _             => Seq.empty
        }
      }
      .groupBy(_._1)
      .map { case (tr, hits) =>
        tr -> ((hits.length.toLong, hits.map(_._2).min))
      }
    val got = Similarity.semanticDecon(emb, tNum = 7, tDen = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got=${got.size} expected=${expected.size}")
    assert(got.nonEmpty, "fixture must make the decon arm non-vacuous")
  }

  test("broadcast guard: a test split past the row bound fails loudly, not OOM") {
    val emb = Tables(spark, sfDir, "embeddings")
    spark.conf.set(Similarity.MaxBroadcastRowsKey, "1")
    try {
      val e = intercept[IllegalArgumentException](Similarity.semanticDecon(emb))
      assert(e.getMessage.contains("broadcast") && e.getMessage.contains("bound"))
    } finally spark.conf.unset(Similarity.MaxBroadcastRowsKey)
  }

  test("null vectors drop on both sides; testPct validated") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.05f)),
    ).toDF("vec_id", "embedding")
      .union(Seq((3L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    // ids 1,2 both land in train at this split (md5 buckets), so no hits —
    // the point is only that the null row never reaches a kernel
    Similarity.semanticDecon(tiny).collect()
    intercept[IllegalArgumentException](Similarity.semanticDecon(tiny, testPct = 0))
    intercept[IllegalArgumentException](Similarity.semanticDecon(tiny, testPct = 100))
  }
}
