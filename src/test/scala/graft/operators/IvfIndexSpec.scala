package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** The IVF train-once/serve-forever lifecycle: a persisted quantizer must
  * reload bit-exact and serve IDENTICAL top-k, and the loader must fail
  * fast on a corrupted index rather than silently remapping cells.
  */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("ivf-index-spec").getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("persisted quantizer reloads bit-exact and serves identical top-k") {
    val emb = Tables(spark, sfDir, "embeddings")
    val cent = Similarity.ivfCentroids(emb, nCells = 8, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.saveCentroids(spark, cent, dir)
    val loaded = Similarity.loadCentroids(spark, dir)
    assert(loaded.length == cent.length)
    cent.zip(loaded).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "float centroids must round-trip bit-exact")
    }
    val queries = emb.filter(col("vec_id") < 10)
    def rows(c: Array[Array[Float]]) =
      Similarity.ivfTopKWith(c, emb, queries, k = 5, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows(cent) == rows(loaded))
    assert(rows(cent).nonEmpty)
  }

  test("loader fails fast on missing or duplicated cells") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_bad").toString
    // cells 0 and 2: a hole at 1
    Seq((0, Array(1.0f)), (2, Array(2.0f))).toDF("cell", "centroid")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](Similarity.loadCentroids(spark, dir))
    assert(e.getMessage.contains("0..1"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_dup").toString
    Seq((0, Array(1.0f)), (0, Array(2.0f))).toDF("cell", "centroid")
      .write.mode("overwrite").parquet(dir2)
    intercept[IllegalArgumentException](Similarity.loadCentroids(spark, dir2))
  }
}
