package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Product-quantization pins: exactness in the ks ≥ N limit (every vector
  * its own codeword ⇒ ADC distances equal exact quantized L2, so the two
  * top-k frames are identical), recall of the compressed path against the
  * exact face on the real embeddings table, partitioning insensitivity,
  * and the fail-loud dimensionality guards.
  */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("pq-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  /** Deterministic small corpus: 12 vectors, dim 8. */
  private def smallCorpus: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 12L).map { id =>
      (id, Array.tabulate(8)(i => (((id * 7 + i * 3) % 13).toFloat - 6f) / 4f))
    }.toDF("vec_id", "embedding")
  }

  private def collectRanks(df: DataFrame): Seq[(Long, Int, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

  test("ks >= N: PQ with every vector a codeword equals exact quantized L2 exactly") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") < 3)
    val pq = collectRanks(
      Similarity.quantizedPqTopK(c, q, k = 4, m = 4, ks = 12)
        .orderBy("query_id", "rank"))
    val l2 = collectRanks(
      Similarity.quantizedL2TopK(c, q, k = 4)
        .orderBy("query_id", "rank"))
    assert(pq == l2)
  }

  test("compression is lossy but ranked: ks < N recall@5 vs exact L2 on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val pq = Similarity.quantizedPqTopK(emb, q, k = 5, m = 8, ks = 16)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val l2 = Similarity.quantizedL2TopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = l2.map { case (qid, truth) => (pq.getOrElse(qid, Set.empty) & truth).size }.sum
    val total = l2.values.map(_.size).sum
    assert(total > 0)
    // 16 codewords over 500 vectors is aggressive compression; the point
    // is non-vacuous overlap with the exact ranking, not parity
    assert(hits * 5 >= total, s"recall ${hits.toDouble / total} < 0.2 ($hits/$total)")
  }

  test("partitioning insensitivity") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") < 3)
    val one = collectRanks(Similarity.quantizedPqTopK(c.repartition(1), q, k = 4, m = 4, ks = 5)
      .orderBy("query_id", "rank"))
    val many = collectRanks(Similarity.quantizedPqTopK(c.repartition(7), q, k = 4, m = 4, ks = 5)
      .orderBy("query_id", "rank"))
    assert(one == many)
  }

  test("dimensionality guards fail loud") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") < 2)
    // dim 8 does not divide into 3 subspaces
    val e = intercept[IllegalArgumentException](
      Similarity.quantizedPqTopK(c, q, k = 2, m = 3, ks = 4).collect())
    assert(e.getMessage.contains("subspaces"), e.getMessage)
    // a corpus row whose dim disagrees with the codebook must fail, not
    // silently score garbage
    val s = spark
    import s.implicits._
    val ragged = c.as[(Long, Array[Float])]
      .map { case (id, v) => (id, if (id == 11L) v.take(4) else v) }
      .toDF("vec_id", "embedding")
    val err = intercept[Exception](
      Similarity.quantizedPqTopK(ragged, q, k = 2, m = 4, ks = 4).collect())
    assert(err.getMessage != null)
  }

  test("IVF-PQ exactness limit: all cells probed + every residual a codeword == exact L2") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") < 3)
    val ivfpq = collectRanks(
      Similarity.quantizedIvfPqTopK(c, q, k = 4, nCells = 4, nProbe = 4, m = 4, ks = 12)
        .orderBy("query_id", "rank"))
    val l2 = collectRanks(
      Similarity.quantizedL2TopK(c, q, k = 4).orderBy("query_id", "rank"))
    assert(ivfpq == l2)
  }

  test("IVF-PQ recall on real embeddings: compressed+pruned still overlaps exact L2") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val apx = Similarity
      .quantizedIvfPqTopK(emb, q, k = 5, nCells = 8, nProbe = 2, m = 8, ks = 16)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val l2 = Similarity.quantizedL2TopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = l2.map { case (qid, truth) => (apx.getOrElse(qid, Set.empty) & truth).size }.sum
    val total = l2.values.map(_.size).sum
    assert(total > 0 && hits > 0, s"IVF-PQ found nothing of the exact top-5 ($hits/$total)")
  }

  test("IVF-PQ partitioning insensitivity") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") < 3)
    val one = collectRanks(
      Similarity.quantizedIvfPqTopK(c.repartition(1), q, k = 3, nCells = 3, nProbe = 2, m = 4, ks = 5)
        .orderBy("query_id", "rank"))
    val many = collectRanks(
      Similarity.quantizedIvfPqTopK(c.repartition(7), q, k = 3, nCells = 3, nProbe = 2, m = 4, ks = 5)
        .orderBy("query_id", "rank"))
    assert(one == many)
  }

  test("PQ codebook persists and reloads bit-exact; reloaded index serves identical top-k") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") < 3)
    val dir = java.nio.file.Files.createTempDirectory("pq-index").toString + "/cb"
    val cb = Similarity.pqCodebook(c, m = 4, ks = 6)
    Similarity.savePqCodebook(spark, cb, dir)
    val re = Similarity.loadPqCodebook(spark, dir)
    assert(re.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq)
    val a = collectRanks(Similarity.quantizedPqTopKWith(cb, c, q, k = 4)
      .orderBy("query_id", "rank"))
    val b = collectRanks(Similarity.quantizedPqTopKWith(re, c, q, k = 4)
      .orderBy("query_id", "rank"))
    val direct = collectRanks(Similarity.quantizedPqTopK(c, q, k = 4, m = 4, ks = 6)
      .orderBy("query_id", "rank"))
    assert(a == b && a == direct)
    // incomplete grid fails fast
    spark.read.parquet(dir).filter(col("cw") =!= 0)
      .write.mode("overwrite").parquet(dir + "_broken")
    val e = intercept[IllegalArgumentException](Similarity.loadPqCodebook(spark, dir + "_broken"))
    assert(e.getMessage.contains("complete"), e.getMessage)
  }

  test("L2 face: self excluded, ranks ascend by (dist, id)") {
    val c = smallCorpus
    val q = c.filter(col("vec_id") === 0L)
    val rows = collectRanks(Similarity.quantizedL2TopK(c, q, k = 11).orderBy("rank"))
    assert(rows.forall(_._3 != 0L), "self must be excluded")
    val key = rows.map(r => (r._4, r._3))
    assert(key == key.sorted, key.toString)
  }
}
