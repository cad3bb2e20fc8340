package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** Specs for the NB log-count-ratio trainer: the fixed-point weight
  * formula, partitioning determinism, serving consistency, and genuine
  * held-out discrimination above the majority baseline.
  */
class QualityTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("quality-train-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixture(dir: String) = {
    val docs = QualityTrain.withDomainMarkers(Tables(spark, dir, "documents"))
    val target = substring(col("source"), 4, 10).cast("int") < 10
    (docs, target)
  }

  test("weights satisfy the smoothed fixed-point ratio formula exactly; deterministic under partitioning") {
    val (docs, target) = fixture("/root/testdata/sf0.001")
    val d = 512
    val rows = QualityTrain.nbRatioWeights(docs, target, d = d, textCol = "mtext")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == d, "one row per bucket, zero-count rows included")
    val tt = rows.map(_._2).sum
    val tn = rows.map(_._3).sum
    rows.foreach { case (_, nt, no, w) =>
      val expect = (BigInt(1000000L) * (BigInt(nt) + 1) * (BigInt(tn) + d) /
        ((BigInt(no) + 1) * (BigInt(tt) + d))).toLong
      assert(w == expect, s"nt=$nt no=$no w=$w expect=$expect")
    }
    val again = QualityTrain
      .nbRatioWeights(docs.repartition(13), target, d = d, textCol = "mtext")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("serving margin == dot product of collected weights with gram counts") {
    val (docs, target) = fixture("/root/testdata/sf0.001")
    val d = 512
    val wdf = QualityTrain.nbRatioWeights(docs, target, d = d, textCol = "mtext")
    val w = wdf.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val test = docs.filter(col("text").isNotNull &&
      TextAnalysis.splitBucket(col("doc_id")) >= 90)
    val got = QualityTrain.nbRatioScore(test, wdf, d = d, textCol = "mtext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute margins from the raw gram rows and the collected table
    val grams = Curation.gramBuckets(test, d, "doc_id", "mtext")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = grams.groupBy(_._1).map { case (id, bs) =>
      id -> bs.map { case (_, b) => w(b) - 1000000L }.sum
    }
    assert(got == expect)
  }

  test("held-out accuracy beats the majority baseline — the model discriminates, it doesn't collapse") {
    val eval = graft.SparkEntry.queries("c_quality_train_eval")(spark, "/root/testdata/sf0.01")
      .collect()
    val n = eval.length
    val acc = eval.count(_.getLong(3) == 1L).toDouble / n
    val posShare = eval.count(_.getLong(2) == 1L).toDouble / n
    val majority = math.max(posShare, 1 - posShare)
    assert(acc > majority + 0.05, s"acc=$acc majority=$majority n=$n")
    // and it actually predicts BOTH classes
    assert(eval.exists(_.getLong(1) > 0) && eval.exists(_.getLong(1) <= 0))
  }

  test("guards: non-integral id and bad params fail fast") {
    val s = spark
    import s.implicits._
    val bad = Seq(("x", "t", "src0")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException](
      QualityTrain.nbRatioWeights(bad, lit(true)))
    val ok = Seq((1L, "t", "src0")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException](
      QualityTrain.nbRatioWeights(ok, lit(true), d = 1))
    intercept[IllegalArgumentException](
      QualityTrain.nbRatioWeights(ok, lit(true), scale = 0))
  }
}
