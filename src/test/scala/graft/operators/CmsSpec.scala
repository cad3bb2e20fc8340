package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.functions.CmsSketch

/** Count-Min sketch properties: the one-sided estimate guarantee over
  * EVERY distinct token (not just the registered query's top-20), exact
  * equality of the typed Aggregator with the declarative explode→groupBy
  * matrix, merge insensitivity to partitioning, and the bucket rule's
  * md5 contract.
  */
class CmsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("cms-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val (depth, width) = (4, 64)

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val fixture = Seq(
    1L -> "alpha beta alpha gamma",
    2L -> "beta beta\tdelta",
    3L -> "alpha  epsilon\nzeta zeta zeta",
    4L -> "  eta ",
    5L -> "theta",
  )

  private def exactCounts: Map[String, Long] =
    fixture.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    TextAnalysis.cmsSketch(df, depth, width).collect()(0).getSeq[Long](0).toArray

  test("estimate >= exact for every distinct token; estimate is exact sans collision") {
    val m = sketchOf(docs(fixture: _*))
    val exact = exactCounts
    exact.foreach { case (tok, cnt) =>
      val est = CmsSketch.estimate(m, tok, depth, width)
      assert(est >= cnt, s"$tok: est $est < exact $cnt")
    }
    // total mass per row = total token occurrences
    val total = exact.values.sum
    (0 until depth).foreach { r =>
      val rowSum = (0 until width).map(b => m(r * width + b)).sum
      assert(rowSum == total, s"row $r mass $rowSum != $total")
    }
  }

  test("Aggregator matrix == declarative explode/groupBy matrix") {
    val df = docs(fixture: _*)
    val m = sketchOf(df)
    val declared = df.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .collect().map(_.getString(0))
      .foldLeft(new Array[Long](depth * width)) { (acc, tok) =>
        (0 until depth).foreach(r => acc(r * width + CmsSketch.bucket(r, tok, width)) += 1L)
        acc
      }
    assert(m.toSeq == declared.toSeq)
  }

  test("merge is partitioning-insensitive") {
    val df = docs(fixture: _*)
    val one = sketchOf(df.repartition(1))
    val many = sketchOf(df.repartition(7))
    assert(one.toSeq == many.toSeq)
  }

  test("null text rows contribute nothing") {
    val s = spark
    import s.implicits._
    val withNull = fixture.map { case (id, t) => (id, Option(t)) } :+ (9L -> Option.empty[String])
    val df = withNull.toDF("doc_id", "text")
    assert(sketchOf(df).toSeq == sketchOf(docs(fixture: _*)).toSeq)
  }

  test("bucket matches the SQL md5 idiom (first 8 hex chars as unsigned int)") {
    Seq("alpha", "β-token", "x") .foreach { tok =>
      (0 until depth).foreach { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$r:$tok".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        val expected = (java.lang.Long.parseLong(hex.take(8), 16) % width).toInt
        assert(CmsSketch.bucket(r, tok, width) == expected, s"$r:$tok")
      }
    }
  }

  test("linearity: elementwise sum of per-source sketches == the global sketch") {
    val s = spark
    import s.implicits._
    val withSrc = fixture.zipWithIndex.map { case ((id, t), i) =>
      (id, t, s"src${i % 2}")
    }.toDF("doc_id", "text", "source")
    val global = sketchOf(withSrc)
    val perSource = TextAnalysis.cmsBySource(withSrc, depth, width)
      .collect().map(_.getSeq[Long](1).toArray)
    assert(perSource.length == 2)
    val merged = perSource.reduce { (a, b) =>
      a.indices.foreach(i => a(i) += b(i)); a
    }
    assert(merged.toSeq == global.toSeq)
  }

  test("an all-empty-text source still owns an (all-zero) sketch in the merge report") {
    val s = spark
    import s.implicits._
    val withSrc = (fixture.map { case (id, t) => (id, t, "srcA") } :+
      ((9L, "", "srcEmpty"))).toDF("doc_id", "text", "source")
    val out = TextAnalysis.cmsMergeReport(withSrc, k = 2, depth, width).collect()
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc.keySet == Set("srcA", "srcEmpty"), bySrc.keySet.toString)
    // the empty source's estimates and exact counts are all zero
    bySrc("srcEmpty").foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L, r.toString)
    }
  }

  test("cmsHeavyHitters pairs exact counts with >= estimates in rank order") {
    val out = TextAnalysis.cmsHeavyHitters(docs(fixture: _*), k = 5, depth, width).collect()
    assert(out.nonEmpty && out.length <= 5)
    val exact = exactCounts
    out.foreach { r =>
      val (tok, ex, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ex == exact(tok))
      assert(est >= ex, s"$tok: est $est < exact $ex")
    }
    // ranked by (exact desc, token)
    val keys = out.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }
}
