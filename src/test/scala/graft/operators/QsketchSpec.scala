package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.functions.LogHistogram

/** Log-histogram quantile sketch properties: the bucket map's exactness /
  * monotonicity / containment / relative-width contract over the full
  * long range, Scala-kernel ≡ column-expression equality (the rule the
  * DuckDB oracle mirrors), Aggregator ≡ declarative build, merge
  * LINEARITY (per-source matrices sum to the global matrix — what makes
  * the sketch mergeable across executors and days), partition
  * invariance, and the quantile face's in-bounds guarantee on a fixture
  * whose exact quantiles are hand-checkable.
  */
class QsketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("qsketch-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docsOf(rows: (String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("source", "n_chars")
  }

  // boundary sweep + a deterministic LCG scatter across magnitudes
  private val sweep: Seq[Long] = {
    val edges = Seq(0L, 1L, 14L, 15L, 16L, 17L, 31L, 32L, 33L, 63L, 64L,
      255L, 256L, 1023L, 1024L, (1L << 40) - 1, 1L << 40, (1L << 57) - 1,
      1L << 57, Long.MaxValue)
    var x = 88172645463325252L
    val rnd = (1 to 200).map { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      x & Long.MaxValue // non-negative
    }
    edges ++ rnd
  }

  test("bucket map: exact below 16, monotone, contained, width <= lo/16") {
    sweep.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(LogHistogram.bucket(a) <= LogHistogram.bucket(b),
          s"monotonicity broken between $a and $b")
      case _ => ()
    }
    sweep.foreach { v =>
      val b = LogHistogram.bucket(v)
      val (lo, hi) = (LogHistogram.lowerBound(b), LogHistogram.upperBound(b))
      assert(lo <= v && v <= hi, s"$v outside bucket $b bounds [$lo, $hi]")
      if (v < 16) assert(lo == v && hi == v, s"small value $v must be exact")
      else assert((hi - lo + 1) * 16 <= lo || b / 16 - 1 >= 58,
        s"bucket $b width ${hi - lo + 1} exceeds lo/16 (${lo / 16})")
      // round-trip: both bounds land back in the same bucket
      assert(LogHistogram.bucket(lo) == b && LogHistogram.bucket(hi) == b,
        s"bounds of $b do not round-trip")
    }
    // negatives clamp to bucket 0 rather than throw
    assert(LogHistogram.bucket(-7L) == 0)
  }

  test("column-expression bucket/bounds rule == Scala kernel on the sweep") {
    val s = spark
    import s.implicits._
    // column twins are only defined for non-negative inputs (operators
    // coalesce/clamp before applying them)
    val df = sweep.filter(_ >= 0).toDF("v")
      .withColumn("bucket", LogHistogram.bucketColOf("v"))
      .withColumn("lo", LogHistogram.lowerBoundColOf("bucket"))
      .withColumn("hi", LogHistogram.upperBoundColOf("bucket"))
    df.collect().foreach { r =>
      val v = r.getLong(0)
      val b = LogHistogram.bucket(v)
      assert(r.getLong(1) == b.toLong, s"column bucket for $v: ${r.getLong(1)} != $b")
      assert(r.getLong(2) == LogHistogram.lowerBound(b), s"column lo for $v")
      assert(r.getLong(3) == LogHistogram.upperBound(b), s"column hi for $v")
    }
  }

  private val fixture = Seq(
    "a" -> 0L, "a" -> 1L, "a" -> 15L, "a" -> 16L, "a" -> 17L, "a" -> 300L,
    "b" -> 44L, "b" -> 44L, "b" -> 558L, "b" -> 1024L,
    "c" -> 7L,
    // corrupt-length arm: a negative value must clamp to bucket 0 in the
    // Aggregator AND the declarative/oracle rule alike
    "d" -> -3L, "d" -> 20L,
  )

  test("Aggregator build == declarative column-expression build") {
    val docs = docsOf(fixture: _*)
    val agg = TextAnalysis.qsketchHistogram(docs)
      .select("source", "bucket", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val decl = docs
      .select(col("source"), coalesce(col("n_chars"), lit(0L)).as("v"))
      .withColumn("bucket", LogHistogram.bucketColOf("v"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg == decl, s"aggregator $agg != declarative $decl")
  }

  test("linearity: per-source matrices sum elementwise to the global matrix") {
    val docs = docsOf(fixture: _*)
    val perSource = TextAnalysis.qsketchBySource(docs).collect()
      .map(_.getSeq[Long](1).toArray)
    val global = TextAnalysis.qsketchBySource(docs.withColumn("source", lit("all")))
      .collect()(0).getSeq[Long](1).toArray
    val summed = perSource.reduce { (a, b) =>
      a.zip(b).map { case (x, y) => x + y }
    }
    assert(summed.sameElements(global), "sum of per-source matrices != global matrix")
  }

  test("partition invariance: repartition(7) changes nothing") {
    val docs = docsOf(fixture: _*)
    val base = TextAnalysis.qsketchHistogram(docs).collect().map(_.toString).sorted
    val rep = TextAnalysis.qsketchHistogram(docs.repartition(7)).collect()
      .map(_.toString).sorted
    assert(base.sameElements(rep))
  }

  test("duplicate percentiles/thresholds fail loudly, not with ambiguous columns (r17 advice)") {
    val docs = docsOf("a" -> 10L, "a" -> 20L)
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.qsketchQuantiles(docs, ps = Seq(50, 50, 90))
    }
    assert(e1.getMessage.contains("distinct"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.qsketchCdf(docs, thresholds = Seq(100L, 100L))
    }
    assert(e2.getMessage.contains("distinct"), e2.getMessage)
  }

  test("cdf face: bounds contain the exact ppm, straddling bucket shows the gap") {
    // source b: 44, 44, 558, 1024. T=100: bucket(44)=[44,45] fully below
    // -> lo = hi = exact = 500000 ppm. T=550: bucket(558)=[544,575]
    // STRADDLES -> lo 500000 < hi 750000, exact 500000 (558 > 550).
    val out = TextAnalysis.qsketchCdf(docsOf(fixture: _*), thresholds = Seq(100L, 550L))
      .collect().map(r => r.getString(0) -> r).toMap
    val b = out("b")
    assert(b.getAs[Long]("t100_lo") == 500000L && b.getAs[Long]("t100_hi") == 500000L)
    assert(b.getAs[Long]("t100_exact") == 500000L)
    assert(b.getAs[Long]("t550_lo") == 500000L && b.getAs[Long]("t550_hi") == 750000L)
    assert(b.getAs[Long]("t550_exact") == 500000L)
    // the containment theorem holds for every source and threshold
    out.values.foreach { r =>
      Seq(100L, 550L).foreach { t =>
        assert(r.getAs[Long](s"t${t}_ok") == 1L,
          s"${r.getString(0)} T=$t: cdf bounds broken")
      }
    }
  }

  test("quantile face: bounds contain the exact quantiles, hand-checked") {
    // source a sorted: 0,1,15,16,17,300 (n=6): p50 -> ceil(3)=row3 = 15,
    // p90 -> ceil(5.4)=row6 = 300, p99 -> row6 = 300
    val out = TextAnalysis.qsketchQuantiles(docsOf(fixture: _*))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("p50_exact") == 15L && a.getAs[Long]("p90_exact") == 300L)
    Seq("a", "b", "c").foreach { src =>
      val r = out(src)
      Seq(50, 90, 99).foreach { p =>
        assert(r.getAs[Long](s"p${p}_ok") == 1L, s"$src p$p out of bounds")
        assert(r.getAs[Long](s"p${p}_lo") <= r.getAs[Long](s"p${p}_exact"))
        assert(r.getAs[Long](s"p${p}_exact") <= r.getAs[Long](s"p${p}_hi"))
      }
    }
    // single-value source: exact bucket, lo == hi == value
    val c = out("c")
    assert(c.getAs[Long]("p50_lo") == 7L && c.getAs[Long]("p50_hi") == 7L)
    // corrupt arm: a negative exact quantile falls OUTSIDE its clamped
    // bucket-0 bounds — the flag goes 0 identically in both engines (the
    // documented corrupt-data caveat, not a guarantee violation)
    val d = out("d")
    assert(d.getAs[Long]("p50_exact") == -3L && d.getAs[Long]("p50_lo") == 0L)
    assert(d.getAs[Long]("p50_ok") == 0L)
  }
}
