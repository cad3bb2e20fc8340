package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Specs for the exact Jaccard pair feeder and the dedup-recall face:
  * brute-force cross-check of the inverted-index pair discovery, the
  * integer threshold semantics, the fail-loud pair-mass guard, and the
  * recall accounting invariants.
  */
class MinhashRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("minhash-recall-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic word-salad corpus with planted near-dup pairs
  private def corpus(n: Int): Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
      "iota", "kappa", "lambda", "mu")
    val base = (0 until n).map { i =>
      val words = (0 until 24).map(j => vocab(((i * 31 + j * 7) ^ (j * j)) % vocab.size))
      i.toLong -> words.mkString(" ")
    }
    // plant near-dups: copy of doc i with one word changed, id = n + i
    val dups = (0 until n by 4).map { i =>
      val words = base(i)._2.split(" ").toVector.updated(3, "CHANGED")
      (n + i).toLong -> words.mkString(" ")
    }
    base ++ dups
  }

  test("exactJaccardPairs matches the brute-force JVM kernel on every pair") {
    import spark.implicits._
    val rows = corpus(24)
    val got = MinHash.exactJaccardPairs(rows.toDF("doc_id", "text"), num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      if MinHash.exactJaccardJvm(ta, tb) >= 0.5
    } yield (ia, ib)).toSet
    assert(expect.nonEmpty, "fixture must plant at least one true pair")
    assert(got == expect)
  }

  test("threshold is the exact rational boundary, inclusive") {
    import spark.implicits._
    // two docs sharing exactly half their distinct shingles hit J = 1/3;
    // num/den = 1/3 keeps them, 1/2 drops them
    val d = Seq(1L -> "p q r s t u", 2L -> "p q r s x y").toDF("doc_id", "text")
    // shingle sets (k=3): doc1 {pqr,qrs,rst,stu}, doc2 {pqr,qrs,rsx,sxy}
    // ni=2, na=nb=4 → J = 2/6 = 1/3
    assert(MinHash.exactJaccardPairs(d, num = 1, den = 3).count() == 1L)
    assert(MinHash.exactJaccardPairs(d, num = 1, den = 2).count() == 0L)
  }

  test("pair-mass guard refuses loudly instead of dropping hot shingles") {
    import spark.implicits._
    val d = (1L to 30L).map(i => i -> "same same same text here").toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      MinHash.exactJaccardPairs(d, maxPairMass = 10L).count()
    }
    assert(e.getMessage.contains("maxPairMass"))
  }

  test("recall accounting: hit bounded by both sides, and hits are real truth pairs") {
    import spark.implicits._
    val df = corpus(40).toDF("doc_id", "text")
    val r = MinHash.minhashRecall(df).head
    val (nTrue, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue > 0, "planted dups must produce truth pairs")
    assert(nHit <= nTrue && nHit <= nCand)
    // planted one-word-changed copies are trivially J≥0.5; 8-band LSH at
    // J≈0.9 misses with prob (1-J²)^8 ≈ 1e-5 — demand most are found
    assert(nHit * 10 >= nTrue * 5, s"recall collapsed: $nHit/$nTrue")
  }

  test("recall row is invariant under input partitioning") {
    import spark.implicits._
    val rows = corpus(32)
    val a = MinHash.minhashRecall(rows.toDF("doc_id", "text").repartition(7)).head.toSeq
    val b = MinHash.minhashRecall(rows.toDF("doc_id", "text").coalesce(1)).head.toSeq
    assert(a == b)
  }

  test("verified canonical ≡ brute-force union-find over exact-verified candidates") {
    import spark.implicits._
    val rows = corpus(40)
    val df = rows.toDF("doc_id", "text")
    val got = MinHash.verifiedNearDupCanonicalMd5(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: the SAME candidate family (banded md5, buckets 2..20),
    // kept iff exact Jaccard ≥ 1/2, closed by union-find with min-root
    val cand = MinHash.bucketPairCountsMd5(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val text = rows.toMap
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    cand.foreach { case (a, b) =>
      if (MinHash.exactJaccardJvm(text(a), text(b)) >= 0.5) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expect = rows.map { case (id, _) => id -> find(id) }.toMap
    assert(expect.values.toSet.size < rows.size, "planted dups must merge")
    assert(got == expect)
  }

  test("verification refuses a pure band collision: sub-threshold pairs never merge") {
    import spark.implicits._
    val rows = corpus(40)
    val df = rows.toDF("doc_id", "text")
    val canon = MinHash.verifiedNearDupCanonicalMd5(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val text = rows.toMap
    // every merged doc must reach its canonical through verified pairs —
    // in particular no 2-cluster may exist whose sole pair is sub-threshold
    val clusters = canon.groupBy(_._2).values.map(_.keys.toSeq.sorted).filter(_.size == 2)
    clusters.foreach { c =>
      assert(MinHash.exactJaccardJvm(text(c(0)), text(c(1))) >= 0.5,
        s"pair ${c(0)},${c(1)} merged without clearing the exact threshold")
    }
  }
}
