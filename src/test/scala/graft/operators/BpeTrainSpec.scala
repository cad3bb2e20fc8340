package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for distributed BPE merge learning: the textbook
  * merge sequence, the deterministic tie-break, the minCount early stop,
  * the definitional re-apply invariant (from-scratch merge replay ≡
  * training's incremental symbol state), and the relationship between
  * merge-order application and the greedy longest-match APPLY faces on
  * held-out text.
  */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("bpe-train-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(wordFreqs: (String, Int)*) = {
    import spark.implicits._
    // one doc per word occurrence — train() re-derives the frequencies
    wordFreqs.zipWithIndex.flatMap { case ((w, f), i) =>
      Seq.fill(f)((i.toLong, w))
    }.toDF("doc_id", "text")
  }

  test("learns the textbook Sennrich merge sequence") {
    // the paper's own example: low*5 lower*2 newest*6 widest*3
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = BpeTrain.train(docs, numMerges = 6).orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(
      ("e", "s", "es", 9L), ("es", "t", "est", 9L),
      ("l", "o", "lo", 7L), ("lo", "w", "low", 7L),
      // (e,w) and (w,est) tie at 6 — pair-ASC tie-break picks (e,w)
      ("e", "w", "ew", 6L), ("ew", "est", "ewest", 6L)))
  }

  test("tie-break is count DESC then pair ASC") {
    // "ab"*3 and "cd"*3: both pairs count 3; (a,b) < (c,d) lexicographically
    val docs = corpus("ab" -> 3, "cd" -> 3)
    val first = BpeTrain.train(docs, numMerges = 1).collect().head
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }

  test("stops early when no pair reaches minCount") {
    // every adjacent pair occurs exactly once
    val docs = corpus("ab" -> 1, "cd" -> 1)
    assert(BpeTrain.train(docs, numMerges = 5, minCount = 2).count() == 0)
    // and minCount=1 merges them fine
    assert(BpeTrain.train(docs, numMerges = 5, minCount = 1).count() == 2)
  }

  test("re-apply invariant: replaying the merge list from scratch equals the incremental state") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3,
      "wide" -> 2, "lowest" -> 2)
    val (merges, state) = BpeTrain.trainWithState(docs, numMerges = 8)
    val pairs = merges.map(m => (m.lhs, m.rhs))
    val rows = state.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val word = r.getString(0)
      val syms = r.getSeq[String](2)
      assert(BpeTrain.bpeApplyJvm(word, pairs) == syms.toList,
        s"word=$word incremental=$syms")
    }
  }

  test("trained vocab drives the greedy faces; merge-order apply agreement is pinned on held-out text") {
    val spark2 = spark
    import spark2.implicits._
    // train on the sf0.001 documents corpus, hold out words the trainer
    // never saw (the synthetic word stock plus novel inflections)
    val train = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val vocab = BpeTrain.trainedVocab(train, numMerges = 20)
    val (merges, _) = BpeTrain.trainWithState(train, numMerges = 20)
    assert(merges.length == 20)
    assert(merges.forall(m => vocab.contains(m.merged)))

    val heldOut = Seq("joining", "hashrow", "batcher", "rowboat", "zzz", "join")
    // greedy longest-match face under the trained vocab
    val greedy = heldOut.toDF("text")
      .select(TextAnalysis.bpeTokenCount(org.apache.spark.sql.functions.col("text"), vocab).as("n"))
      .collect().map(_.getLong(0))
    // merge-order application (true BPE encode) of the same words
    val mergeOrder = heldOut.map(w => BpeTrain.bpeApplyJvm(w, merges.map(m => (m.lhs, m.rhs))).length.toLong)
    // greedy longest-match and merge-order application are DIFFERENT
    // algorithms and can disagree on adversarial vocabs (greedy is not an
    // optimal segmenter); the contract pinned here is (a) every held-out
    // word segments (no zero counts, alphabet covers the corpus), and
    // (b) on THIS deterministic corpus + trained vocab the two faces
    // agree exactly — the empirical fixture pin the apply story rests on
    greedy.foreach(g => assert(g >= 1))
    assert(greedy.toSeq == mergeOrder, s"greedy=${greedy.toSeq} mergeOrder=$mergeOrder")
  }

  test("train→apply composition: vocab learned on the train side only, held-out OOV falls back per code point") {
    val spark2 = spark
    import spark2.implicits._
    // trainer sees only "xy" repeats → merge (x,y); held-out text mixes
    // learned subwords with a char the trainer never saw
    val train = corpus("xy" -> 5)
    val vocab = BpeTrain.trainedVocab(train, numMerges = 3, minCount = 2)
    assert(vocab.toSet == Set("x", "y", "xy"))
    val counts = Seq("xyxy", "yx", "xzy").toDF("text")
      .select(TextAnalysis.bpeTokenCount(org.apache.spark.sql.functions.col("text"), vocab).as("n"))
      .collect().map(_.getLong(0)).toSeq
    // "xyxy" → xy|xy; "yx" → y|x; "xzy" → x|OOV z|y
    assert(counts == Seq(2L, 2L, 3L))
  }

  test("code-point splitting survives multi-byte text") {
    val docs = corpus("héllo" -> 3, "héllos" -> 2)
    val merges = BpeTrain.train(docs, numMerges = 2).collect()
    // first merge must involve the accented char as ONE symbol
    assert(merges.nonEmpty)
    val all = merges.map(r => (r.getString(1), r.getString(2))).toSeq
    assert(all.exists { case (l, r) => l.contains("é") || r.contains("é") || (l + r).contains("é") })
  }

  test("driver-local merge loop == distributed loop: merges, state, and multi-byte tie-break") {
    // the Sennrich fixture (exercises counts + the ASC tie-break) plus a
    // multi-byte one where UTF-8 binary order and UTF-16 order could
    // diverge — the local argmax must replicate Spark's BINARY string
    // ordering, not compareTo
    for (docs <- Seq(
        corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3),
        corpus("héé" -> 3, "hzz" -> 3, "éz" -> 2))) {
      val (mLocal, sLocal) = BpeTrain.trainWithState(docs, numMerges = 6)
      val (mDist, sDist) =
        BpeTrain.trainWithState(docs, numMerges = 6, maxLocalTypes = 0)
      assert(mLocal == mDist, s"merges: local $mLocal vs distributed $mDist")
      def stateSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getSeq[String](2).toList)).toSet
      assert(stateSet(sLocal) == stateSet(sDist))
    }
  }
}
