package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Unigram hard-EM pins: the trained model COMPRESSES (multi-char pieces
  * carry real usage and words segment into fewer pieces than characters
  * — the exact degeneracy the positive-score first cut exhibited),
  * train→apply agreement through the shared Viterbi kernel, determinism
  * across partitionings, and the iteration contract.
  */
class UnigramTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("unigram-train-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // a corpus with strong multi-char structure: 'abab' and 'cd' repeat
  private val fixture = corpus(
    (1L, "abab abab abab cd cd"),
    (2L, "abab cd abab"),
    (3L, "ababab cd"),
  )

  test("training learns compression: multi-char pieces carry usage; words shrink") {
    val trained = UnigramTrain.train(fixture, iters = 2)
    val byPiece = trained.map(t => t._1 -> t._3).toMap
    val multiUsage = trained.filter(_._1.length > 1).map(_._3).sum
    assert(multiUsage > 0, s"degenerate all-singles model: $trained")
    // the dominant word 'abab' must be covered by fewer than 4 pieces
    val vocab = trained.map(t => (t._1, t._2))
    val s = spark
    import s.implicits._
    val ids = Seq("abab").toDF("t")
      .select(TextAnalysis.unigramTokenize(org.apache.spark.sql.functions.col("t"), vocab))
      .collect()(0).getSeq[Long](0)
    assert(ids.length < 4, s"'abab' still segments to $ids")
    // 'abab' itself (or 'ab') must be a used piece
    assert(byPiece.getOrElse("abab", 0L) + byPiece.getOrElse("ab", 0L) > 0, byPiece.toString)
  }

  test("scores are log-prob surrogates: negative, higher for more-used pieces") {
    val trained = UnigramTrain.train(fixture, iters = 2)
    val used = trained.filter(_._3 > 0)
    assert(used.nonEmpty && used.forall(_._2 < 0), used.take(5).toString)
    val sorted = used.sortBy(-_._3)
    assert(sorted.head._2 >= sorted.last._2)
  }

  test("deterministic across partitionings") {
    val a = UnigramTrain.train(fixture.repartition(1), iters = 2)
    val b = UnigramTrain.train(fixture.repartition(7), iters = 2)
    assert(a == b)
  }

  test("iters=0 is the seed model; more iterations only refine usage") {
    val seed = UnigramTrain.train(fixture, iters = 0)
    assert(seed.nonEmpty && seed.map(_._1) == seed.map(_._1).sorted)
    // every single character of the corpus is seeded (coverage invariant)
    val pieces = seed.map(_._1).toSet
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
  }

  test("trainedVocab applies through the same kernel the E-step used") {
    val vocab = UnigramTrain.trainedVocab(fixture, iters = 2)
    val s = spark
    import s.implicits._
    // no UNK anywhere on the training corpus: single chars stay seeded
    val ids = fixture.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .select(TextAnalysis.unigramTokenize(org.apache.spark.sql.functions.col("w"), vocab).as("ids"))
      .collect().flatMap(_.getSeq[Long](0))
    assert(ids.nonEmpty && !ids.contains(0L))
  }

  test("driver-local EM arm == distributed EM: pieces, scores, usage") {
    val local = UnigramTrain.train(fixture, iters = 2)
    val dist = UnigramTrain.train(fixture, iters = 2, maxLocalTypes = 0)
    assert(local == dist, s"local $local vs distributed $dist")
  }
}
