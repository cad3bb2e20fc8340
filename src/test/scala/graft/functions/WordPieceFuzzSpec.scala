package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.operators.TextAnalysis

/** Seeded fuzz for the WordPiece expression: random overlapping
  * init/continuation vocabularies over a two-letter alphabet versus a
  * pure-Scala mirror of the BERT WordpieceTokenizer rules (greedy
  * longest-match per face, whole-word UNK with piece discard). The
  * mirror shares nothing with the trie implementation — it scans the
  * vocab list per position — so a trie-walk or face-routing bug cannot
  * hide in both.
  */
class WordPieceFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("2").appName("wordpiece-fuzz").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mirror(text: String, vocab: Seq[String]): Seq[Long] = {
    val id = vocab.zipWithIndex.map { case (e, i) => e -> (i + 1).toLong }.toMap
    text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { word =>
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var pos = 0
      var failed = false
      while (!failed && pos < word.length) {
        val cands = vocab.filter { e =>
          val body = if (e.startsWith("##")) e.substring(2) else e
          val rightFace = e.startsWith("##") == (pos > 0)
          rightFace && body.nonEmpty && word.startsWith(body, pos)
        }
        if (cands.isEmpty) failed = true
        else {
          // longest body wins; equal-length bodies matching at the same
          // position are the same string, so within a face the argmax is
          // unique
          val best = cands.maxBy(e => if (e.startsWith("##")) e.length - 2 else e.length)
          out += id(best)
          pos += (if (best.startsWith("##")) best.length - 2 else best.length)
        }
      }
      if (failed) Seq(0L) else out.toSeq
    }
  }

  test("random vocabs x random texts == pure-Scala mirror") {
    val rnd = new scala.util.Random(1723)
    val pieceStock = Seq("a", "b", "ab", "ba", "aa", "bb", "aab", "bba", "abab")
    for (iter <- 1 to 40) {
      // random init/continuation subsets; both faces may share bodies
      val init = rnd.shuffle(pieceStock).take(2 + rnd.nextInt(5))
      val cont = rnd.shuffle(pieceStock).take(2 + rnd.nextInt(5)).map("##" + _)
      val vocab = (init ++ cont).distinct
      val texts = (1 to 6).map { _ =>
        (1 to (1 + rnd.nextInt(4))).map { _ =>
          (1 to (1 + rnd.nextInt(7)))
            .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString +
            (if (rnd.nextInt(5) == 0) "c" else "") // uncoverable arm
        }.mkString(" ")
      }
      val s = spark
      import s.implicits._
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(col("id"), TextAnalysis.wordpieceTokenize(col("t"), vocab).as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == mirror(t, vocab),
          s"iter=$iter text='$t' vocab=$vocab")
      }
    }
  }
}
