package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization (Kudo 2018, "Subword Regularization", §3: the
  * SentencePiece unigram model's DECODE step): per whitespace word, the
  * segmentation into vocab pieces MAXIMIZING the summed piece scores —
  * Viterbi over positions, not greedy matching. This is the third
  * tokenizer family next to [[BpeTokenize]] (greedy longest-match,
  * per-code-point OOV) and [[WordPieceTokenize]] (greedy with
  * ##-continuation and whole-word UNK): a high-scoring pair of short
  * pieces beats one long piece, which no greedy face can produce.
  *
  * Deterministic total order on segmentations: summed score DESC, then
  * piece count ASC, then the id sequence lexicographically ASC (ids are
  * 1-based vocab positions). The tie chain is suffix-composable, so one
  * right-to-left DP pass computes it exactly — and a SQL oracle replays
  * it by enumerating all segmentation paths in a recursive CTE and
  * ranking with the same three keys. A word no path covers becomes one
  * UNK token (id 0, score contribution 0) — the WordPiece convention.
  *
  * Execution: the (piece → id, score) model compiles once per JVM per
  * vocab (bounded LRU, the [[BpeTokenCount]] cache discipline) into a
  * byte trie + score table; per word the DP is O(len · maxPieceLen)
  * with two small reused arrays. Codegen'd static call, no UDF, no
  * shuffle, vocab ships once per executor inside the expression.
  */
case class UnigramTokenize(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {
  UnigramTokenize.validateVocab(vocab)

  @transient private lazy val model: UnigramTokenize.Model =
    UnigramTokenize.compile(vocab)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_tokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    UnigramTokenize.tokenize(s.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugModel", model, classOf[UnigramTokenize.Model].getName)
    defineCodeGen(ctx, ev, s => s"graft.functions.UnigramTokenize.tokenize($s, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramTokenize {

  /** Compiled model: the piece trie (termId = 1-based vocab position) and
    * the score table indexed by termId (slot 0 unused).
    */
  final class Model(val trie: BpeTokenCount.Trie, val scores: Array[Long])
    extends Serializable

  private[graft] def validateVocab(vocab: Seq[(String, Long)]): Unit = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(vocab.forall { case (p, _) => p.nonEmpty && !p.exists(Character.isWhitespace) },
      "vocab pieces must be non-empty and whitespace-free")
    require(vocab.map(_._1).distinct.length == vocab.length,
      "vocab pieces must be distinct")
  }

  private val MaxCachedVocabs = 64
  private val cache =
    new java.util.LinkedHashMap[Seq[(String, Long)], Model](MaxCachedVocabs * 2, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Seq[(String, Long)], Model]): Boolean =
        size() > MaxCachedVocabs
    }

  private[graft] def compile(vocab: Seq[(String, Long)]): Model = cache.synchronized {
    val hit = cache.get(vocab)
    if (hit != null) hit
    else {
      val root = new BpeTokenCount.Trie
      val scores = new Array[Long](vocab.length + 1)
      vocab.zipWithIndex.foreach { case ((piece, score), idx) =>
        var node = root
        piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => node = node.addChild(b))
        node.termId = idx + 1
        scores(idx + 1) = score
      }
      val m = new Model(root, scores)
      cache.put(vocab, m)
      m
    }
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Static entry the generated code calls: per word, right-to-left
    * Viterbi with the (score DESC, count ASC, ids lex ASC) total order.
    * The tie chain is suffix-composable: among pieces at position i whose
    * tails are themselves optimal-and-lex-smallest, picking the smallest
    * piece id yields the globally lex-smallest optimal sequence (equal
    * ids at one position are impossible — ids are distinct per piece).
    */
  def tokenize(s: UTF8String, model: Model): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(n / 4, 8))
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        var end = i
        while (end < n && !isWs(bytes(end))) end += 1
        tokenizeWord(bytes, i, end, model, out)
        i = end
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  private def tokenizeWord(bytes: Array[Byte], start: Int, end: Int,
                           model: Model,
                           out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    val len = end - start
    // DP state at word-relative position p (0..len): best (score, count,
    // first-piece id, first-piece byte length) of the suffix from p
    val score = new Array[Long](len + 1)
    val count = new Array[Int](len + 1)
    val pieceId = new Array[Int](len + 1)
    val pieceLen = new Array[Int](len + 1)
    java.util.Arrays.fill(pieceId, 0, len + 1, -1) // -1 = unreachable
    pieceId(len) = 0 // empty suffix: reachable terminal
    var p = len - 1
    while (p >= 0) {
      var node = model.trie
      var j = start + p
      var bestScore = 0L; var bestCount = 0; var bestId = -1; var bestLen = 0
      while (node != null && j < end) {
        node = node.childFor(bytes(j))
        if (node != null) {
          j += 1
          val id = node.termId
          if (id > 0) {
            val tail = p + (j - (start + p))
            if (pieceId(tail) >= 0) {
              val cScore = model.scores(id) + score(tail)
              val cCount = 1 + count(tail)
              val better = bestId < 0 ||
                cScore > bestScore ||
                (cScore == bestScore && (cCount < bestCount ||
                  (cCount == bestCount && id < bestId)))
              if (better) {
                bestScore = cScore; bestCount = cCount; bestId = id
                bestLen = j - (start + p)
              }
            }
          }
        }
      }
      if (bestId >= 0) {
        score(p) = bestScore; count(p) = bestCount
        pieceId(p) = bestId; pieceLen(p) = bestLen
      }
      p -= 1
    }
    if (pieceId(0) < 0) out += 0L // uncoverable word: one UNK
    else {
      var q = 0
      while (q < len) {
        out += pieceId(q).toLong
        q += pieceLen(q)
      }
    }
  }

  /** Column API entry point. */
  def apply(text: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.toColumn(UnigramTokenize(ColumnBridge.toExpression(text), vocab))
}
