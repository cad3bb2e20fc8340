package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (Wu et al. 2016, "Google's Neural Machine
  * Translation System", §4.1; the BERT `WordpieceTokenizer` semantics):
  * per whitespace word, greedy longest-match where positions AFTER the
  * first must match a `##`-prefixed CONTINUATION entry — and if matching
  * fails at ANY position, the ENTIRE word becomes one UNK token (id 0),
  * discarding pieces already matched.
  *
  * Those two rules are exactly what [[BpeTokenize]] does NOT do (one
  * vocab face, per-code-point OOV fallback), which is why real BERT
  * vocabularies cannot be applied with the BPE face: "unaffordable" with
  * pieces {un, ##afford, ##able} must emit [un, ##afford, ##able], while
  * "unaffordablez" with no `##z` must emit [UNK] — not
  * [un, ##afford, ##able, OOV].
  *
  * Output: 1-based vocab ids (positions in the GIVEN vocab list,
  * `##`-prefixed entries matching at continuation positions under their
  * own ids), 0 for a whole-word UNK. Deterministic, cross-engine
  * reproducible — the DuckDB oracle replays the same walk with a
  * recursive CTE (position-dependent vocab face, failure propagated to a
  * whole-word sentinel).
  *
  * Execution: two byte-level tries (initial entries; continuation
  * entries stripped of `##`) compiled once per JVM per vocab (bounded
  * LRU, the [[BpeTokenCount]] cache discipline); matching is a forward
  * byte scan with no String allocation; the expression stays inside
  * whole-stage codegen (static call + reference objects). Same scale
  * posture as the BPE faces: vocab ships once per executor inside the
  * expression, per-row cost linear in text bytes, no shuffle, no UDF.
  */
case class WordPieceTokenize(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  WordPieceTokenize.validateVocab(vocab)

  @transient private lazy val tries: WordPieceTokenize.Tries =
    WordPieceTokenize.compile(vocab)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wordpiece_tokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    WordPieceTokenize.tokenize(s.asInstanceOf[UTF8String], tries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpTries", tries, classOf[WordPieceTokenize.Tries].getName)
    defineCodeGen(ctx, ev, s => s"graft.functions.WordPieceTokenize.tokenize($s, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceTokenize {

  /** Initial-position and continuation-position tries (continuation
    * entries stored stripped of their `##` prefix, keeping their original
    * 1-based vocab ids).
    */
  final class Tries(val init: BpeTokenCount.Trie, val cont: BpeTokenCount.Trie)
    extends Serializable

  private[graft] def validateVocab(vocab: Seq[String]): Unit = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(vocab.forall(v => !v.exists(Character.isWhitespace)),
      "vocab entries must be whitespace-free (whitespace separates words)")
    require(vocab.forall(v => v.nonEmpty && v != "##"),
      "vocab entries must be non-empty after the ## prefix")
    require(vocab.distinct.length == vocab.length, "vocab entries must be distinct")
  }

  private val MaxCachedVocabs = 64
  private val cache =
    new java.util.LinkedHashMap[Seq[String], Tries](MaxCachedVocabs * 2, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Seq[String], Tries]): Boolean =
        size() > MaxCachedVocabs
    }

  private[graft] def compile(vocab: Seq[String]): Tries = cache.synchronized {
    val hit = cache.get(vocab)
    if (hit != null) hit
    else {
      val init = new BpeTokenCount.Trie
      val cont = new BpeTokenCount.Trie
      vocab.zipWithIndex.foreach { case (entry, idx) =>
        val (root, body) =
          if (entry.startsWith("##")) (cont, entry.substring(2)) else (init, entry)
        var node = root
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => node = node.addChild(b))
        node.termId = idx + 1
      }
      val t = new Tries(init, cont)
      cache.put(vocab, t)
      t
    }
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Static entry the generated code calls: per word, greedy
    * longest-match against the position-appropriate trie; any failed
    * position collapses the word to one UNK (id 0).
    */
  def tokenize(s: UTF8String, tries: Tries): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(n / 4, 8))
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        // word spans [i, end)
        var end = i
        while (end < n && !isWs(bytes(end))) end += 1
        val mark = out.length
        var pos = i
        var failed = false
        while (!failed && pos < end) {
          val trie = if (pos == i) tries.init else tries.cont
          var node = trie
          var j = pos
          var best = -1
          var bestId = 0
          while (node != null && j < end) {
            node = node.childFor(bytes(j))
            if (node != null) {
              j += 1
              if (node.termId > 0) { best = j; bestId = node.termId }
            }
          }
          if (best > pos) { out += bestId.toLong; pos = best }
          else failed = true
        }
        if (failed) {
          out.remove(mark, out.length - mark)
          out += 0L
        }
        i = end
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Column API entry point. */
  def apply(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.toColumn(WordPieceTokenize(ColumnBridge.toExpression(text), vocab))
}
