package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native subword token counting: `BpeTokenCount(text, vocab)` returns the
  * number of tokens a deterministic greedy longest-match tokenizer emits
  * over `text` given a fixed merges-table vocabulary — the BPE-lite
  * counter every real pipeline budget (sequence packing maxLen, mixture
  * quotas) is denominated in, where whitespace word counts are only a
  * proxy.
  *
  * Semantics (deterministic, cross-engine reproducible):
  *   - whitespace (the six ASCII `\s` chars, the module's tokenization
  *     family) separates words and is never consumed as a token;
  *   - inside a word, the LONGEST vocab entry matching at the cursor is
  *     consumed as one token (ties impossible — entries are distinct);
  *   - if nothing matches, ONE code point is consumed as one out-of-vocab
  *     token (the byte-fallback of real BPE collapsed to code-point
  *     granularity so the count matches character-semantics SQL oracles).
  *
  * This is the tokenizer side of the published BPE family (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): applying a FROZEN vocab greedily, not learning merges — the
  * apply step is what a counting pipeline runs, and greedy
  * longest-prefix (WordPiece-style application) makes the count a pure
  * function of (text, vocab) with no merge-order state to ship.
  *
  * Execution: the vocab compiles once per JVM (process-wide cache keyed
  * by the vocab list) into a byte-level trie; matching is one forward
  * byte scan per word with no String allocation — byte-level longest
  * match over complete entries always ends on a code-point boundary, so
  * it equals character-level matching, and the OOV fallback advances one
  * full UTF-8 sequence to preserve that equality. The expression stays
  * inside whole-stage codegen (doGenCode emits a static call; the trie
  * rides along as a codegen reference object).
  *
  * Scale posture: the vocab ships once per executor inside the serialized
  * expression (a 50k-entry vocab is ~1 MB); per-row cost is linear in
  * text bytes with trie depth bounded by the longest vocab entry. No
  * shuffle, no UDF, no driver participation.
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  BpeTokenCount.validateVocab(vocab)

  @transient private lazy val trie: BpeTokenCount.Trie = BpeTokenCount.compile(vocab)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    BpeTokenCount.count(s.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTokenCount.Trie].getName)
    defineCodeGen(ctx, ev, s => s"graft.functions.BpeTokenCount.count($s, $trieRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The materialization face of the same tokenizer: `BpeTokenize(text,
  * vocab)` returns the token ID SEQUENCE greedy longest-match emits —
  * 1-based vocab indices, with 0 for every out-of-vocab code point (the
  * reserved unk id). Same trie, same per-JVM compile cache, same
  * whitespace/code-point contract as [[BpeTokenCount]]; by construction
  * `size(BpeTokenize(t, v)) == BpeTokenCount(t, v)` (spec-pinned).
  */
case class BpeTokenize(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  BpeTokenCount.validateVocab(vocab)

  @transient private lazy val trie: BpeTokenCount.Trie = BpeTokenCount.compile(vocab)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    BpeTokenCount.tokenize(s.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie, classOf[BpeTokenCount.Trie].getName)
    defineCodeGen(ctx, ev, s => s"graft.functions.BpeTokenCount.tokenize($s, $trieRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenize {
  /** Column API entry point. */
  def apply(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.toColumn(BpeTokenize(ColumnBridge.toExpression(text), vocab))
}

object BpeTokenCount {

  private[graft] def validateVocab(vocab: Seq[String]): Unit = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(vocab.forall(v => v.nonEmpty && !v.exists(Character.isWhitespace)),
      "vocab entries must be non-empty and whitespace-free (whitespace separates words)")
    require(vocab.distinct.length == vocab.length, "vocab entries must be distinct")
  }

  /** Byte-level trie. Nodes hold their children as parallel sorted arrays
    * (binary search per byte) — compact for large vocabs where 256-ary
    * arrays would cost ~2 KB per node. `termId` is the entry's 1-based
    * vocab index (0 = not a vocab entry), so the same structure serves
    * both the counting and the id-emitting faces.
    */
  final class Trie extends Serializable {
    var termId: Int = 0
    var keys: Array[Byte] = Array.emptyByteArray
    var kids: Array[Trie] = Array.empty

    private[functions] def childFor(b: Byte): Trie = {
      val i = java.util.Arrays.binarySearch(keys, b)
      if (i >= 0) kids(i) else null
    }

    private[functions] def addChild(b: Byte): Trie = {
      val i = java.util.Arrays.binarySearch(keys, b)
      if (i >= 0) return kids(i)
      val at = -i - 1
      val nk = new Array[Byte](keys.length + 1)
      val nc = new Array[Trie](kids.length + 1)
      System.arraycopy(keys, 0, nk, 0, at)
      System.arraycopy(kids, 0, nc, 0, at)
      nk(at) = b
      val t = new Trie
      nc(at) = t
      System.arraycopy(keys, at, nk, at + 1, keys.length - at)
      System.arraycopy(kids, at, nc, at + 1, kids.length - at)
      keys = nk; kids = nc
      t
    }
  }

  // one compiled trie per distinct vocab per JVM — expressions deserialize
  // per task, and recompiling a 50k-entry vocab per task would dominate
  // short tasks. BOUNDED as a true LRU: a long-lived executor cycling
  // through many distinct vocabularies (per-tenant merges tables) evicts
  // only the least-recently-used entry past MaxCachedVocabs — the earlier
  // clear-all eviction made every new vocab flush all 63 hot tries,
  // thrashing exactly the multi-tenant case the bound exists for.
  // access-order LinkedHashMap under a lock: compile is rare (once per
  // vocab per JVM) and the hot path holds the lock for one map lookup.
  private val MaxCachedVocabs = 64
  private val cache =
    new java.util.LinkedHashMap[Seq[String], Trie](MaxCachedVocabs * 2, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Seq[String], Trie]): Boolean =
        size() > MaxCachedVocabs
    }

  private[graft] def compile(vocab: Seq[String]): Trie = cache.synchronized {
    val hit = cache.get(vocab)
    if (hit != null) hit
    else {
      val root = new Trie
      vocab.zipWithIndex.foreach { case (entry, idx) =>
        var node = root
        entry.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => node = node.addChild(b))
        node.termId = idx + 1
      }
      cache.put(vocab, root)
      root
    }
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** UTF-8 sequence length from the lead byte (1 for continuation/invalid
    * bytes so malformed input still advances and terminates).
    */
  @inline private def seqLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1
    else if (u >= 0xf0) 4
    else if (u >= 0xe0) 3
    else if (u >= 0xc0) 2
    else 1
  }

  /** Static entry the generated code calls: one forward byte scan; at each
    * non-whitespace cursor either the longest trie match or one code point
    * is consumed as a token.
    */
  def count(s: UTF8String, trie: Trie): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var tokens = 0L
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        // longest match starting at i, stopping at whitespace (vocab
        // entries are whitespace-free, so the walk cannot cross a word)
        var node = trie
        var j = i
        var best = -1
        while (node != null && j < n && !isWs(bytes(j))) {
          node = node.childFor(bytes(j))
          if (node != null) {
            j += 1
            if (node.termId > 0) best = j
          }
        }
        i = if (best > i) best else i + seqLen(bytes(i))
        tokens += 1L
      }
    }
    tokens
  }

  /** Id-emitting twin of [[count]] — identical scan, but each consumed
    * token records its 1-based vocab id (0 for an OOV code point).
    * `tokenize(s).numElements == count(s)` by construction.
    */
  def tokenize(s: UTF8String, trie: Trie): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(n / 4, 8))
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        var node = trie
        var j = i
        var best = -1
        var bestId = 0
        while (node != null && j < n && !isWs(bytes(j))) {
          node = node.childFor(bytes(j))
          if (node != null) {
            j += 1
            if (node.termId > 0) { best = j; bestId = node.termId }
          }
        }
        if (best > i) { out += bestId.toLong; i = best }
        else { out += 0L; i += seqLen(bytes(i)) }
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  /** Column API entry point. */
  def apply(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.toColumn(BpeTokenCount(ColumnBridge.toExpression(text), vocab))
}
