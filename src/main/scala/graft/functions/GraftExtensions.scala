package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ScalaUDF}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions hook registering graft's native expressions and
  * aggregates with the SQL function registry, so
  * `spark.sql("SELECT cosine_similarity(a,b) ...")` and
  * `spark.sql("SELECT trck_hll(item) ... GROUP BY ...")` work alongside
  * the Column API. Install via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (GraftSession does) or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(args(0), args(1))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("shingle_hash64"),
      new ExpressionInfo(classOf[ShingleHash64].getName, "shingle_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hash64 takes (text, k)")
        val k = args(1) match {
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"shingle_hash64's k must be an int literal, got ${other.sql}")
        }
        ShingleHash64(args(0), k)
      },
    ))
    // perceptual image hashes over a binary blob column — the SQL face of
    // Multimodal.decodeAndFeaturize's kernels (NULL on undecodable /
    // oversized blobs; decode-per-row is the documented cost)
    for ((name, gradient) <- Seq(("ahash64", false), ("dhash64", true)))
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[PerceptualHash64].getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name takes exactly 1 argument (binary blob)")
          PerceptualHash64(args(0), gradient)
        },
      ))
    // banded audio fingerprint over a binary WAV column — the SQL face of
    // Audio.fingerprintPcm8 (NULL on undecodable / truncated / oversized
    // blobs; streamed decode-per-row is the documented cost)
    ext.injectFunction((
      FunctionIdentifier("afp32"),
      new ExpressionInfo(classOf[AudioFingerprint32].getName, "afp32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "afp32 takes exactly 1 argument (binary blob)")
        AudioFingerprint32(args(0))
      },
    ))
    // the three tokenizer families as SQL functions — vocabularies are
    // foldable array literals (the shingle_hash64 literal-parameter
    // discipline), evaluated once at plan time so the per-JVM trie/model
    // caches behave exactly as in the Column API
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bpe_token_count takes (text, vocab array literal)")
        BpeTokenCount(args(0), GraftExtensions.stringSeqLiteral(args(1), "bpe_token_count"))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("bpe_tokenize"),
      new ExpressionInfo(classOf[BpeTokenize].getName, "bpe_tokenize"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bpe_tokenize takes (text, vocab array literal)")
        BpeTokenize(args(0), GraftExtensions.stringSeqLiteral(args(1), "bpe_tokenize"))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("wordpiece_tokenize"),
      new ExpressionInfo(classOf[WordPieceTokenize].getName, "wordpiece_tokenize"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "wordpiece_tokenize takes (text, vocab array literal)")
        WordPieceTokenize(args(0), GraftExtensions.stringSeqLiteral(args(1), "wordpiece_tokenize"))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("unigram_tokenize"),
      new ExpressionInfo(classOf[UnigramTokenize].getName, "unigram_tokenize"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "unigram_tokenize takes (text, pieces array literal, scores array literal)")
        val pieces = GraftExtensions.stringSeqLiteral(args(1), "unigram_tokenize")
        val scores = GraftExtensions.longSeqLiteral(args(2), "unigram_tokenize")
        require(pieces.length == scores.length,
          s"unigram_tokenize: ${pieces.length} pieces vs ${scores.length} scores")
        UnigramTokenize(args(0), pieces.zip(scores))
      },
    ))
    // the quantile-sketch integer arithmetic as scalar SQL — with GROUP BY
    // these express the whole log-histogram declaratively, and the bound
    // decoders read any stored bucket column back to value ranges
    ext.injectFunction((
      FunctionIdentifier("qsketch_bucket"),
      new ExpressionInfo(classOf[QsketchBucket].getName, "qsketch_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "qsketch_bucket takes exactly 1 argument (bigint value)")
        QsketchBucket(args(0))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("qsketch_lo"),
      new ExpressionInfo(classOf[QsketchLo].getName, "qsketch_lo"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "qsketch_lo takes exactly 1 argument (bigint bucket)")
        QsketchLo(args(0))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("qsketch_hi"),
      new ExpressionInfo(classOf[QsketchHi].getName, "qsketch_hi"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "qsketch_hi takes exactly 1 argument (bigint bucket)")
        QsketchHi(args(0))
      },
    ))
    // trck-format HLL sketch of a binary column → reference RLE-hex.
    // Spark's partial aggregation runs the register-max merge, so the SQL
    // form distributes exactly like the Column API one.
    ext.injectFunction((
      FunctionIdentifier("trck_hll"),
      new ExpressionInfo(HllAggregator.getClass.getName, "trck_hll"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "trck_hll takes exactly 1 argument (binary item)")
        val binEnc = ExpressionEncoder(AgnosticEncoders.BinaryEncoder)
        new ScalaAggregator(args.toList, HllAggregator.toHex, binEnc, binEnc,
          true, true, 0, 0, Some("trck_hll"))
      },
    ))
    // cardinality estimate of a trck RLE-hex sketch (tiny post-aggregation
    // rows — scalar UDF is off the hot path)
    ext.injectFunction((
      FunctionIdentifier("trck_hll_estimate"),
      new ExpressionInfo(HllAggregator.getClass.getName, "trck_hll_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "trck_hll_estimate takes exactly 1 argument (hex sketch)")
        ScalaUDF(
          // NULL sketch → NULL estimate, like any SQL scalar function
          (hex: String) =>
            (if (hex == null) null
             else java.lang.Double.valueOf(HllAggregator.estimate(hex))): java.lang.Double,
          DoubleType, args.toList,
          List(Some(ExpressionEncoder(AgnosticEncoders.StringEncoder))),
          None, Some("trck_hll_estimate"), true, true)
      },
    ))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** A foldable `array<string>` literal argument, evaluated at plan time. */
  private[functions] def stringSeqLiteral(e: Expression, fn: String): Seq[String] = {
    require(e.foldable && e.dataType == ArrayType(StringType, containsNull = false) ||
      e.foldable && e.dataType == ArrayType(StringType, containsNull = true),
      s"$fn's vocabulary must be an array<string> literal, got ${e.sql}")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null, s"$fn's vocabulary literal must not be null")
    ad.toObjectArray(StringType).map { v =>
      require(v != null, s"$fn's vocabulary must not contain nulls")
      v.asInstanceOf[UTF8String].toString
    }.toSeq
  }

  /** A foldable `array<bigint>` literal argument, evaluated at plan time. */
  private[functions] def longSeqLiteral(e: Expression, fn: String): Seq[Long] = {
    require(e.foldable && e.dataType.isInstanceOf[ArrayType] &&
      e.dataType.asInstanceOf[ArrayType].elementType == LongType,
      s"$fn's scores must be an array<bigint> literal, got ${e.sql}")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null, s"$fn's scores literal must not be null")
    ad.toLongArray().toSeq
  }
}
