package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch over whitespace tokens (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications") — the fixed-size frequency summary a 100 TB token
  * stream is profiled with when the exact `groupBy(token)` table (one row
  * per DISTINCT token, unbounded) no longer fits anywhere.
  *
  * Structure: a `depth × width` matrix of counters; token occurrence t
  * increments cell `(r, h_r(t))` for every row r; the point estimate for
  * t is `min_r matrix(r, h_r(t))` — always ≥ the true count (one-sided
  * error), within `ε·N` of it with probability `1 − (1/2)^depth` for
  * `width = 2/ε` under pairwise-independent hashes.
  *
  * Determinism: `h_r(t)` = the first 32 bits of `md5("r:" || t)` mod
  * `width` — the module family's md5 idiom, so a DuckDB oracle replays
  * the ENTIRE sketch (matrix and estimates) integer-exactly with
  * `CAST('0x' || substring(md5(r || ':' || t), 1, 8) AS BIGINT) % width`.
  * No seeds, no JVM hash dependence.
  *
  * Scale shape: [[CmsSketch.Agg]] is a typed `Aggregator` consuming raw
  * document text — tokenization happens inside `reduce`, so the corpus is
  * never exploded into a token-per-row shuffle; each task folds its
  * partition into one `depth·width` long array (16 KB at 4×512) and the
  * exchange carries exactly one partial per partition, merged
  * elementwise. The declarative equivalent (explode → groupBy (r,
  * bucket)) shuffles one slim row per TOKEN OCCURRENCE — billions of rows
  * at corpus scale where the Aggregator ships kilobytes; CmsSpec pins the
  * two builds equal, and the oracle replays the declarative form.
  */
object CmsSketch {

  /** Row-r bucket of `token`: first 4 md5 bytes of `"r:token"` read
    * big-endian unsigned (the value DuckDB's `'0x' || substring(md5(x),
    * 1, 8)` cast parses), mod `width`.
    */
  def bucket(row: Int, token: String, width: Int): Int = {
    val md = threadDigest.get()
    md.reset()
    val h = md.digest((row.toString + ":" + token).getBytes(StandardCharsets.UTF_8))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % width).toInt
  }

  private val threadDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The Java-regex `\s` set — the module's tokenization family
    * (`split(trim(text), "\\s+")`), so Aggregator tokenization and the
    * declarative explode see identical tokens.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** Fold `text`'s whitespace tokens into the matrix `buf` (layout: row r
    * at `[r·width, (r+1)·width)`). Shared by the batch Aggregator and the
    * streaming face so the two cannot drift.
    */
  private[graft] def addText(buf: Array[Long], text: String, depth: Int, width: Int): Unit = {
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(text.charAt(i))) i += 1
        val tok = text.substring(start, i)
        var r = 0
        while (r < depth) { buf(r * width + bucket(r, tok, width)) += 1L; r += 1 }
      }
    }
  }

  /** Point estimate of `token` from a finished matrix: min over rows. */
  def estimate(matrix: Array[Long], token: String, depth: Int, width: Int): Long = {
    require(matrix.length == depth * width,
      s"matrix length ${matrix.length} != depth*width ${depth * width}")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = matrix(r * width + bucket(r, token, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** One-pass map-side-merge sketch builder over a text column. */
  final class Agg(val depth: Int, val width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], text: String): Array[Long] = {
      if (text != null) addText(buf, text, depth, width)
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
