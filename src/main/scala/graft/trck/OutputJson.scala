package graft.trck

import scala.collection.mutable

/** Reference-format JSON result rendering
  * (reference: src/results_json.c:233-295 — a single object for merged /
  * groupby-less runs, else an array of per-tuple objects with the foreach
  * params echoed back).
  */
object OutputJson {

  /** Explicitly-tagged multiset value: always renders as a JSON object,
    * including when empty (reference: src/results_json.c:162-186
    * multiset_to_json prints braces unconditionally — an empty multiset is
    * `{}`, never `[]`).
    */
  final case class Mset(entries: Vector[(String, Long)])

  private[graft] def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  private def renderValue(v: Any): String = v match {
    case l: Long   => l.toString
    case i: Int    => i.toString
    case s: String => "\"" + esc(s) + "\""
    case Mset(es) =>
      es.map { case (k, c) => "\"" + esc(k) + "\":" + c }
        .mkString("{", ",", "}")
    case xs: Vector[_] =>
      xs.map(x => "\"" + esc(x.toString) + "\"").mkString("[", ",", "]")
    case other => "\"" + esc(other.toString) + "\""
  }

  def renderOne(m: mutable.LinkedHashMap[String, Any]): String =
    m.map { case (k, v) => "\"" + esc(k) + "\":" + renderValue(v) }
      .mkString("{", ",", "}")

  /** Driver-side render budget. Results are small by reference contract
    * (per-tuple counters/set tallies — the reason the reference renders
    * them in one buffer, src/results_json.c:233-295), but a pathological
    * set-yield program over a wide lexicon can render gigabytes; rather
    * than dying as an opaque driver OOM mid-string-build, [[render]]
    * fails fast with a clear message once the rendered size crosses this
    * bound. 256 MiB is ~100× the largest legitimate result the golden
    * corpus produces; pass an explicit bound to raise it deliberately.
    */
  val DefaultMaxRenderBytes: Long = 256L << 20

  def render(outputs: Vector[mutable.LinkedHashMap[String, Any]], grouped: Boolean,
             maxRenderBytes: Long = DefaultMaxRenderBytes): String =
    if (!grouped) {
      val one = renderOne(outputs.head)
      requireWithinBudget(one.length.toLong, maxRenderBytes)
      one
    } else {
      val sb = new java.lang.StringBuilder("[")
      var i = 0
      while (i < outputs.length) {
        if (i > 0) sb.append(",\n")
        sb.append(renderOne(outputs(i)))
        requireWithinBudget(sb.length.toLong, maxRenderBytes)
        i += 1
      }
      sb.append("]").toString
    }

  private def requireWithinBudget(size: Long, maxRenderBytes: Long): Unit =
    if (size > maxRenderBytes)
      throw new IllegalStateException(
        s"JSON result exceeds the ${maxRenderBytes}-byte render budget — results are " +
          "driver-rendered (reference semantics: small per-tuple tallies); a set yield " +
          "over a huge lexicon should aggregate through the relational engine instead, " +
          "or pass a larger maxRenderBytes to OutputJson.render deliberately")
}
