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

  def render(outputs: Vector[mutable.LinkedHashMap[String, Any]], grouped: Boolean): String =
    if (!grouped) renderOne(outputs.head)
    else outputs.map(renderOne).mkString("[", ",\n", "]")
}
