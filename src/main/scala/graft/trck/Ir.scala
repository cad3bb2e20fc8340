package graft.trck

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The trck JSON intermediate representation, re-expressed as Scala case
  * classes. This is the stable seam of the reference compiler
  * (reference: src/trparser.py:516-560 emits it; src/fsm2c.py:530-609
  * consumes it), and the reference test corpus contains programs written
  * directly in it (reference: the test/json corpus), so accepting raw IR gives
  * us that corpus before the `.tr` parser exists.
  *
  * Shape (one rule):
  * {{{
  * { "name": "main", "n": 0, "window": 100, "outer": 3, "entrypoint": true,
  *   "clauses": [ {"attrs": {"type": ["cli", "%p", ">=123"]}, "op": "not",
  *                 "action": "restart-from-next(2)",
  *                 "yield": [{"dst": "$c"}, {"dst": "#s", "src": [...]}]} ],
  *   "after": {"action": "quit", "yield": [...]} }
  * }}}
  *
  * attrs values are condition-expression strings: a constant, a `%scalar` /
  * `#set` variable, or (timestamp only) `<op><value>` (reference:
  * src/trparser.py:596-607 parse_expr).
  */
object Ir {

  sealed trait YieldTerm
  final case class FieldTerm(name: String) extends YieldTerm
  final case class LiteralTerm(value: String) extends YieldTerm
  final case class ParamTerm(name: String) extends YieldTerm
  /** start_timestamp / start_timestamp[label] (reference: src/fsm2c.py:239-260) */
  final case class WindowRefTerm(ref: Option[String]) extends YieldTerm
  /** external function call (reference: src/fsm2c.py:307-326) */
  final case class FcallTerm(name: String, args: List[YieldTerm]) extends YieldTerm

  final case class Yield(dst: String, src: List[YieldTerm])

  final case class Clause(
      attrs: Map[String, List[String]],
      negated: Boolean,
      action: Option[String],
      yields: List[Yield],
  )

  final case class Rule(
      name: Option[String],
      window: Option[Long],
      /** present ⇒ this is a window-block marker rule; value = id one past
        * the last nested rule (reference: src/trparser.py:516-523)
        */
      outer: Option[Int],
      entrypoint: Boolean,
      clauses: List[Clause],
      after: Option[Clause],
  )

  final case class GroupBy(
      vars: List[String],
      /** `@arr` param name for explicit foreach; None = implicit lexicon sweep */
      values: Option[String],
      mergeResults: Boolean,
  )

  final case class Program(rules: Vector[Rule], groupby: Option[GroupBy])

  // ------------------------------------------------------------- JSON codec

  def parseProgram(json: String): Program = fromJValue(JsonMethods.parse(json))

  def fromJValue(jv: JValue): Program = {
    val rules = (jv \ "rules") match {
      case JArray(rs) => rs.toVector.map(parseRule)
      case _          => sys.error("program JSON has no 'rules' array")
    }
    val groupby = (jv \ "groupby") match {
      case JObject(_) =>
        val g = jv \ "groupby"
        Some(
          GroupBy(
            vars = (g \ "vars").extractOpt[List[String]](fmts, manifest[List[String]]).getOrElse(Nil),
            values = (g \ "values").extractOpt[String](fmts, manifest[String]),
            mergeResults = (g \ "merge_results").extractOpt[Boolean](fmts, manifest[Boolean]).getOrElse(false),
          )
        )
      case _ => None
    }
    Program(rules, groupby)
  }

  private implicit val fmts: Formats = DefaultFormats

  private def parseRule(jv: JValue): Rule =
    Rule(
      name = (jv \ "name").extractOpt[String],
      window = (jv \ "window").extractOpt[Long],
      outer = (jv \ "outer").extractOpt[Int],
      entrypoint = (jv \ "entrypoint").extractOpt[Boolean].getOrElse(false),
      clauses = (jv \ "clauses") match {
        case JArray(cs) => cs.map(parseClause)
        case _          => Nil
      },
      after = (jv \ "after") match {
        case o: JObject => Some(parseClause(o))
        case _          => None
      },
    )

  private def parseClause(jv: JValue): Clause =
    Clause(
      attrs = (jv \ "attrs") match {
        case JObject(fields) =>
          fields.map { case (k, v) =>
            k -> (v match {
              case JArray(es) => es.map(exprString)
              case other      => List(exprString(other))
            })
          }.toMap
        case _ => Map.empty
      },
      negated = (jv \ "op").extractOpt[String].contains("not"),
      action = (jv \ "action").extractOpt[String],
      // yield accepts: an array of {dst,src} objects, a single bare object,
      // or bare "$x" strings (all occur in the reference test corpus)
      yields = (jv \ "yield") match {
        case JArray(ys) => ys.map(parseYield)
        case o: JObject => List(parseYield(o))
        case JString(s) => List(Yield(s, Nil))
        case _          => Nil
      },
    )

  private def exprString(jv: JValue): String = jv match {
    case JString(s) => s
    case JInt(i)    => i.toString
    case JLong(l)   => l.toString
    case other      => sys.error(s"bad condition expr: $other")
  }

  private def parseYield(jv: JValue): Yield = jv match {
    case JString(s) => Yield(s, Nil)
    case _ =>
      Yield(
        dst = (jv \ "dst").extract[String],
        src = (jv \ "src") match {
          case JArray(ts) => ts.map(parseTerm)
          case _          => Nil
        },
      )
  }

  private def parseTerm(jv: JValue): YieldTerm = (jv \ "_k").extract[String] match {
    case "field"   => FieldTerm((jv \ "name").extract[String])
    case "literal" =>
      (jv \ "value") match {
        case JString(s) => LiteralTerm(s)
        case JInt(i)    => LiteralTerm(i.toString)
        case JLong(l)   => LiteralTerm(l.toString)
        case other      => sys.error(s"bad literal: $other")
      }
    case "param"      => ParamTerm((jv \ "name").extract[String])
    case "window_ref" => WindowRefTerm((jv \ "ref").extractOpt[String])
    case "fcall" =>
      FcallTerm(
        (jv \ "name").extract[String],
        (jv \ "args") match { case JArray(as) => as.map(parseTerm); case _ => Nil },
      )
    case other => sys.error(s"unknown yield term kind: $other")
  }

  // ---------------------------------------------------------------- helpers

  /** Variable sigils (reference: src/fsm2c.py:89-105). */
  def varType(n: String): String = n.headOption match {
    case Some('#') => "set"
    case Some('&') => "multiset"
    case Some('%') => "scalar"
    case Some('@') => "composite"
    case Some('$') => "counter"
    case Some('^') => "hll"
    case _         => sys.error(s"not a variable: $n")
  }

  def isVariable(n: String): Boolean =
    n.nonEmpty && "#&%$@^".contains(n.head)

  def stripType(n: String): String = n.tail
}
