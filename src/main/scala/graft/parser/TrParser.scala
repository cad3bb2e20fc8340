package graft.parser

import scala.collection.mutable

import graft.trck.Ir
import graft.trck.Ir._

/** `.tr` DSL → IR compiler: off-side-rule lexer (INDENT/DEDENT synthesis),
  * recursive-descent parser, then the reference's label/flatten/transition
  * passes (reference: src/trparser.py — lexer :16-227, grammar :241-510,
  * assign_numeric_labels/flatten_rules/convert_transitions :516-560).
  */
object TrParser {

  final case class TrParseException(msg: String, line: Int)
      extends RuntimeException(s"$msg (line $line)")

  // ------------------------------------------------------------------ lexer

  sealed trait Tok { def line: Int }
  private final case class TDelta(seconds: Long, line: Int) extends Tok
  private final case class TNum(v: Long, line: Int) extends Tok
  private final case class TDate(epoch: Long, line: Int) extends Tok
  private final case class TStr(v: String, line: Int) extends Tok
  private final case class TId(v: String, line: Int) extends Tok
  private final case class TKw(v: String, line: Int) extends Tok
  private final case class TSigil(kind: Char, name: String, line: Int) extends Tok
  private final case class TOp(v: String, line: Int) extends Tok
  private final case class TNewline(line: Int) extends Tok
  private final case class TIndent(line: Int) extends Tok
  private final case class TDedent(line: Int) extends Tok
  private final case class TEof(line: Int) extends Tok

  private val reserved = Set(
    "after", "receive", "yield", "quit", "window", "repeat", "in", "foreach",
    "to", "merged", "results", "start_timestamp",
  )

  private val deltaRe = raw"(\d+)([smhd])".r
  private val dateRe = raw"'(\d{4})-(\d{2})-(\d{2})'".r

  private def deltaSeconds(n: Long, unit: String): Long = unit match {
    case "s" => n
    case "m" => n * 60
    case "h" => n * 3600
    case "d" => n * 86400
  }

  /** Raw token stream (WS carried for indent levels, then dropped). */
  private def rawLex(text: String): Vector[(String, String, Int)] = {
    // (type, value, line); types: WS NL DELTA NUM DATE STR ID SIGIL OP
    val out = Vector.newBuilder[(String, String, Int)]
    var i = 0
    var line = 1
    val n = text.length
    while (i < n) {
      val rest = text.substring(i)
      // comment: optional spaces then -- to EOL (reference t_comment)
      val cm = raw"^[ ]*--[^\n]*".r.findPrefixOf(rest)
      val escNl = rest.startsWith("\\\n")
      if (cm.isDefined && cm.get.contains("--")) {
        i += cm.get.length
      } else if (escNl) {
        i += 2; line += 1
      } else if (rest.startsWith("\n")) {
        out += (("NL", "", line)); i += 1; line += 1
      } else {
        val ws = raw"^[ \t]+".r.findPrefixOf(rest)
        if (ws.isDefined) { out += (("WS", ws.get, line)); i += ws.get.length }
        else {
          val m1 = raw"^\d+[smhd]".r.findPrefixOf(rest)
          val m2 = raw"^\d+".r.findPrefixOf(rest)
          val m3 = raw"^'\d{4}-\d{2}-\d{2}'".r.findPrefixOf(rest)
          val m4 = raw"^[a-zA-Z_][a-zA-Z_0-9]*".r.findPrefixOf(rest)
          val m5 = raw"^[%#&^@$$][a-zA-Z_][a-zA-Z_0-9]*".r.findPrefixOf(rest)
          val m6 = raw"""^("(\\"|[^"])*")|^('(\\'|[^'])*')""".r.findPrefixOf(rest)
          if (m1.isDefined) { out += (("DELTA", m1.get, line)); i += m1.get.length }
          else if (m3.isDefined) { out += (("DATE", m3.get, line)); i += m3.get.length }
          else if (m2.isDefined) { out += (("NUM", m2.get, line)); i += m2.get.length }
          else if (m4.isDefined) { out += (("ID", m4.get, line)); i += m4.get.length }
          else if (m5.isDefined) { out += (("SIGIL", m5.get, line)); i += m5.get.length }
          else if (m6.isDefined) { out += (("STR", m6.get, line)); i += m6.get.length }
          else {
            val op2 = Seq("<=", ">=", "->").find(rest.startsWith)
            val op1 = Seq("<", ">", ",", "*", "=", "[", "]", "(", ")").find(rest.startsWith)
            if (op2.isDefined) { out += (("OP", op2.get, line)); i += 2 }
            else if (op1.isDefined) { out += (("OP", op1.get, line)); i += 1 }
            else throw TrParseException(s"invalid token at '${rest.take(10)}'", line)
          }
        }
      }
    }
    out.result()
  }

  private def indentLevel(ws: String): Int = ws.replace("\t", "    ").length

  /** INDENT/DEDENT/NEWLINE synthesis (reference: IndentLexer,
    * gen_indents/gen_dedents src/trparser.py:143-227).
    */
  private def lex(text: String): Vector[Tok] = {
    val raw = rawLex(text)
    val out = Vector.newBuilder[Tok]
    val stack = mutable.Stack[Int](0)
    var started = false
    var lineStarted = false
    var prevWs = ""
    var lastLine = 1

    def emitLineStart(level: Int, line: Int): Unit = {
      if (level == stack.top) out += TNewline(line)
      else if (level > stack.top) { stack.push(level); out += TIndent(line) }
      else {
        while (stack.top > level) { stack.pop(); out += TDedent(line) }
        if (stack.top != level)
          throw TrParseException(s"Indent level doesn't match earlier", line)
      }
    }

    def emitTok(typ: String, v: String, line: Int): Unit = {
      lastLine = line
      typ match {
        case "DELTA" =>
          val deltaRe(num, unit) = v: @unchecked
          out += TDelta(deltaSeconds(num.toLong, unit), line)
        case "NUM" => out += TNum(v.toLong, line)
        case "DATE" =>
          val dateRe(y, mo, d) = v: @unchecked
          val epoch = java.time.LocalDate.of(y.toInt, mo.toInt, d.toInt)
            .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
          out += TDate(epoch, line)
        case "STR" => out += TStr(v.substring(1, v.length - 1), line)
        case "ID" =>
          if (reserved(v)) out += TKw(v, line) else out += TId(v, line)
        case "SIGIL" => out += TSigil(v.head, v.tail, line)
        case "OP"    => out += TOp(v, line)
        case _       => ()
      }
    }

    for ((typ, v, line) <- raw) {
      if (!started) {
        if (typ != "NL" && typ != "WS") {
          started = true; lineStarted = true
          emitTok(typ, v, line)
        }
      } else typ match {
        case "NL" => lineStarted = false; prevWs = ""
        case "WS" => prevWs = v
        case _ =>
          if (!lineStarted) {
            lineStarted = true
            emitLineStart(indentLevel(prevWs), line)
          }
          emitTok(typ, v, line)
      }
    }
    while (stack.nonEmpty && stack.top > 0) { stack.pop(); out += TDedent(lastLine) }
    out += TEof(lastLine)
    out.result()
  }

  // ----------------------------------------------------------------- parser

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Tok = toks(pos)
    def peek2: Tok = toks(math.min(pos + 1, toks.length - 1))
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def save: Int = pos
    def restore(p: Int): Unit = pos = p

    def err(msg: String): Nothing = throw TrParseException(s"$msg, got ${peek}", peek.line)

    def expectOp(op: String): Unit = peek match {
      case TOp(`op`, _) => pos += 1
      case _            => err(s"expected '$op'")
    }
    def expectKw(kw: String): Unit = peek match {
      case TKw(`kw`, _) => pos += 1
      case _            => err(s"expected '$kw'")
    }
    def expectIndent(): Unit = peek match {
      case _: TIndent => pos += 1
      case _          => err("expected indented block")
    }
    def expectDedent(): Unit = peek match {
      case _: TDedent => pos += 1
      case _          => err("expected dedent")
    }
    def skipNewlines(): Unit = while (peek.isInstanceOf[TNewline]) pos += 1
  }

  // parse tree before flattening
  private final case class PClause(attrs: Map[String, List[String]], yields: List[Yield], action: Option[String], line: Int)
  private final case class PAfter(yields: List[Yield], action: Option[String])
  private final case class PRule(
      name: String,
      window: Option[Long],
      clauses: List[PClause],
      after: Option[PAfter],
      nested: List[PRule],
      line: Int,
  )

  def parse(text: String): Program = {
    val p = new P(lex(text))

    var groupby: Option[GroupBy] = None
    val topRules: List[PRule] = p.peek match {
      case TKw("foreach", _) =>
        groupby = Some(parseForeach(p))
        p.expectIndent()
        val rs = parseRules(p)
        p.expectDedent()
        rs
      case _ => parseRules(p)
    }

    // ---- assign numeric labels + outer bounds + flatten
    // (reference: assign_numeric_labels + flatten_rules,
    // src/trparser.py:516-533 — a window rule's `outer` is the label one
    // past its last nested rule)
    val flatRules = mutable.ArrayBuffer[(PRule, Option[Int])]()
    def flatten(rs: List[PRule]): Unit = rs.foreach { r =>
      val myIdx = flatRules.length
      flatRules += ((r, None))
      if (r.nested.nonEmpty) {
        flatten(r.nested)
        flatRules(myIdx) = (r, Some(flatRules.length))
      }
    }
    flatten(topRules)

    val numeric: Map[String, Int] =
      flatRules.zipWithIndex.map { case ((r, _), i) => r.name -> i }.toMap

    val reservedActions = Set("repeat", "quit")

    val irRules = flatRules.zipWithIndex.map { case ((r, outerEnd), i) =>
      val clauses = r.clauses.map { c =>
        val action = c.action match {
          case Some(a) if reservedActions(a) => a
          case Some(a) =>
            numeric.get(a) match {
              case Some(ni) => s"restart-from-next($ni)"
              case None     => throw TrParseException(s"Label not found: $a", c.line)
            }
          case None =>
            if (i >= 1) throw TrParseException("Consider adding repeat here", c.line)
            else "repeat"
        }
        Clause(c.attrs, negated = false, Some(action), c.yields)
      }
      val after = r.after.map { a =>
        val action = a.action match {
          case Some(act) if reservedActions(act) => act
          case Some(act) =>
            numeric.get(act) match {
              case Some(ni) => s"restart-from-here($ni)"
              case None     => throw TrParseException(s"Label not found: $act", r.line)
            }
          case None => "restart-from-here"
        }
        Clause(Map.empty, negated = false, Some(action), a.yields)
      }
      Rule(
        name = Some(r.name),
        window = r.window,
        outer = outerEnd,
        entrypoint = false,
        clauses = clauses,
        after = after,
      )
    }.toVector

    Program(irRules, groupby)
  }

  private def parseForeach(p: P): GroupBy = {
    p.expectKw("foreach")
    val vars = mutable.ListBuffer[String]()
    def parseVar(): Unit = p.next() match {
      case TSigil('%', n, _) => vars += s"%$n"
      case TSigil('#', n, _) => vars += s"#$n"
      case t                 => p.err(s"expected %var or #var")
    }
    parseVar()
    while (p.peek == TOp(",", p.peek.line)) { p.next(); parseVar() }
    p.peek match {
      case TKw("in", _) =>
        p.next()
        val arr = p.next() match {
          case TSigil('@', n, _) => s"@$n"
          case _                 => p.err("expected @array")
        }
        val merged = parseMerged(p)
        GroupBy(vars.toList, Some(arr), merged)
      case _ =>
        if (vars.size != 1 || !vars.head.startsWith("%"))
          p.err("implicit foreach requires a single %var")
        val merged = parseMerged(p)
        GroupBy(vars.toList, None, merged)
    }
  }

  private def parseMerged(p: P): Boolean = p.peek match {
    case TKw("merged", _) =>
      p.next()
      p.peek match { case TKw("results", _) => p.next(); case _ => () }
      true
    case _ => false
  }

  private def parseRules(p: P): List[PRule] = {
    val rules = mutable.ListBuffer[PRule]()
    var continue = true
    while (continue) {
      p.skipNewlines()
      p.peek match {
        case TId(name, line) =>
          p.next()
          p.expectOp("->")
          p.expectIndent()
          rules += parseRuleBody(p, name, line)
          p.expectDedent()
        case _ => continue = false
      }
    }
    if (rules.isEmpty) p.err("expected at least one rule")
    rules.toList
  }

  private def parseRuleBody(p: P, name: String, line: Int): PRule = p.peek match {
    case TKw("window", _) =>
      p.next()
      p.expectIndent()
      val nested = parseRules(p)
      p.expectDedent()
      p.expectKw("after")
      val dur = p.next() match {
        case TDelta(s, _) => s
        case _            => p.err("expected timedelta after 'after'")
      }
      p.expectOp("->")
      val (ys, act) = parseActions(p)
      PRule(name, Some(dur), Nil, Some(PAfter(ys, act)), nested, line)
    case TKw("receive", _) =>
      p.next()
      p.expectIndent()
      val clauses = parseClauses(p)
      p.expectDedent()
      p.peek match {
        case TKw("after", _) =>
          p.next()
          p.peek match {
            case TDelta(s, _) =>
              p.next()
              p.expectOp("->")
              val (ys, act) = parseActions(p)
              PRule(name, Some(s), clauses, Some(PAfter(ys, act)), Nil, line)
            case _ =>
              p.expectOp("->")
              val (ys, act) = parseActions(p)
              PRule(name, None, clauses, Some(PAfter(ys, act)), Nil, line)
          }
        case _ => PRule(name, None, clauses, None, Nil, line)
      }
    case _ => p.err("expected 'window' or 'receive'")
  }

  private def parseClauses(p: P): List[PClause] = {
    val cs = mutable.ListBuffer[PClause]()
    cs += parseClause(p)
    var continue = true
    while (continue) p.peek match {
      case _: TNewline =>
        p.next()
        p.peek match {
          case _: TDedent | _: TEof => continue = false
          case _                    => cs += parseClause(p)
        }
      case _ => continue = false
    }
    cs.toList
  }

  private def parseClause(p: P): PClause = {
    val line = p.peek.line
    val attrs: Map[String, List[String]] = p.peek match {
      case TOp("*", _) => p.next(); Map.empty
      case _ =>
        val items = mutable.ListBuffer[(String, String)]()
        def parseCond(): Unit = {
          val field = p.next() match {
            case TId(f, _) => f
            case _         => p.err("expected field name")
          }
          p.next() match {
            case TOp("=", _) =>
              p.next() match {
                case TStr(s, _)        => items += field -> s
                case TSigil('%', n, _) => items += field -> s"%$n"
                case TDate(e, _)       => items += field -> e.toString
                case _                 => p.err("expected string or %var after '='")
              }
            case TKw("in", _) =>
              p.next() match {
                case TSigil('#', n, _) => items += field -> s"#$n"
                case _                 => p.err("expected #set after 'in'")
              }
            case TOp(op, _) if Set("<", ">", "<=", ">=")(op) =>
              p.next() match {
                case TNum(v, _)        => items += field -> s"$op$v"
                case TDate(e, _)       => items += field -> s"$op$e"
                case TSigil('%', n, _) => items += field -> s"$op%$n"
                case _                 => p.err("expected number, date or %var")
              }
            case _ => p.err("expected =, in or comparison")
          }
        }
        parseCond()
        var more = true
        while (more) p.peek match {
          case TOp(",", _) => p.next(); parseCond()
          case _           => more = false
        }
        items.toList.groupBy(_._1).map { case (f, vs) => f -> vs.map(_._2).toList }
    }
    p.expectOp("->")
    val (ys, act) = parseActions(p)
    PClause(attrs, ys, act, line)
  }

  private def parseActions(p: P): (List[Yield], Option[String]) = {
    p.peek match {
      case TKw("yield", _) =>
        val ys = mutable.ListBuffer[Yield]()
        p.next()
        ys += parseYieldVar(p)
        var action: Option[String] = None
        var more = true
        while (more && action.isEmpty) p.peek match {
          case TOp(",", _) =>
            p.next()
            p.peek match {
              case TKw("yield", _) => p.next(); ys += parseYieldVar(p)
              case _               => action = Some(parseTransition(p))
            }
          case _ => more = false
        }
        (ys.toList, action)
      case _ => (Nil, Some(parseTransition(p)))
    }
  }

  private def parseTransition(p: P): String = p.next() match {
    case TId(n, _)       => n
    case TKw("quit", _)  => "quit"
    case TKw("repeat", _) => "repeat"
    case t               => p.err("expected transition")
  }

  private def parseYieldVar(p: P): Yield = p.peek match {
    case TSigil('$', n, _) => p.next(); Yield(s"$$$n", Nil)
    case _ =>
      val terms = mutable.ListBuffer[YieldTerm]()
      terms += parseYieldable(p)
      var more = true
      while (more) p.peek match {
        case TOp(",", _) =>
          // lookahead: yields-list COMMA could also precede the transition —
          // but inside a tuple yield the grammar requires TO eventually, and
          // tuple elements are ID/start_timestamp/fcall; a following
          // yield/quit/repeat keyword means the comma wasn't ours
          p.peek2 match {
            case TKw("yield", _) | TKw("quit", _) | TKw("repeat", _) => more = false
            case _ => p.next(); terms += parseYieldable(p)
          }
        case _ => more = false
      }
      p.expectKw("to")
      val dst = p.next() match {
        case TSigil('#', n, _) => s"#$n"
        case TSigil('&', n, _) => s"&$n"
        case TSigil('^', n, _) => s"^$n"
        case _                 => p.err("expected #set, &multiset or ^hll after 'to'")
      }
      Yield(dst, terms.toList)
  }

  private def parseYieldable(p: P): YieldTerm = p.peek match {
    case TKw("start_timestamp", _) =>
      p.next()
      p.peek match {
        case TOp("[", _) =>
          p.next()
          val label = p.next() match {
            case TId(n, _) => n
            case _         => p.err("expected window label")
          }
          p.expectOp("]")
          WindowRefTerm(Some(label))
        case _ => WindowRefTerm(None)
      }
    case TId(n, _) =>
      p.next()
      p.peek match {
        case TOp("(", _) => parseFcallArgs(p, n)
        case _           => FieldTerm(n)
      }
    case _ => p.err("expected yieldable")
  }

  private def parseFcallArgs(p: P, name: String): YieldTerm = {
    p.expectOp("(")
    val args = mutable.ListBuffer[YieldTerm]()
    def parseArg(): Unit = p.peek match {
      case TSigil('%', n, _) => p.next(); args += ParamTerm(s"%$n")
      case TStr(s, _)        => p.next(); args += LiteralTerm(s)
      case TNum(v, _)        => p.next(); args += LiteralTerm(v.toString)
      case TKw("start_timestamp", _) => args += parseYieldable(p)
      case TId(_, _)         => args += parseYieldable(p)
      case _                 => p.err("expected fcall argument")
    }
    p.peek match {
      case TOp(")", _) => ()
      case _ =>
        parseArg()
        var more = true
        while (more) p.peek match {
          case TOp(",", _) => p.next(); parseArg()
          case _           => more = false
        }
    }
    p.expectOp(")")
    FcallTerm(name, args.toList)
  }

  /** Extract the `----- unit tests ----` JSON trailer of a .tr file
    * (reference: test/run_all_tests_c.sh:7 awk + sed).
    */
  def extractTestTrailer(text: String): Option[String] = {
    val lines = text.linesIterator.toVector
    val idx = lines.indexWhere(_.matches(".*-- ?unit tests ?--.*"))
    if (idx < 0) None
    else Some(lines.drop(idx + 1).map(_.replaceFirst("^-+", "")).mkString("\n"))
  }

  /** Program text = everything before the trailer marker. */
  def programText(text: String): String = {
    val lines = text.linesIterator.toVector
    val idx = lines.indexWhere(_.matches(".*-- ?unit tests ?--.*"))
    if (idx < 0) text else lines.take(idx).mkString("\n")
  }
}
