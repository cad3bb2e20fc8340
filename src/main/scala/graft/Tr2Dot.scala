package graft

import java.nio.file.{Files, Paths}

import graft.parser.TrParser
import graft.trck.Ir

/** `.tr` program → Graphviz DOT dump for debugging machine structure —
  * the analog of the reference's `bin/tr2png` (rules as nodes, transitions
  * as edges), extended to all action kinds: break falls through to the
  * next rule, restart-from-here/next jump to their target, quit exits, and
  * `after` edges carry the window duration. Emits DOT text (render with
  * `dot -Tpng`, or use [[Tr2Png]] for a dependency-free PNG); the
  * structured [[Tr2Dot.graph]] model is shared by both renderers.
  *
  * Usage: runMain graft.Tr2Dot prog.tr [out.dot]   (stdout when no out)
  */
object Tr2Dot {

  /** One FSM node (a rule, or the terminal "quit"). `windowSec` renders
    * as a second label line; `dashed` marks window-block rules.
    */
  final case class Node(id: String, name: String, windowSec: Option[Long], dashed: Boolean)

  /** One transition edge. `labelLines` are RAW (unescaped) text lines;
    * `color` is a DOT color name ("gray" self-loops, "red" unknown
    * actions); `dotted` marks `after` edges.
    */
  final case class Edge(src: String, dst: String, labelLines: Seq[String],
                        color: Option[String], dotted: Boolean)

  // parens optional: the parser emits a BARE "restart-from-here" for the
  // default after-action (TrParser.scala:263), which Compiled.parseAction
  // reads as target rule 0 — the bare form must draw the same jump edge,
  // not fall through to the red unknown-action branch
  private val RestartRe = """restart-from-(?:here|next)(?:\((\d+)\))?""".r

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def clauseLines(c: Ir.Clause): Seq[String] = {
    val conds =
      if (c.attrs.isEmpty) "*"
      else c.attrs.map { case (k, vs) => s"$k=${vs.mkString(",")}" }.mkString(", ")
    val neg = if (c.negated) "not " else ""
    val ys = c.yields.map(y => s"yield ${y.dst}").mkString(", ")
    if (ys.isEmpty) Seq(neg + conds) else Seq(neg + conds, ys)
  }

  /** prefix merged INTO the first line (a prefix is "after 600s: " or
    * "action: " — it qualifies the condition, not a line of its own)
    */
  private def prefixed(prefix: String, lines: Seq[String]): Seq[String] = lines match {
    case h +: t => (prefix + h) +: t
    case _      => Seq(prefix)
  }

  /** edges for one clause's action from rule `i` (shared by DOT and PNG) */
  private def actionEdges(i: Int, nRules: Int, c: Ir.Clause, dotted: Boolean,
                          prefix: String = ""): Seq[Edge] = {
    val label = prefixed(prefix, clauseLines(c))
    c.action.getOrElse("repeat") match {
      case "repeat" => Seq(Edge(s"r$i", s"r$i", label, Some("gray"), dotted))
      case "break" =>
        val dst = if (i + 1 < nRules) s"r${i + 1}" else "quit"
        Seq(Edge(s"r$i", dst, label, None, dotted))
      case "quit"       => Seq(Edge(s"r$i", "quit", label, None, dotted))
      case RestartRe(l) =>
        // bare form (no parens) ⇒ group is null ⇒ target 0, matching
        // Compiled.parseAction's getOrElse(0)
        Seq(Edge(s"r$i", s"r${Option(l).getOrElse("0")}", label, None, dotted))
      case other => Seq(Edge(s"r$i", s"r$i", prefixed(s"$other: ", label), Some("red"), dotted))
    }
  }

  /** The structured machine graph: nodes (rules + quit), edges, and the
    * optional foreach caption — the single model both renderers draw.
    */
  def graph(program: Ir.Program): (Seq[Node], Seq[Edge], Option[String]) = {
    val rules = program.rules
    val caption = program.groupby.map(g =>
      s"foreach ${g.vars.mkString(", ")}${g.values.fold("")(" in " + _)}")
    val nodes = rules.zipWithIndex.map { case (r, i) =>
      Node(s"r$i", r.name.getOrElse(s"rule$i"), r.window, r.outer.isDefined)
    } :+ Node("quit", "quit", None, dashed = false)
    val edges = rules.zipWithIndex.flatMap { case (r, i) =>
      r.clauses.flatMap(c => actionEdges(i, rules.length, c, dotted = false)) ++
        r.after.toSeq.flatMap { a =>
          val dur = r.window.fold("")(d => s"after ${d}s: ")
          actionEdges(i, rules.length, a.copy(attrs = Map.empty), dotted = true, prefix = dur)
        }
    }
    (nodes, edges, caption)
  }

  def dot(program: Ir.Program): String = {
    val (nodes, edges, caption) = graph(program)
    val sb = new StringBuilder("digraph trck {\n  rankdir=TB;\n  node [shape=box];\n")
    caption.foreach(c => sb.append(s"""  label="${esc(c)}";\n"""))
    nodes.foreach { n =>
      if (n.id == "quit") sb.append("  quit [shape=doublecircle, label=\"quit\"];\n")
      else {
        val window = n.windowSec.fold("")(d => s"\\nwindow ${d}s")
        val shape = if (n.dashed) ", style=dashed" else ""
        sb.append(s"""  ${n.id} [label="${esc(n.name)}$window"$shape];\n""")
      }
    }
    edges.foreach { e =>
      val label = e.labelLines.map(esc).mkString("\\n")
      val color = e.color.fold("")(c => s", color=$c")
      val style = if (e.dotted) ", style=dotted" else ""
      sb.append(s"""  ${e.src} -> ${e.dst} [label="$label"$color$style];\n""")
    }
    sb.append("}\n")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Tr2Dot prog.tr [out.dot]")
    val text = Files.readString(Paths.get(args(0)))
    val program = TrParser.parse(TrParser.programText(text))
    val out = dot(program)
    if (args.length > 1) Files.writeString(Paths.get(args(1)), out)
    else print(out)
  }
}
