package graft

import java.nio.file.{Files, Paths}

import graft.parser.TrParser
import graft.trck.Ir

/** `.tr` program → Graphviz DOT dump for debugging machine structure —
  * the analog of the reference's `bin/tr2png` (rules as nodes, transitions
  * as edges), extended to all action kinds: break falls through to the
  * next rule, restart-from-here/next jump to their target, quit exits, and
  * `after` edges carry the window duration. Emits DOT text (render with
  * `dot -Tpng`); no graphics dependency in the container.
  *
  * Usage: runMain graft.Tr2Dot prog.tr [out.dot]   (stdout when no out)
  */
object Tr2Dot {

  private val RestartRe = """restart-from-(?:here|next)\((\d+)\)""".r

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def clauseLabel(c: Ir.Clause): String = {
    // esc the raw parts BEFORE joining with the DOT "\n" escape
    val conds = esc(
      if (c.attrs.isEmpty) "*"
      else c.attrs.map { case (k, vs) => s"$k=${vs.mkString(",")}" }.mkString(", "))
    val neg = if (c.negated) "not " else ""
    val ys = esc(c.yields.map(y => s"yield ${y.dst}").mkString(", "))
    if (ys.isEmpty) neg + conds else s"$neg$conds\\n$ys"
  }

  /** edges for one clause's action from rule `i` */
  private def actionEdges(i: Int, nRules: Int, c: Ir.Clause, style: String): Seq[String] = {
    val label = clauseLabel(c)
    c.action.getOrElse("repeat") match {
      case "repeat" => Seq(s"""  r$i -> r$i [label="$label", color=gray$style];""")
      case "break" =>
        val dst = if (i + 1 < nRules) s"r${i + 1}" else "quit"
        Seq(s"""  r$i -> $dst [label="$label"$style];""")
      case "quit" => Seq(s"""  r$i -> quit [label="$label"$style];""")
      case RestartRe(l) => Seq(s"""  r$i -> r$l [label="$label"$style];""")
      case other => Seq(s"""  r$i -> r$i [label="${esc(other)}: $label", color=red$style];""")
    }
  }

  def dot(program: Ir.Program): String = {
    val rules = program.rules
    val sb = new StringBuilder("digraph trck {\n  rankdir=TB;\n  node [shape=box];\n")
    program.groupby.foreach(g =>
      sb.append(s"""  label="foreach ${g.vars.mkString(", ")}${g.values.fold("")(" in " + _)}";\n"""))
    rules.zipWithIndex.foreach { case (r, i) =>
      val name = r.name.getOrElse(s"rule$i")
      val window = r.window.fold("")(d => s"\\nwindow ${d}s")
      val shape = if (r.outer.isDefined) ", style=dashed" else ""
      sb.append(s"""  r$i [label="${esc(name)}$window"$shape];\n""")
    }
    sb.append("  quit [shape=doublecircle, label=\"quit\"];\n")
    rules.zipWithIndex.foreach { case (r, i) =>
      r.clauses.foreach(c => actionEdges(i, rules.length, c, "").foreach(e => sb.append(e + "\n")))
      r.after.foreach { a =>
        val dur = r.window.fold("")(d => s"after ${d}s: ")
        actionEdges(i, rules.length, a.copy(attrs = Map.empty), ", style=dotted")
          .map(_.replace("label=\"", s"""label="${esc(dur)}"""))
          .foreach(e => sb.append(e + "\n"))
      }
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
