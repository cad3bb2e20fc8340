package graft

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.geom.{CubicCurve2D, Line2D, Path2D}
import java.awt.image.BufferedImage
import java.nio.file.{Files, Paths}

import graft.parser.TrParser

/** `.tr` program → PNG machine diagram — the full analog of the
  * reference's `bin/tr2png` (which pipes the same graph through
  * graphviz), rendered with ONLY the JDK (Graphics2D + ImageIO; no
  * graphviz in the deployment contract). Shares [[Tr2Dot.graph]]'s
  * structured model, so the two dumps can never disagree about the
  * machine; layout is the layered top-to-bottom chain the DOT
  * `rankdir=TB` produces for these machines (rules are sequential by
  * construction — break falls through, restarts jump within the chain):
  * one column of rule boxes, quit as a terminal circle, self-loops as
  * right-side arcs, non-adjacent jumps as left-side bulged curves,
  * `after` edges dashed, unknown-action edges red.
  *
  * Usage: runMain graft.Tr2Png prog.tr [out.png]   (default: prog.png)
  */
object Tr2Png {

  private val NodeW = 220
  private val NodeH = 46
  private val MarginY = 48

  def render(program: graft.trck.Ir.Program): BufferedImage = {
    val (nodes, edges, caption) = Tr2Dot.graph(program)
    val n = nodes.length
    // size to CONTENT, like graphviz: measure every label up front (a 1x1
    // scratch image supplies metrics) so long clause labels widen the
    // right margin instead of clipping off-canvas, and stacked parallel
    // labels deepen the inter-rank gap instead of running under the next
    // node box
    val labelFont = new Font(Font.SANS_SERIF, Font.PLAIN, 10)
    val fm0 = {
      val tmp = new BufferedImage(1, 1, BufferedImage.TYPE_INT_RGB)
      val tg = tmp.createGraphics(); tg.setFont(labelFont)
      val m = tg.getFontMetrics; tg.dispose(); m
    }
    val maxLabelW =
      if (edges.isEmpty) 0
      else edges.flatMap(_.labelLines).map(fm0.stringWidth).foldLeft(0)(math.max)
    val pairLineTotals = edges.groupBy(e => (e.src, e.dst)).values
      .map(_.map(_.labelLines.length max 1).sum).foldLeft(0)(math.max)
    // self-loop reach (max lane 56+16*3) + label width; left side keeps the
    // fixed jump-curve margin
    val marginL = 260
    val marginR = math.max(260, 110 + maxLabelW + 16)
    val vGap = math.max(84, pairLineTotals * fm0.getHeight + 28)
    val width = NodeW + marginL + marginR
    val height = MarginY * 2 + n * NodeH + (n - 1) * vGap + caption.fold(0)(_ => 28)
    val MarginX = marginL
    val VGap = vGap
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)
      val capOffset = caption.fold(0) { c =>
        g.setColor(Color.DARK_GRAY)
        g.setFont(new Font(Font.SANS_SERIF, Font.ITALIC, 13))
        g.drawString(c, MarginX, MarginY - 18)
        28
      }
      val x0 = MarginX
      def yOf(idx: Int) = MarginY + capOffset + idx * (NodeH + VGap)
      val idx = nodes.map(_.id).zipWithIndex.toMap

      // ---- edges first (under the boxes) --------------------------------
      val labelFont = new Font(Font.SANS_SERIF, Font.PLAIN, 10)
      g.setFont(labelFont)
      val fm = g.getFontMetrics
      def edgeColor(e: Tr2Dot.Edge) = e.color match {
        case Some("red")  => new Color(0xb0, 0x2a, 0x2a)
        case Some("gray") => new Color(0x8a, 0x8a, 0x8a)
        case _            => new Color(0x30, 0x30, 0x30)
      }
      def stroke(e: Tr2Dot.Edge) =
        if (e.dotted) new BasicStroke(1.2f, BasicStroke.CAP_BUTT, BasicStroke.JOIN_MITER,
          10f, Array(4f, 4f), 0f)
        else new BasicStroke(1.4f)
      def arrowHead(x: Double, y: Double, dx: Double, dy: Double): Unit = {
        val len = math.hypot(dx, dy); if (len == 0) return
        val (ux, uy) = (dx / len, dy / len)
        val (px, py) = (-uy, ux)
        val p = new Path2D.Double()
        p.moveTo(x, y)
        p.lineTo(x - 8 * ux + 3.5 * px, y - 8 * uy + 3.5 * py)
        p.lineTo(x - 8 * ux - 3.5 * px, y - 8 * uy - 3.5 * py)
        p.closePath()
        g.fill(p)
      }
      def drawLabel(lines: Seq[String], x: Int, y: Int): Unit = {
        g.setColor(new Color(0x50, 0x50, 0x50))
        lines.zipWithIndex.foreach { case (l, k) =>
          g.drawString(l, x, y + k * (fm.getHeight - 2))
        }
      }
      // spread multiple same-column jumps so curves/labels don't overlap;
      // lane ALSO keys parallel edges between one (src, dst) pair, so two
      // clauses on the same transition stack their labels instead of
      // overprinting
      var leftLane = 0
      val pairLane = scala.collection.mutable.HashMap[(String, String), Int]()
      // cumulative label LINES already drawn per pair — stacked label
      // blocks offset by what precedes them, not by a fixed lane height
      val pairLines = scala.collection.mutable.HashMap[(String, String), Int]()
      edges.foreach { e =>
        val (si, di) = (idx(e.src), idx(e.dst))
        val lane = pairLane.updateWith((e.src, e.dst))(c => Some(c.fold(0)(_ + 1))).get
        val priorLines = pairLines.getOrElse((e.src, e.dst), 0)
        pairLines((e.src, e.dst)) = priorLines + (e.labelLines.length max 1)
        g.setColor(edgeColor(e))
        g.setStroke(stroke(e))
        if (si == di) {
          // self-loop: right-side arc, stacked per lane
          val y = yOf(si) + NodeH / 2
          val xr = x0 + NodeW
          val reach = 56 + 16 * lane
          val c = new CubicCurve2D.Double(
            xr, y - 10, xr + reach, y - 26, xr + reach, y + 26, xr, y + 10)
          g.draw(c)
          arrowHead(xr, y + 10, -1, 0.35)
          drawLabel(e.labelLines, xr + reach + 6, y - 2 + priorLines * fm.getHeight)
        } else if (di == si + 1) {
          // fall-through: straight vertical between adjacent ranks; lane
          // shifts parallel clause edges + their label blocks apart
          val x = x0 + NodeW / 2 + 14 * lane
          val (y1, y2) = (yOf(si) + NodeH, yOf(di))
          g.draw(new Line2D.Double(x, y1, x, y2))
          arrowHead(x, y2, 0, 1)
          drawLabel(e.labelLines, x + 8,
            y1 + (y2 - y1) / 2 - 2 + priorLines * fm.getHeight + 4 * lane)
        } else {
          // jump (restart / quit-from-afar): left-side bulge; lane offset
          // separates stacked jumps
          leftLane += 1
          val bulge = 60 + 34 * (leftLane % 4)
          val (y1, y2) = (yOf(si) + NodeH / 2, yOf(di) + NodeH / 2)
          val c = new CubicCurve2D.Double(
            x0, y1, x0 - bulge, y1, x0 - bulge, y2, x0, y2)
          g.draw(c)
          arrowHead(x0, y2, 1, 0)
          drawLabel(e.labelLines, x0 - bulge + 4, (y1 + y2) / 2 - 2)
        }
      }

      // ---- nodes --------------------------------------------------------
      val nameFont = new Font(Font.SANS_SERIF, Font.BOLD, 13)
      val subFont = new Font(Font.SANS_SERIF, Font.PLAIN, 11)
      nodes.foreach { nd =>
        val y = yOf(idx(nd.id))
        if (nd.id == "quit") {
          // terminal: double circle, centered in the column
          val cx = x0 + NodeW / 2; val cy = y + NodeH / 2; val r = 22
          g.setColor(Color.WHITE); g.fillOval(cx - r, cy - r, 2 * r, 2 * r)
          g.setColor(Color.BLACK); g.setStroke(new BasicStroke(1.4f))
          g.drawOval(cx - r, cy - r, 2 * r, 2 * r)
          g.drawOval(cx - r + 4, cy - r + 4, 2 * (r - 4), 2 * (r - 4))
          g.setFont(nameFont)
          val w = g.getFontMetrics.stringWidth("quit")
          g.drawString("quit", cx - w / 2, cy + 5)
        } else {
          g.setColor(Color.WHITE); g.fillRect(x0, y, NodeW, NodeH)
          g.setColor(Color.BLACK)
          g.setStroke(
            if (nd.dashed) new BasicStroke(1.4f, BasicStroke.CAP_BUTT,
              BasicStroke.JOIN_MITER, 10f, Array(6f, 4f), 0f)
            else new BasicStroke(1.6f))
          g.drawRect(x0, y, NodeW, NodeH)
          g.setFont(nameFont)
          val w = g.getFontMetrics.stringWidth(nd.name)
          g.drawString(nd.name, x0 + (NodeW - w) / 2, y + 19)
          nd.windowSec.foreach { d =>
            g.setFont(subFont)
            val s = s"window ${d}s"
            val sw = g.getFontMetrics.stringWidth(s)
            g.drawString(s, x0 + (NodeW - sw) / 2, y + 36)
          }
        }
      }
    } finally g.dispose()
    img
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Tr2Png prog.tr [out.png]")
    val text = Files.readString(Paths.get(args(0)))
    val program = TrParser.parse(TrParser.programText(text))
    val out = if (args.length > 1) args(1)
    else args(0).replaceAll("\\.tr$", "") + ".png"
    val ok = javax.imageio.ImageIO.write(render(program), "png", new java.io.File(out))
    require(ok, "no PNG writer available in this JVM")
    println(out)
  }
}
