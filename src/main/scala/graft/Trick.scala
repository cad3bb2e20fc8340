package graft

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.{Trick => Model}
import graft.parser.TrParser
import graft.trck._
import graft.trck.LocalRunner.{Db, ForeachTuple, RawEvent}

/** The reference's `trick` model-based test CLI (trick/trick.py:368-371:
  * `python trick.py my-metric.tr my-metric-tests.trick`), over the same
  * generator the TrickSpec property suite G-tests
  * ([[graft.engine.Trick]]). A `.trick` spec (reference syntax,
  * trick/README.md: `# title`, `Window:`, `Input:`, `Output:`/`-Output:`,
  * `Params:`/`-Params:`, `Positive Only`, `[event constraints]`,
  * `<time constraints>`) expands each test case combinatorially into
  * positive trails plus every negativity mask's negative trails; the
  * machine runs each corpus on [[LocalRunner]] with 1:1 input-tuple↔trail
  * binding, and per-trail counters must equal the declared outputs
  * (positives) or zero (negatives).
  *
  * Differences from the reference, both deliberate:
  *   - positive and negative sequences run as ONE corpus (a trail's
  *     expectation follows its own positivity — same checks, fewer runs);
  *   - `--emit-dir d` writes each run as a reference-format test file
  *     (program text + `----- unit tests ----` JSON trailer — the exact
  *     shape of the reference's test/tr corpus and trick.py's
  *     write_test_file), so generated fixtures are portable to the golden
  *     harness or (via the JSON db + [[Json2Tdb]]) to the distributed
  *     engine.
  *
  * Usage: `runMain graft.Trick <machine.tr|.json> <cases.trick>
  * [--emit-dir d] [--set-size n]`. Exits nonzero if any trail failed.
  */
object Trick {

  /** MONTH + 2 days (trick/trick.py:15 MAX_WINDOW). */
  val MaxWindow: Long = 32L * 24 * 3600

  final case class TrickCase(
      title: String,
      window: Option[Long],
      inputKeys: Vector[String],
      inputName: String,
      output: Vector[(String, Long)],
      altOutput: Vector[(String, Long)],
      scalars: Map[String, String], // sigil-stripped
      sets: Map[String, Vector[String]], // sigil-stripped, ordered
      altScalars: Option[Map[String, String]],
      altSets: Map[String, Vector[String]],
      constraints: Vector[Model.Constraint],
      onlyPositive: Boolean,
  )

  private def parseTimeSpec(s: String): Long = {
    val parts = s.trim.split("\\s+")
    require(parts.length == 2, s"bad time spec: '$s'")
    // singular forms included: the reference README's own example is
    // `< min 1 second, max 3 days >` (trick/README.md Time Constraints)
    val unit = Map("day" -> 86400L, "hour" -> 3600L, "minute" -> 60L, "second" -> 1L)
    parts(1).stripSuffix("s") match {
      case u if unit.contains(u) => parts(0).toLong * unit(u)
      case u => sys.error(s"unknown time unit '${parts(1)}' in '$s'")
    }
  }

  private def splitCommas(s: String): Vector[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toVector

  /** `Params:` entry → (sigil-stripped name, scalar | set values).
    * `#name` alone auto-populates name0..name(setSize-1)
    * (trick/trick.py:199-205 parse_param).
    */
  private def parseParam(p: String, setSize: Int): (String, Either[String, Vector[String]]) =
    if (p.startsWith("#")) {
      if (p.contains("=")) {
        val Array(k, v) = p.split("=", 2).map(_.trim)
        k.stripPrefix("#") -> Right(v.split("\\s+").filter(_.nonEmpty).toVector)
      } else p.stripPrefix("#") -> Right((0 until setSize).map(i => p.stripPrefix("#") + i).toVector)
    } else if (p.startsWith("%")) {
      val Array(k, v) = p.split("=", 2).map(_.trim)
      k.stripPrefix("%") -> Left(v)
    } else sys.error(s"Unknown parameter: $p")

  private def parseParams(s: String, setSize: Int): (Map[String, String], Map[String, Vector[String]]) = {
    val kvs = splitCommas(s).map(parseParam(_, setSize))
    (kvs.collect { case (k, Left(v)) => k -> v }.toMap,
      kvs.collect { case (k, Right(vs)) => k -> vs }.toMap)
  }

  private def parseOutputs(s: String): Vector[(String, Long)] =
    splitCommas(s).map { o =>
      val Array(k, v) = o.split("=", 2).map(_.trim)
      k -> v.toLong
    }

  /** `[ !type=pxl, campaign_id=%camp_id, segment_id in #segs ]` →
    * [[Model.EventC]] (trick/trick.py:207-219 parse_field).
    */
  private def parseEventC(body: String, inputKeys: Set[String],
                          sets: Map[String, Vector[String]]): Model.EventC = {
    val must = scala.collection.mutable.Set[String]()
    val fields = splitCommas(body).map { f0 =>
      var f = f0
      val bang = f.startsWith("!")
      if (bang) f = f.drop(1).trim
      val (k, v): (String, Model.FieldVal) =
        if (f.contains("=")) {
          val Array(k0, v0) = f.split("=", 2).map(_.trim)
          val fv: Model.FieldVal =
            if (v0.startsWith("%") || v0.startsWith("#")) {
              require(inputKeys.contains(v0),
                s"field $k0 references $v0, which is not an Input key")
              Model.Input(v0)
            } else Model.Lit(v0)
          (k0, fv)
        } else {
          val parts = f.split("\\s+in\\s+", 2).map(_.trim)
          require(parts.length == 2, s"cannot parse field: '$f0'")
          val name = parts(1).stripPrefix("#")
          (parts(0), Model.SetVals(sets.getOrElse(name,
            sys.error(s"set #$name not defined in Params"))))
        }
      if (bang) must += k
      k -> v
    }
    Model.EventC(fields, must.toSet)
  }

  /** `< min 1 second, max 3 days >` → [[Model.TimeC]]
    * (trick/trick.py:277-281: defaults min 1, max window).
    */
  private def parseTimeC(body: String, window: Long): Model.TimeC = {
    var lo = 1L; var hi = window
    splitCommas(body).foreach { arg =>
      val Array(mm, spec) = arg.split("\\s+", 2)
      mm match {
        case "min" => lo = parseTimeSpec(spec)
        case "max" => hi = parseTimeSpec(spec)
        case other => sys.error(s"unknown time-constraint key '$other' in <$body>")
      }
    }
    Model.TimeC(lo, hi)
  }

  def parseSpec(text: String, setSize: Int = 10): Vector[TrickCase] = {
    val out = Vector.newBuilder[TrickCase]
    var cur: TrickCase = null
    def close(): Unit = if (cur != null) {
      require(cur.inputKeys.nonEmpty, s"case '${cur.title}' needs an Input: line")
      require(cur.output.nonEmpty, s"case '${cur.title}' needs an Output: line")
      out += cur
    }
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = raw.trim
      def body = line.split(":", 2)(1)
      line match {
        case "" => ()
        case l if l.startsWith("#") =>
          close()
          cur = TrickCase(l.drop(1).trim, None, Vector.empty, "", Vector.empty,
            Vector.empty, Map.empty, Map.empty, None, Map.empty, Vector.empty,
            onlyPositive = false)
        case l if l.startsWith("Window") =>
          cur = cur.copy(window = Some(parseTimeSpec(body)))
        case l if l.startsWith("Input") =>
          val Array(name, keys) = body.split("=", 2)
          cur = cur.copy(inputName = name.trim, inputKeys = splitCommas(keys))
        case l if l.startsWith("-Output") =>
          cur = cur.copy(altOutput = parseOutputs(body))
        case l if l.startsWith("Output") =>
          cur = cur.copy(output = parseOutputs(body))
        case l if l.startsWith("-Params") =>
          val (sc, st) = parseParams(body, setSize)
          cur = cur.copy(altScalars = Some(sc), altSets = st)
        case l if l.startsWith("Params") =>
          val (sc, st) = parseParams(body, setSize)
          cur = cur.copy(scalars = sc, sets = st)
        case l if l.startsWith("Positive") =>
          cur = cur.copy(onlyPositive = true)
        case l if l.startsWith("[") && l.endsWith("]") =>
          // two adjacent event constraints get the implicit window gap
          // (trick/trick.py:270-273)
          val w = cur.window.getOrElse(MaxWindow)
          val gap =
            if (cur.constraints.lastOption.exists(_.isEvent))
              Vector(Model.TimeC(0, w))
            else Vector.empty
          cur = cur.copy(constraints = cur.constraints ++ gap :+
            parseEventC(l.drop(1).dropRight(1), cur.inputKeys.toSet, cur.sets))
        case l if l.startsWith("<") && l.endsWith(">") =>
          cur = cur.copy(constraints = cur.constraints :+
            parseTimeC(l.drop(1).dropRight(1), cur.window.getOrElse(MaxWindow)))
        case other =>
          sys.error(s"Cannot parse line ${i + 1}: $other")
      }
    }
    close()
    out.result()
  }

  /** One executable run: a corpus + per-trail expectations. */
  final case class Run(title: String, binds: Fsm.Bindings,
                       scalars: Map[String, String], sets: Map[String, Vector[String]],
                       output: Vector[(String, Long)], stayPositive: Boolean)

  private def runsOf(c: TrickCase): Vector[Run] = {
    val main = Run(c.title, Fsm.Bindings(c.scalars, c.sets.view.mapValues(_.toSet).toMap),
      c.scalars, c.sets, c.output, stayPositive = c.onlyPositive)
    val alt = c.altScalars.map { sc =>
      Run(s"${c.title} (alternative case)",
        Fsm.Bindings(sc, c.altSets.view.mapValues(_.toSet).toMap),
        sc, c.altSets, c.altOutput, stayPositive = true)
    }
    main +: alt.toVector
  }

  final case class TrailResult(inputs: Map[String, String], positive: Boolean,
                               failures: Vector[String])

  /** Execute one run; returns per-trail results in generation order. */
  def execute(prog: Compiled.CompiledProgram, c: TrickCase, r: Run): Vector[TrailResult] = {
    require(prog.groupbyVars.length == c.inputKeys.length,
      s"program has ${prog.groupbyVars.length} foreach vars, Input: declares ${c.inputKeys.length}")
    require(!prog.mergeResults,
      "trick compares per-tuple rows; a merged-results (INTO) machine has none")
    val trails = Model.generateTrails(c.constraints, c.inputKeys, r.stayPositive)
    val db = Db(trails.zipWithIndex.map { case ((_, evs, _), i) =>
      s"cookie$i" -> evs.map(e => RawEvent(e.ts, e.fields))
    })
    val tuples = trails.map { case (inputs, _, _) =>
      ForeachTuple(c.inputKeys.map(k => Left(inputs(k)): Either[String, Vector[String]]))
    }
    val out = LocalRunner.run(prog, Seq(db), r.binds, Some(tuples))
    trails.zipWithIndex.map { case ((inputs, _, positive), i) =>
      val fails = r.output.flatMap { case (name, want0) =>
        val want = if (positive) want0 else 0L
        val got = out.results(i).counters.getOrElse(name.stripPrefix("$"), 0L)
        if (got != want) Some(s"$name expected $want got $got") else None
      }
      TrailResult(inputs, positive, fails)
    }
  }

  /** Reference-format test file (program text + `----- unit tests ----`
    * trailer — trick/trick.py:318-328 write_test_file), consumable by the
    * golden harness and dumpable to parquet via [[Json2Tdb]].
    */
  def emitTestFile(programText: String, c: TrickCase, r: Run,
                   trails: Vector[(Map[String, String], Vector[Model.GenEvent], Boolean)]): String = {
    val cookieTrails = JObject(trails.zipWithIndex.map { case ((_, evs, _), i) =>
      s"cookie$i" -> JArray(evs.map(e => JObject(
        ("timestamp" -> (JInt(e.ts): JValue)) :: e.fields.toList.sortBy(_._1)
          .map { case (k, v) => k -> (JString(v): JValue) })).toList)
    }.toList)
    val expected = JArray(trails.map { case (inputs, _, positive) =>
      JObject(inputs.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) } ++
        r.output.map { case (k, v) => k -> (JInt(if (positive) v else 0L): JValue) })
    }.toList)
    val params = JObject(
      r.scalars.toList.sorted.map { case (k, v) => s"%$k" -> (JString(v): JValue) } ++
        r.sets.toList.sortBy(_._1).map { case (k, vs) =>
          s"#$k" -> (JArray(vs.map(JString(_): JValue).toList): JValue)
        } ++ List(c.inputName -> (JArray(trails.map { case (inputs, _, _) =>
          JArray(c.inputKeys.map(k => JString(inputs(k)): JValue).toList): JValue
        }.toList): JValue)))
    val tests = JObject(
      "tests" -> JArray(List(JObject(
        "trails" -> JArray(List(cookieTrails)),
        "expected" -> expected))),
      "params" -> params)
    s"$programText\n\n----- unit tests ----\n-- ${JsonMethods.compact(JsonMethods.render(tests))}\n"
  }

  def main(args: Array[String]): Unit = {
    var emitDir: Option[String] = None
    var setSize = 10
    var pos = List.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--emit-dir" => emitDir = Some(args(i + 1)); i += 2
        case "--set-size" => setSize = args(i + 1).toInt; i += 2
        case p            => pos = p :: pos; i += 1
      }
    }
    val Seq(trPath, trickPath) = pos.reverse.toSeq match {
      case s @ Seq(_, _) => s
      case _ => sys.error("usage: Trick <machine.tr|.json> <cases.trick> [--emit-dir d] [--set-size n]")
    }
    val programText = Files.readString(Paths.get(trPath))
    val program =
      if (trPath.endsWith(".tr")) TrParser.parse(TrParser.programText(programText))
      else Ir.parseProgram(programText)
    val prog = Compiled.compile(program)

    var failedTrails = 0
    var totalTrails = 0
    parseSpec(Files.readString(Paths.get(trickPath)), setSize).foreach { c =>
      runsOf(c).foreach { r =>
        println(s"Test: ${r.title}")
        val results = execute(prog, c, r)
        totalTrails += results.length
        val bad = results.filter(_.failures.nonEmpty)
        emitDir.foreach { d =>
          val trails = Model.generateTrails(c.constraints, c.inputKeys, r.stayPositive)
          val slug = r.title.toLowerCase.replaceAll("[^a-z0-9]+", "_").take(48)
          val p = Paths.get(d, s"$slug.tr")
          Files.createDirectories(p.getParent)
          Files.writeString(p, emitTestFile(programText, c, r, trails))
          println(s"-> emitted $p")
        }
        if (bad.isEmpty) println(s"-> ${results.length} / ${results.length} trails ok!")
        else {
          failedTrails += bad.length
          println(s"-> ${bad.length} / ${results.length} trails FAILED")
          bad.take(20).foreach { t =>
            println(s"   ${t.inputs.toList.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")}" +
              s" [${if (t.positive) "positive" else "negative"}]: ${t.failures.mkString("; ")}")
          }
        }
      }
    }
    if (failedTrails > 0)
      sys.error(s"$failedTrails of $totalTrails trails failed")
    println(s"All $totalTrails trails ok.")
  }
}
