package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.trck._
import graft.trck.LocalRunner.{Db, ForeachTuple, RawEvent}

/** Scala port of the reference's model-based test generator
  * (reference: trick/trick.py:50-69,151-191): event/time constraints expand
  * combinatorially into positive trails; every negativity mask (which of
  * the K event constraints to violate → 2^K - 1 masks) produces negative
  * trails by deterministic per-field negation — enumerated fields rotate
  * through the OTHER bound values seen in any constraint (the
  * negate_count % |allowed| cycle), free fields get a "_FOO" suffix, and
  * must-change companions cycle alongside — plus 4-block negative FILLER
  * events between consecutive positives. Expectations are computed (1:1
  * inputs↔trails: a tuple's counter is 1 iff its own trail is positive).
  *
  * Each generated corpus is checked three ways: LocalRunner must produce
  * the computed expectations; the distributed TrailEngine must equal
  * LocalRunner byte-for-byte; and the same must hold under a window-file
  * run and a 2-source split (the combos that caught real bugs before).
  */
object Trick {
  sealed trait FieldVal
  final case class Lit(v: String) extends FieldVal
  final case class Input(key: String) extends FieldVal // %x, one value per trail
  final case class SetVals(vs: Vector[String]) extends FieldVal // 'in #set' expansion

  sealed trait Constraint { def isEvent: Boolean }
  final case class EventC(fields: Vector[(String, FieldVal)],
                          mustChange: Set[String] = Set.empty) extends Constraint {
    def isEvent = true
  }
  /** reference: TimeConstraint.__iter__ — deltas range(min, max-min, step),
    * step = ((max-1)-(min+1))/steps
    */
  final case class TimeC(min: Long, max: Long, steps: Int = 4) extends Constraint {
    def isEvent = false
    def deltas: Vector[Long] = {
      val step = ((max - 1) - (min + 1)) / steps
      (min until (max - min) by step).toVector
    }
  }

  final case class GenEvent(ts: Long, fields: Map[String, String])

  /** one expanded state of an event constraint: field → Left(concrete) |
    * Right(inputKey); mutable negation counters shared across the trails of
    * one mask, like the python object lifetime
    */
  final class EventState(val fields: Vector[(String, Either[String, String])],
                         mustChange: Vector[String]) {
    private var negateCount = 0
    private var mustIdx = 0

    def emit(t: Long, inputs: Map[String, String]): GenEvent =
      GenEvent(t, fields.map { case (k, v) => k -> v.fold(identity, inputs(_)) }.toMap)

    private def negate(field: String, value: String, bound: Map[String, Set[String]]): String = {
      negateCount += 1
      bound.get(field).map(_ - value) match {
        case Some(allowed) if allowed.nonEmpty =>
          allowed.toVector.sorted(math.Ordering.String)(negateCount % allowed.size)
        case _ => value + "_FOO"
      }
    }

    def emitNegatives(start: Long, end: Long, inputs: Map[String, String],
                      bound: Map[String, Set[String]], numBlocks: Int = 4): Vector[GenEvent] = {
      val step = (end - start) / numBlocks
      (0 until numBlocks).toVector.flatMap { i =>
        val t = start + i * step
        fields.map { case (field, _) =>
          val e = emit(t, inputs)
          var f = e.fields.updated(field, negate(field, e.fields(field), bound))
          if (mustChange.nonEmpty && !mustChange.contains(field)) {
            val must = mustChange(mustIdx % mustChange.length); mustIdx += 1
            f = f.updated(must, negate(must, f(must), bound))
          }
          GenEvent(t, f)
        }
      }
    }
  }

  /** literal values per field across all constraints (set expansions and
    * input refs excluded) — the negation vocabulary
    */
  def boundValues(cs: Seq[Constraint]): Map[String, Set[String]] =
    cs.collect { case e: EventC => e.fields.collect { case (k, Lit(v)) => k -> v } }
      .flatten.groupMapReduce(_._1)(kv => Set(kv._2))(_ ++ _)

  private def cartesian[A](xs: Vector[Vector[A]]): Vector[Vector[A]] =
    xs.foldLeft(Vector(Vector.empty[A]))((acc, vs) => acc.flatMap(p => vs.map(p :+ _)))

  /** trails keyed by their input assignment, in generation order */
  def generateTrails(cs: Vector[Constraint], inputKeys: Vector[String],
                     stayPositive: Boolean): Vector[(Map[String, String], Vector[GenEvent], Boolean)] = {
    val bound = boundValues(cs)
    val nEvents = cs.count(_.isEvent)
    // the reference runs a positive file (mask 0) and a negative file
    // (masks 1..2^K-1) separately; one combined corpus with a continuing
    // input counter keeps the 1:1 inputs↔trails property
    val masks = 0 +: (if (stayPositive) Vector.empty[Int] else (1 until (1 << nEvents)).toVector)
    var inputIdx = 0
    val out = Vector.newBuilder[(Map[String, String], Vector[GenEvent], Boolean)]
    for (mask <- masks) {
      // fresh state objects per mask, REUSED across this mask's combos (the
      // python iterator lifetime — negation counters accumulate per mask)
      val stateSets: Vector[Vector[AnyRef]] = cs.map {
        case e: EventC =>
          val setFields = e.fields.collect { case (k, SetVals(vs)) => k -> vs }
          val base = e.fields.collect {
            case (k, Lit(v))   => k -> (Left(v): Either[String, String])
            case (k, Input(i)) => k -> (Right(i): Either[String, String])
          }
          val mc = e.fields.map(_._1).filter(e.mustChange).toVector
          if (setFields.isEmpty) Vector(new EventState(base, mc))
          else
            cartesian(setFields.map(_._2).toVector).map { chosen =>
              val withSets = base ++ setFields.map(_._1).zip(chosen.map(v => Left(v): Either[String, String]))
              new EventState(withSets, mc)
            }
        case t: TimeC => t.deltas.map(d => java.lang.Long.valueOf(d): AnyRef)
      }
      for (combo <- cartesian(stateSets)) {
        val inputs = inputKeys.map(k => k -> (k.stripPrefix("%") + inputIdx)).toMap
        inputIdx += 1
        var t = 0L; var prevT = 0L; var e = 0
        val seq = Vector.newBuilder[GenEvent]
        combo.zip(cs).foreach {
          case (st: EventState, c) =>
            seq ++= st.emitNegatives(prevT, t, inputs, bound)
            prevT = t // EventState does not advance time
            if (((1 << e) & mask) != 0) seq ++= st.emitNegatives(t, t, inputs, bound, 1)
            else seq += st.emit(t, inputs)
            e += 1
          case (d: java.lang.Long, _) =>
            prevT = t; t += d.longValue()
        }
        out += ((inputs, seq.result(), mask == 0))
      }
    }
    out.result()
  }
}

class TrickSpec extends AnyFunSuite with BeforeAndAfterAll {
  import Trick._

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("trick").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val DAY = 86400L

  // the reference README's canonical "engaged user" case: an imp for the
  // campaign, then within 3 days a pxl in one of the conversion segments
  private val segs = (0 until 10).map("segs" + _).toVector
  private val engagedConstraints = Vector[Constraint](
    EventC(Vector("type" -> Lit("imp"), "campaign_id" -> Input("%camp"))),
    TimeC(1, 3 * DAY),
    EventC(Vector("type" -> Lit("pxl"), "segment_id" -> SetVals(segs))),
  )

  /** trck machine for the engaged-user case */
  private val engagedProgram = Ir.Program(
    Vector(
      Ir.Rule(None, None, None, entrypoint = false, List(
        Ir.Clause(Map("type" -> List("imp"), "campaign_id" -> List("%camp")), negated = false,
          Some("break"), Nil),
        Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)), None),
      Ir.Rule(None, Some(3 * DAY), None, entrypoint = false, List(
        Ir.Clause(Map("type" -> List("pxl"), "segment_id" -> List("#segs")), negated = false,
          Some("quit"), List(Ir.Yield("$conv", Nil))),
        Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)),
        Some(Ir.Clause(Map.empty, negated = false, Some("quit"), Nil))),
    ),
    Some(Ir.GroupBy(List("%camp"), Some("@arr"), mergeResults = false)),
  )

  // must-change case: click on an item, then a buy of the SAME item.
  // Negating only `type` on the buy yields a well-formed click that
  // re-enters rule 0 (a false negative — the README's warning), so `item`
  // is must-change: whenever another field is negated, item flips too.
  private val buyConstraints = Vector[Constraint](
    EventC(Vector("type" -> Lit("click"), "item" -> Input("%it"))),
    TimeC(1, DAY),
    EventC(Vector("type" -> Lit("buy"), "item" -> Input("%it")),
      mustChange = Set("item")),
  )

  private val buyProgram = Ir.Program(
    Vector(
      Ir.Rule(None, None, None, entrypoint = false, List(
        Ir.Clause(Map("type" -> List("click"), "item" -> List("%it")), negated = false,
          Some("break"), Nil),
        Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)), None),
      Ir.Rule(None, None, None, entrypoint = false, List(
        Ir.Clause(Map("type" -> List("buy"), "item" -> List("%it")), negated = false,
          Some("quit"), List(Ir.Yield("$bought", Nil))),
        Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)), None),
    ),
    Some(Ir.GroupBy(List("%it"), Some("@arr"), mergeResults = false)),
  )

  private def toDb(trails: Vector[(Map[String, String], Vector[GenEvent], Boolean)]): Db =
    Db(trails.zipWithIndex.map { case ((_, evs, _), i) =>
      s"cookie$i" -> evs.map(e => RawEvent(e.ts, e.fields))
    })

  private def dbToDf(db: Db, fieldNames: Seq[String]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(
      Seq(StructField("uuid", StringType), StructField("ts", LongType),
        StructField("seq", LongType)) ++ fieldNames.map(f => StructField(f, StringType)))
    val rows = db.trails.flatMap { case (uuid, evs) =>
      evs.zipWithIndex.map { case (e, i) =>
        Row.fromSeq(Seq(uuid, e.ts, i.toLong) ++ fieldNames.map(f => e.fields.getOrElse(f, "")))
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }

  private def checkCase(name: String, constraints: Vector[Constraint], program: Ir.Program,
                        inputKey: String, counter: String,
                        params: Fsm.Bindings, fieldNames: Seq[String]): Unit = {
    val trails = generateTrails(constraints, Vector(inputKey), stayPositive = false)
    assert(trails.count(!_._3) > trails.count(_._3), "masks must generate more negatives")
    val prog = Compiled.compile(program)
    val db = toDb(trails)
    val tuples = trails.map(t => ForeachTuple(Vector(Left(t._1(inputKey)))))

    val local = LocalRunner.run(prog, Seq(db), params, Some(tuples))
    // 1) computed expectations: tuple i's counter is 1 iff trail i is positive
    trails.zipWithIndex.foreach { case ((inputs, _, positive), i) =>
      val got = local.results(i).counters(counter)
      assert(got == (if (positive) 1L else 0L),
        s"$name: tuple ${inputs(inputKey)} (positive=$positive) got $counter=$got")
    }

    // 2) distributed engine ≡ LocalRunner, byte-identical JSON
    val df = dbToDf(db, fieldNames)
    val engine = TrckSparkRunner.runRaw(prog, df, "uuid", "ts", Seq("seq"), params, Some(tuples))
    val localJson = OutputJson.render(local.toOutputs, grouped = true)
    assert(OutputJson.render(engine.toOutputs, grouped = true) == localJson, s"$name: engine != local")

    // 3) window-file run (one unbounded entry per cookie) — same equivalence
    val ws = LocalRunner.WindowSet(db.trails.map { case (c, _) => LocalRunner.WindowEntry(c, c, 0L, 0L) })
    val localW = LocalRunner.run(prog, Seq(db), params, Some(tuples), windows = Some(ws))
    val engineW = TrckSparkRunner.runRaw(prog, df, "uuid", "ts", Seq("seq"), params, Some(tuples),
      filters = TrckSparkRunner.EngineFilters(windows = Some(ws)))
    assert(OutputJson.render(engineW.toOutputs, grouped = true) ==
      OutputJson.render(localW.toOutputs, grouped = true), s"$name: windowed engine != local")

    // 4) 2-source split at each trail's midpoint — same equivalence (the
    // min_ts cross-DB cut applies identically to both engines)
    val db1 = Db(db.trails.map { case (c, evs) => c -> evs.take(evs.length / 2) })
    val db2 = Db(db.trails.map { case (c, evs) => c -> evs.drop(evs.length / 2) })
    val localM = LocalRunner.run(prog, Seq(db1, db2), params, Some(tuples))
    val (unioned, cuts) = TrckSparkRunner.unionSources(
      Seq(dbToDf(db1, fieldNames), dbToDf(db2, fieldNames)), "ts")
    val engineM = TrckSparkRunner.runRaw(prog, unioned, "uuid", "ts", Seq("seq"), params,
      Some(tuples), srcCuts = cuts)
    assert(OutputJson.render(engineM.toOutputs, grouped = true) ==
      OutputJson.render(localM.toOutputs, grouped = true), s"$name: multi-source engine != local")
  }

  test("engaged-user case: 200 generated trails (50 positive + 3 masks), all checks") {
    val trails = generateTrails(engagedConstraints, Vector("%camp"), stayPositive = false)
    // 1 × 5 time-deltas (range(1, max-1, step) keeps the below-stop tail
    // value, python semantics) × 10 set values × (1 positive + 3 masks)
    assert(trails.length == 200)
    checkCase("engaged", engagedConstraints, engagedProgram, "%camp", "conv",
      Fsm.Bindings(sets = Map("segs" -> segs.toSet)),
      Seq("type", "campaign_id", "segment_id"))
  }

  test("must-change buy case: negatives flip companion fields, all checks") {
    checkCase("buy", buyConstraints, buyProgram, "%it", "bought",
      Fsm.Bindings(), Seq("type", "item"))
  }

  test("window-straddling deltas: per-trail expectations follow the M2 expiry exactly") {
    // the funnel's window (1 day) sits INSIDE the generated time-delta
    // range (1s .. ~2.25 days), so each positive trail's expectation
    // depends on whether ITS delta beats the expiry — the computed-
    // expectation analog of trick's -Params alternative cases, aimed
    // squarely at the M2 window semantics
    val window = DAY
    val program = Ir.Program(
      Vector(
        Ir.Rule(None, None, None, entrypoint = false, List(
          Ir.Clause(Map("type" -> List("imp"), "campaign_id" -> List("%camp")), negated = false,
            Some("break"), Nil),
          Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)), None),
        Ir.Rule(None, Some(window), None, entrypoint = false, List(
          Ir.Clause(Map("type" -> List("pxl"), "segment_id" -> List("#segs")), negated = false,
            Some("quit"), List(Ir.Yield("$conv", Nil))),
          Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)),
          Some(Ir.Clause(Map.empty, negated = false, Some("quit"), Nil))),
      ),
      Some(Ir.GroupBy(List("%camp"), Some("@arr"), mergeResults = false)),
    )
    val trails = generateTrails(engagedConstraints, Vector("%camp"), stayPositive = false)
    val prog = Compiled.compile(program)
    val db = toDb(trails)
    val tuples = trails.map(t => ForeachTuple(Vector(Left(t._1("%camp")))))
    val params = Fsm.Bindings(sets = Map("segs" -> segs.toSet))
    val local = LocalRunner.run(prog, Seq(db), params, Some(tuples))
    var inWindow = 0; var expired = 0
    trails.zipWithIndex.foreach { case ((inputs, evs, positive), i) =>
      // the positive pxl (if any) is the last event; its ts is the trail's
      // time delta (imp sits at ts 0). Window entry happens AT the imp, so
      // conversion requires delta < window.
      val delta = evs.last.ts
      val expect = if (positive && delta < window) 1L else 0L
      if (positive && delta < window) inWindow += 1
      if (positive && delta >= window) expired += 1
      assert(local.results(i).counters("conv") == expect,
        s"tuple ${inputs("%camp")} delta=$delta positive=$positive")
    }
    assert(inWindow > 0 && expired > 0, "deltas must straddle the window for this test to bite")
    // distributed engine agrees byte-for-byte
    val engine = TrckSparkRunner.runRaw(
      prog, dbToDf(db, Seq("type", "campaign_id", "segment_id")), "uuid", "ts", Seq("seq"),
      params, Some(tuples))
    assert(OutputJson.render(engine.toOutputs, grouped = true) ==
      OutputJson.render(local.toOutputs, grouped = true))
  }
}
