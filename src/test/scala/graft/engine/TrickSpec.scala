package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.trck._
import graft.trck.LocalRunner.{Db, ForeachTuple, RawEvent}

/** See [[graft.engine.Trick]] (main sources) for the generator this
  * suite drives — moved there when the `graft.Trick` CLI (the reference's
  * trick.py entrypoint) was added; the model itself is unchanged.
  */
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
