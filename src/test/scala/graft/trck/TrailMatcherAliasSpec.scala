package graft.trck

import org.scalatest.funsuite.AnyFunSuite

import graft.trck.LocalRunner.{Db, ForeachTuple, RawEvent}

/** Foreach tuples must own their FSM states: processTrail's skip
  * optimizations may RUN one representative for a group of
  * equivalently-behaving tuples, but each tuple's returned state must be an
  * independent object — finalization mutates states in place, so an aliased
  * state fires its after-yield for the FIRST tuple and is then spent (quit,
  * ri = -1) for every other tuple sharing it. The reference keeps per-tuple
  * state structs by value (src/match_traildb.c:579-744), so every tuple
  * gets its finalization yield; round 8's review found both skip paths here
  * (and therefore BOTH the Spark engine and the LocalRunner oracle,
  * identically — which is why no equivalence test could see it) dropping
  * later tuples' finalization.
  */
class TrailMatcherAliasSpec extends AnyFunSuite {

  // rule0: a plain event advances every tuple into the windowed rule
  // (no foreach var consulted → the early-break path aliases states);
  // rule1: window whose after-clause yields $expired at finalization
  private val program = Ir.Program(
    Vector(
      Ir.Rule(None, None, None, entrypoint = false, List(
        Ir.Clause(Map("event_type" -> List("start")), negated = false, Some("break"), Nil),
        Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)), None),
      Ir.Rule(None, Some(100L), None, entrypoint = false, List(
        Ir.Clause(Map("advertisable_eid" -> List("%g")), negated = false, Some("quit"), Nil),
        Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)),
        Some(Ir.Clause(Map.empty, negated = false, Some("quit"),
          List(Ir.Yield("$expired", Nil))))),
    ),
    Some(Ir.GroupBy(List("%g"), Some("@arr"), mergeResults = false)),
  )

  test("every foreach tuple fires its own finalization after-yield (early-break path)") {
    val prog = Compiled.compile(program)
    // none of the tuple values appear in the trail → all tuples behave
    // identically and the skip optimizations engage
    val tuples = Vector("a1", "a2", "a3").map(v => ForeachTuple(Vector(Left(v))))
    val db = Db(Seq("u1" -> Seq(
      RawEvent(10L, Map("event_type" -> "start", "advertisable_eid" -> "zz")))))
    val out = LocalRunner.run(prog, Seq(db), foreachTuples = Some(tuples))
    val expired = out.results.map(_.counters.getOrElse("expired", 0L))
    assert(expired == Vector(1L, 1L, 1L),
      s"every tuple must finalize independently, got $expired")
  }

  test("binding-sensitive finalization over aliased states yields per-tuple values") {
    // the after-clause yields %g ITSELF: finalization consults the foreach
    // binding (groupbyUsed), so an aliased state group cannot broadcast one
    // result — finalizeTrail must re-run each tuple from the pre-run
    // snapshot (the identity-aware path's binding-sensitive branch) and
    // every tuple must see ITS OWN %g in its set
    val bindingProgram = Ir.Program(
      Vector(
        Ir.Rule(None, None, None, entrypoint = false, List(
          Ir.Clause(Map("event_type" -> List("start")), negated = false, Some("break"), Nil),
          Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)), None),
        Ir.Rule(None, Some(100L), None, entrypoint = false, List(
          Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil)),
          Some(Ir.Clause(Map.empty, negated = false, Some("quit"),
            List(Ir.Yield("#who", List(Ir.ParamTerm("%g"))))))),
      ),
      Some(Ir.GroupBy(List("%g"), Some("@arr"), mergeResults = false)),
    )
    val prog = Compiled.compile(bindingProgram)
    // no tuple value appears in the trail and the window rule never
    // consults %g per event → ONE aliased state object covers all tuples
    // going into finalization
    val tuples = Vector("a1", "a2", "a3").map(v => ForeachTuple(Vector(Left(v))))
    val db = Db(Seq("u1" -> Seq(
      RawEvent(10L, Map("event_type" -> "start", "advertisable_eid" -> "zz")))))
    val out = LocalRunner.run(prog, Seq(db), foreachTuples = Some(tuples))
    val who = out.results.map(_.sets("who").keys.map(Tuple.render).toVector)
    assert(who == Vector(Vector("a1"), Vector("a2"), Vector("a3")),
      s"each tuple must finalize with ITS OWN binding, got $who")
  }

  test("every foreach tuple fires its own finalization after-yield (memo path)") {
    val prog = Compiled.compile(program)
    val tuples = Vector("a1", "a2", "a3").map(v => ForeachTuple(Vector(Left(v))))
    // a second event AFTER entering the window makes the FSM consult %g
    // (groupbyUsed = true), steering tuple 2+ through the distinct-value
    // memo path instead of the early break
    val db = Db(Seq("u1" -> Seq(
      RawEvent(10L, Map("event_type" -> "start", "advertisable_eid" -> "zz")),
      RawEvent(20L, Map("event_type" -> "other", "advertisable_eid" -> "zz")))))
    val out = LocalRunner.run(prog, Seq(db), foreachTuples = Some(tuples))
    val expired = out.results.map(_.counters.getOrElse("expired", 0L))
    assert(expired == Vector(1L, 1L, 1L),
      s"every tuple must finalize independently, got $expired")
  }
}
