package graft.trck

import org.scalatest.funsuite.AnyFunSuite

import graft.trck.LocalRunner.{Db, ForeachTuple, RawEvent}

/** Regressions for reference-parity findings:
  *
  *  - an empty multiset renders as `{}` (reference: src/results_json.c:162-186
  *    multiset_to_json prints braces unconditionally);
  *  - `timestamp OP %unbound` follows C uint64 promotion — the -1 sentinel
  *    behaves as UINT64_MAX (reference: src/fsm2c.py:135-153);
  *  - groupby JSON rows print result vars before the %/# echo, and `#var`
  *    echoes keep params-file order (reference: src/results_json.c:233-272).
  */
class AdviceRegressionSpec extends AnyFunSuite {

  private def countingProgram(tsCond: Option[String]) = Ir.Program(
    Vector(
      Ir.Rule(None, None, None, entrypoint = false,
        List(
          Ir.Clause(
            tsCond.map(c => Map("timestamp" -> List(c))).getOrElse(Map.empty) +
              ("type" -> List("cli")),
            negated = false, Some("repeat"), List(Ir.Yield("$n", Nil))),
          Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil),
        ), None),
    ),
    None,
  )

  private val db = Db(Seq(
    "u1" -> Seq(RawEvent(100L, Map("type" -> "cli")), RawEvent(200L, Map("type" -> "cli"))),
  ))

  test("empty multiset renders as {} not []") {
    // &m is declared (a clause yields to it) but the clause never fires
    val program = Ir.Program(
      Vector(
        Ir.Rule(None, None, None, entrypoint = false,
          List(
            Ir.Clause(Map("type" -> List("never")), negated = false, Some("repeat"),
              List(Ir.Yield("&m", List(Ir.FieldTerm("type"))))),
            Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil),
          ), None),
      ),
      None,
    )
    val out = LocalRunner.run(Compiled.compile(program), Seq(db)).toOutputs
    val json = OutputJson.render(out, grouped = false)
    assert(json.contains("\"&m\":{}"), json)
    assert(!json.contains("\"&m\":[]"), json)
  }

  test("timestamp > %unbound is always false (uint64 promotion of -1)") {
    val prog = Compiled.compile(countingProgram(Some("> %cutoff")))
    val out = LocalRunner.run(prog, Seq(db)) // %cutoff unbound
    assert(out.results.head.counters("n") == 0L)
  }

  test("timestamp < %unbound is always true (uint64 promotion of -1)") {
    val prog = Compiled.compile(countingProgram(Some("< %cutoff")))
    val out = LocalRunner.run(prog, Seq(db))
    assert(out.results.head.counters("n") == 2L)
  }

  test("bound timestamp params still compare numerically") {
    val prog = Compiled.compile(countingProgram(Some("> %cutoff")))
    val out = LocalRunner.run(prog, Seq(db), Fsm.Bindings(scalars = Map("cutoff" -> "150")))
    assert(out.results.head.counters("n") == 1L)
  }

  test("groupby rows put results before the param echo; #var echo keeps tuple order") {
    val program = Ir.Program(
      Vector(
        Ir.Rule(None, None, None, entrypoint = false,
          List(
            Ir.Clause(Map("type" -> List("#t")), negated = false, Some("repeat"),
              List(Ir.Yield("$n", Nil))),
            Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil),
          ), None),
      ),
      Some(Ir.GroupBy(List("#t"), Some("@arr"), mergeResults = false)),
    )
    val tuples = Vector(ForeachTuple(Vector(Right(Vector("zz", "aa", "mm")))))
    val out = LocalRunner.run(Compiled.compile(program), Seq(db), foreachTuples = Some(tuples))
    val keys = out.toOutputs.head.keys.toVector
    assert(keys == Vector("$n", "#t"), keys.toString)
    val json = OutputJson.render(out.toOutputs, grouped = true)
    // echo preserves the params-file order, not sorted order
    assert(json.contains("\"#t\":[\"zz\",\"aa\",\"mm\"]"), json)
  }
}
