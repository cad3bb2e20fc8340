package graft.trck

import Compiled._
import Fsm._
import LocalRunner.ForeachTuple

/** The per-trail foreach loop with the reference's two skip optimizations
  * (reference: src/match_traildb.c:579-744):
  *
  *  1. groupby-independence early-break: a run that never consulted a
  *     foreach var applies verbatim to every tuple sharing the same
  *     starting state;
  *  2. distinct-value skipping: among tuples that do share a starting
  *     state, those whose values don't appear in the trail all behave
  *     identically — one memoized run covers them.
  *
  * Together these give the reference's ≤ N+1 match-calls-per-trail bound
  * for N distinct foreach values present in the trail
  * (reference: src/match_traildb.c:596-608).
  *
  * Shared between LocalRunner (multi-DB semantics oracle) and the Spark
  * engine (runs inside mapPartitions).
  */
object TrailMatcher {

  /** Local-mode instrumentation: total [[Fsm.matchTrail]] invocations made
    * by [[processTrail]] — the quantity the reference bounds at ~N+1 per
    * trail for N distinct foreach values present in the trail
    * (src/match_traildb.c:596-608). A JVM-wide adder, so it is meaningful
    * only under local[*] where every task shares the driver JVM; the
    * ScaleProbe foreach arm resets and reads it around a run. One
    * uncontended add per match call — negligible.
    */
  val matchCalls = new java.util.concurrent.atomic.LongAdder

  /** Run every foreach tuple over one trail. `saved` holds per-tuple
    * starting states (mutated copies are returned); `onResult(j, scratch)`
    * receives each tuple's yields (scratch may be shared across tuples —
    * merge, don't keep).
    */
  def processTrail(
      prog: CompiledProgram,
      tuples: IndexedSeq[ForeachTuple],
      saved: Array[FsmState],
      events: Array[TrailEvent],
      cookie: String,
      wStart: Long,
      wEnd: Long,
      params: Bindings,
      fcalls: Map[String, Fcall],
      onResult: (Int, Results) => Unit,
  ): Array[FsmState] = {
    val gvars = prog.groupbyVars
    val groupbySet = gvars.toSet
    val nTuples = tuples.length
    val out = new Array[FsmState](nTuples)
    val stats = new RunStats

    val dvOk = gvars.nonEmpty && gvars.forall(v => prog.varFields.get(v).exists(_ != "timestamp"))
    val gvFields = gvars.map(v => prog.varFields.getOrElse(v, ""))

    var trailVals: Array[Set[String]] = null
    def tupleInTrail(k: Int): Boolean = {
      if (trailVals == null)
        trailVals = gvFields.map { f =>
          val s = prog.slot(f)
          if (s == -1) Set.empty[String]
          else {
            val b = Set.newBuilder[String]
            var i = 0
            while (i < events.length) { b += events(i).fields(s); i += 1 }
            b.result()
          }
        }.toArray
      tuples(k).items.zipWithIndex.exists {
        case (Left(v), i)   => trailVals(i).contains(v)
        case (Right(vs), i) => vs.exists(trailVals(i).contains)
      }
    }

    def runOne(j: Int): (FsmState, Results, Boolean) = {
      matchCalls.increment()
      val st = saved(j).copyOf()
      val scratch = new Results(prog)
      stats.reset()
      val ctx = new TrailCtx(cookie, events, wStart, wEnd)
      Fsm.matchTrail(prog, st, ctx, tuples(j).bind(gvars, params), scratch, stats, groupbySet, fcalls)
      (st, scratch, stats.groupbyUsed)
    }

    var j = 0
    while (j < nTuples) {
      var n = 1
      while (j + n < nTuples && saved(j + n).sameAs(saved(j))) n += 1

      val (st, scratch, used) = runOne(j)
      if (!used) {
        // the representative's run applies to every tuple in the group, but
        // each tuple must OWN its state object: finalizeTrail mutates states
        // in place, so an alias would fire its after-yields for the first
        // tuple only and arrive spent (quit) at every other — the reference
        // keeps per-tuple state structs by value (src/match_traildb.c:579-744)
        var k = j
        while (k < j + n) {
          out(k) = if (k == j) st else st.copyOf()
          onResult(k, scratch); k += 1
        }
        j += n
      } else {
        out(j) = st
        onResult(j, scratch)
        var k = j + 1
        val end = j + n
        var memo: (FsmState, Results) = null
        while (k < end) {
          if (!dvOk || tupleInTrail(k)) {
            val (s2, r2, _) = runOne(k)
            out(k) = s2; onResult(k, r2)
          } else if (memo == null) {
            val (s2, r2, _) = runOne(k); memo = (s2, r2)
            out(k) = s2; onResult(k, r2)
          } else {
            // same aliasing hazard as above: later memo users get copies
            out(k) = memo._1.copyOf(); onResult(k, memo._2)
          }
          k += 1
        }
        j = end
      }
    }
    out
  }

  /** Does running the FSM over an EMPTY trail mutate a fresh state? True
    * when the entrypoint chain immediately enters outer window-block rules
    * (state.ri advances past the markers and outer expiries are pushed at
    * ts 0), which makes zero-event trails observable at finalization
    * (after-yields at MAX_TIMESTAMP). The reference runs the per-trail loop
    * for every trail present in a DB — including trails whose events are
    * all filtered away — so engines that drop empty trails early must use
    * this probe to know when that shortcut is visible.
    */
  def emptyRunMutates(prog: CompiledProgram): Boolean = {
    val st = FsmState.initial(prog)
    Fsm.matchTrail(
      prog, st, new TrailCtx("", Array.empty[TrailEvent], 0L, 0L),
      Bindings(), new Results(prog))
    !st.isInitial(prog.entrypoint)
  }

  /** MAX_TIMESTAMP finalization for one trail's surviving states
    * (reference: src/match_traildb.c:899-944).
    */
  def finalizeTrail(
      prog: CompiledProgram,
      tuples: IndexedSeq[ForeachTuple],
      states: Array[FsmState],
      cookie: String,
      params: Bindings,
      fcalls: Map[String, Fcall],
      onResult: (Int, Results) => Unit,
  ): Unit = {
    val gvars = prog.groupbyVars
    val groupbySet = gvars.toSet
    val stats = new RunStats
    var j = 0
    while (j < states.length) {
      if (!states(j).isInitial(prog.entrypoint)) {
        val scratch = new Results(prog)
        stats.reset()
        Fsm.matchTrail(
          prog, states(j), TrailCtx.finalization(cookie),
          tuples(j).bind(gvars, params), scratch, stats, groupbySet, fcalls,
        )
        onResult(j, scratch)
      }
      j += 1
    }
  }
}
