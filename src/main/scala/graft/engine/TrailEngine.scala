package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.trck._
import graft.trck.Compiled.CompiledProgram
import graft.trck.Fsm.{Bindings, FsmState, TrailEvent}
import graft.trck.LocalRunner.ForeachTuple

/** The distributed trail-matching operator: runs a trck program over a
  * `(uuid, ts, fields…)` DataFrame.
  *
  * Physical shape (the plan that survives 100 TB):
  *
  *   scan (pruned to uuid + ts + program fields, filters pushed down)
  *     → repartition(uuid)                 // the ONE shuffle
  *     → sortWithinPartitions(uuid, ts, tiebreak…)
  *     → mapPartitions: iterate consecutive same-uuid runs, one trail in
  *       memory at a time (no per-group materialization of the partition),
  *       run the foreach loop with the reference's N+1 skip optimizations,
  *       finalize at MAX_TIMESTAMP inline (single-source ⇒ no cross-trail
  *       state), emit compact yield rows
  *     → groupBy(tuple, dst[, item]) aggregation — partial map-side combine
  *       makes the second shuffle O(distinct yields), not O(events)
  *
  * State never outlives one trail iterator step, so executor memory is
  * O(longest trail + tuple count), independent of partition size — the
  * property that lets this run on 1000 executors with skewed users.
  *
  * The per-trail semantics are shared byte-for-byte with LocalRunner
  * (the golden-tested oracle) via TrailMatcher.
  */
object TrailEngine {

  /** Emitted row schema: one row per (trail × tuple × yield-item). */
  private val emitSchema = StructType(Seq(
    StructField("uuid", StringType),
    StructField("tuple_idx", IntegerType),
    StructField("kind", StringType), // c / s / m / h
    StructField("dst", StringType),
    StructField("item", BinaryType), // encoded tuple; null for counters
    StructField("n", LongType),
  ))

  /** Per-trail context columns for window-file runs (reference window_set
    * semantics, src/match_traildb.c:513-553): each window entry is its own
    * ctx — `cookieCol` holds the ctx cookie (the window id, which `cookie`
    * yields echo), `startCol`/`endCol` the Y5 filter bounds. The trail key
    * (`uuidCol`) must then be unique per window entry, so one real cookie
    * with several windows runs as several independent trails.
    */
  final case class CtxCols(cookieCol: String, startCol: String, endCol: String)

  /** Cluster + sort a trail events frame ONCE for repeated trail queries:
    * `emits(..., prepared = true)` over the result skips its per-query
    * shuffle+sort — the dominant cost of every trail query. Persist the
    * result for within-session reuse, or write it out with
    * `df.write.bucketBy(n, uuidCol).sortBy(uuidCol, tsCol).saveAsTable(t)`
    * for a durable layout (read back with
    * `spark.sql.sources.v2.bucketing.enabled` /
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` so the
    * scan keeps one-partition-per-bucket).
    *
    * The guarantee emits needs is exactly: same-uuid rows contiguous per
    * partition, ordered by (preOrder, ts, tiebreak) within each uuid run.
    */
  def prepare(
      events: DataFrame,
      uuidCol: String,
      tsCol: String,
      tiebreak: Seq[String] = Nil,
      preOrderCols: Seq[String] = Nil,
  ): DataFrame =
    events
      .repartition(col(uuidCol))
      .sortWithinPartitions(
        col(uuidCol) +: (preOrderCols ++ (tsCol +: tiebreak)).map(col): _*)

  /** Run `prog` over `events`, which must contain `uuidCol`, `tsCol`
    * (long seconds) and a column per program-referenced field (missing
    * columns read as ""). Extra columns participate in consecutive-dup
    * elision only (reference semantics: dedup compares the full event).
    * `tiebreak` columns complete the per-trail event order under equal ts.
    */
  def emits(
      prog: CompiledProgram,
      events: DataFrame,
      uuidCol: String,
      tsCol: String,
      tiebreak: Seq[String] = Nil,
      params: Bindings = Bindings(),
      foreachTuples: Option[Vector[ForeachTuple]] = None,
      fcalls: Map[String, Fsm.Fcall] = Map.empty,
      ctx: Option[CtxCols] = None,
      /** columns sorted BEFORE ts within each trail — the multi-source path
        * passes the source index here so each trail replays its sources
        * sequentially (reference: DBs are processed in argument order with
        * per-trail state carry, src/match_traildb.c:384-390)
        */
      preOrderCols: Seq[String] = Nil,
      /** true ⇒ `events` is already uuid-clustered and (uuid, preOrder, ts,
        * tiebreak)-sorted within partitions (via [[prepare]] or an
        * equivalent bucketed layout) — the per-query shuffle+sort is
        * skipped entirely. Correctness depends on the caller's guarantee.
        */
      prepared: Boolean = false,
  ): DataFrame = {
    val spark = events.sparkSession

    val tuples: Vector[ForeachTuple] =
      if (prog.groupbyVars.isEmpty) Vector(ForeachTuple(Vector.empty))
      else
        foreachTuples.getOrElse {
          // implicit foreach: lexicon sweep, "" first
          // (reference: src/match_traildb.c:188-236)
          require(prog.groupbyVars.size == 1, "implicit foreach requires exactly one var")
          val field = prog.varFields(prog.groupbyVars.head)
          val values = events
            .select(col(field).cast(StringType))
            .na.fill("")
            .distinct()
            .collect()
            .map(_.getString(0))
            .filter(_.nonEmpty)
            .sorted
          ("" +: values.toVector).map(v => ForeachTuple(Vector(Left(v))))
        }

    // prune to what the FSM needs; all extra columns only matter for dedup,
    // which by reference semantics uses the full input row
    val ctxNames = ctx.toSeq.flatMap(c => Seq(c.cookieCol, c.startCol, c.endCol))
    val ctxSel: Seq[Column] = ctx.toSeq.flatMap(c =>
      Seq(
        col(c.cookieCol).cast(StringType).as("__ctx"),
        col(c.startCol).cast(LongType).as("__wstart"),
        col(c.endCol).cast(LongType).as("__wend"),
      ))
    val reserved = (Seq(uuidCol, tsCol) ++ ctxNames).toSet
    val dedupCols = events.columns.filterNot(reserved).toSeq // full row minus uuid/ts/ctx
    val projected = events.select(
      (col(uuidCol).cast(StringType).as("__uuid") +:
        col(tsCol).cast(LongType).as("__ts") +:
        ctxSel) ++
        dedupCols.map(c => col(c).cast(StringType).as(c)): _*
    )

    val sorted =
      if (prepared) projected // layout guaranteed by the caller — no shuffle
      else
        projected
          .repartition(col("__uuid"))
          .sortWithinPartitions(
            col("__uuid") +: (preOrderCols.map(col) ++ (col("__ts") +: tiebreak.map(col))): _*)

    val fieldBase = 2 + ctxSel.length
    val hasCtx = ctx.isDefined
    val fieldIdxInRow: Array[Int] = prog.fields.map { f =>
      val i = dedupCols.indexOf(f)
      if (i >= 0) i + fieldBase else -1
    }
    val nDedup = dedupCols.length

    val tuplesB = spark.sparkContext.broadcast(tuples)
    val enc = RowEncoder.encoderFor(emitSchema)

    val emitted = sorted.mapPartitions { rows =>
      val ts = tuplesB.value
      new Iterator[Row] {
        private val buf = scala.collection.mutable.ArrayBuffer[Row]()
        private var bufPos = 0
        private var pending: Row = null // first row of next trail

        private def rowField(r: Row, i: Int): String = {
          val v = r.get(i); if (v == null) "" else v.toString
        }

        private def processNextTrail(): Unit = {
          buf.clear(); bufPos = 0
          var first = pending
          if (first == null && rows.hasNext) first = rows.next()
          if (first == null) return
          pending = null
          val uuid = first.getString(0)
          // ctx cookie + Y5 window bounds (constant per trail by construction)
          val ctxCookie = if (hasCtx) first.getString(2) else uuid
          val wStart = if (hasCtx) first.getLong(3) else 0L
          val wEnd = if (hasCtx) first.getLong(4) else 0L
          // collect this trail's events (consecutive same-uuid rows),
          // applying consecutive-dup elision over the full row
          val evs = scala.collection.mutable.ArrayBuffer[TrailEvent]()
          var prev: Row = null
          var cur = first
          var done = false
          while (!done && cur != null) {
            if (cur.getString(0) != uuid) { pending = cur; done = true }
            else {
              val dup = prev != null && prev.getLong(1) == cur.getLong(1) && {
                var i = fieldBase; var same = true
                while (same && i < fieldBase + nDedup) { same = rowField(prev, i) == rowField(cur, i); i += 1 }
                same
              }
              if (!dup) {
                val arr = new Array[String](fieldIdxInRow.length)
                var i = 0
                while (i < arr.length) {
                  arr(i) = if (fieldIdxInRow(i) == -1) "" else rowField(cur, fieldIdxInRow(i))
                  i += 1
                }
                evs += new TrailEvent(cur.getLong(1), arr)
                prev = cur
              }
              cur = if (rows.hasNext) rows.next() else null
            }
          }

          val eventsArr = evs.toArray
          val saved = Array.fill(ts.length)(FsmState.initial(prog))
          def emit(j: Int, r: Results): Unit = {
            r.counters.foreach { case (d, v) =>
              if (v != 0) buf += Row(ctxCookie, j, "c", d, null, v)
            }
            r.sets.foreach { case (d, m) =>
              m.foreach { case (t, c) => buf += Row(ctxCookie, j, "s", d, t, c) }
            }
            r.msets.foreach { case (d, m) =>
              m.foreach { case (t, c) => buf += Row(ctxCookie, j, "m", d, t, c) }
            }
            r.hlls.foreach { case (d, h) =>
              // emit the trail-local sketch registers; merged upstream
              buf += Row(ctxCookie, j, "h", d, h.registers, 1L)
            }
          }
          val out = TrailMatcher.processTrail(
            prog, ts, saved, eventsArr, ctxCookie, wStart, wEnd, params, fcalls, emit)
          TrailMatcher.finalizeTrail(prog, ts, out, ctxCookie, params, fcalls, emit)
        }

        override def hasNext: Boolean = {
          while (bufPos >= buf.length && (pending != null || rows.hasNext))
            processNextTrail()
          bufPos < buf.length
        }
        override def next(): Row = { val r = buf(bufPos); bufPos += 1; r }
      }
    }(enc)

    emitted
  }

  /** Counter results as a DataFrame: (tuple vars…, dst, value), summed
    * across trails — the A1 monoid as a plain Spark aggregation.
    */
  def counters(
      emitted: DataFrame,
      prog: CompiledProgram,
      tuples: Vector[ForeachTuple],
  ): DataFrame = {
    val agg = emitted
      .filter(col("kind") === "c")
      .groupBy("tuple_idx", "dst")
      .agg(sum("n").as("value"))
    withTupleCols(agg, prog, tuples)
  }

  /** Per-uuid counter results: (uuid, dst, value). */
  def countersByUuid(emitted: DataFrame): DataFrame =
    emitted
      .filter(col("kind") === "c")
      .groupBy("uuid", "dst")
      .agg(sum("n").as("value"))

  /** Join the small foreach-tuple table back for readable output. */
  private def withTupleCols(df: DataFrame, prog: CompiledProgram, tuples: Vector[ForeachTuple]): DataFrame = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val varNames = prog.groupbyVars.map(v => Ir.stripType(v))
    val schema = StructType(
      StructField("tuple_idx", IntegerType) +: varNames.map(n => StructField(n, StringType)))
    val rows = tuples.zipWithIndex.map { case (t, i) =>
      Row.fromSeq(i +: t.items.map {
        case Left(s)   => s
        case Right(ss) => ss.toSeq.sorted.mkString(",")
      })
    }
    val tupleDf = spark.createDataFrame(rows.asJava, schema)
    if (varNames.isEmpty) df else df.join(broadcast(tupleDf), "tuple_idx")
  }
}
