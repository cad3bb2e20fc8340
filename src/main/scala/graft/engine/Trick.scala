package graft.engine

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
  * Shared by the TrickSpec property suite (which checks every generated
  * corpus three ways: LocalRunner vs computed expectations, distributed
  * TrailEngine ≡ LocalRunner, and the window-file / 2-source splits) and
  * the user-facing [[graft.Trick]] CLI (the reference's `trick.py`
  * entrypoint over `.trick` spec files).
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
