package graft.trck

import org.scalatest.funsuite.AnyFunSuite

import graft.trck.LocalRunner.{Db, ForeachTuple, RawEvent}

/** Byte-level checks for the msgpack (S5) and protobuf (S6) result sinks
  * against hand-computed encodings of the reference formats
  * (reference: src/results_msgpack.c output shapes;
  * proto-example/Readme.md wire contract).
  */
class SinkSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  /** program: $n counter, #s 2-tuple set, &m 1-tuple multiset */
  private val program = Ir.Program(
    Vector(
      Ir.Rule(None, None, None, entrypoint = false,
        List(
          Ir.Clause(Map("type" -> List("cli")), negated = false, Some("repeat"),
            List(
              Ir.Yield("$n", Nil),
              Ir.Yield("#s", List(Ir.FieldTerm("a"), Ir.FieldTerm("b"))),
              Ir.Yield("&m", List(Ir.FieldTerm("c"))),
            )),
          Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil),
        ), None),
    ),
    None,
  )

  private val db = Db(Seq(
    "u1" -> Seq(
      RawEvent(1L, Map("type" -> "cli", "a" -> "a", "b" -> "x", "c" -> "q")),
      RawEvent(2L, Map("type" -> "cli", "a" -> "a", "b" -> "y", "c" -> "q")),
      RawEvent(3L, Map("type" -> "cli", "a" -> "b", "b" -> "x", "c" -> "q")),
    ),
  ))

  test("msgpack sink: reference map shape with head-grouped data + tail lexicon") {
    val out = LocalRunner.run(Compiled.compile(program), Seq(db))
    val got = OutputMsgpack.render(out)

    // hand-encoded expectation:
    // {"$n": {"type":"int","value":3},
    //  "#s": {"type":"set","data":{"a":[1,2],"b":[1]},"lexicon":{"x":1,"y":2}},
    //  "&m": {"type":"multiset","data":{"q":[1,3]},"lexicon":{nil:1}}}
    val expected =
      "83" + // map 3
        "a2" + hex("$n".getBytes) + "82" +
        "a4" + hex("type".getBytes) + "a3" + hex("int".getBytes) +
        "a5" + hex("value".getBytes) + "03" +
        "a2" + hex("#s".getBytes) + "83" +
        "a4" + hex("type".getBytes) + "a3" + hex("set".getBytes) +
        "a4" + hex("data".getBytes) + "82" +
        "a1" + hex("a".getBytes) + "92" + "01" + "02" +
        "a1" + hex("b".getBytes) + "91" + "01" +
        "a7" + hex("lexicon".getBytes) + "82" +
        "a1" + hex("x".getBytes) + "01" +
        "a1" + hex("y".getBytes) + "02" +
        "a2" + hex("&m".getBytes) + "83" +
        "a4" + hex("type".getBytes) + "a8" + hex("multiset".getBytes) +
        "a4" + hex("data".getBytes) + "81" +
        "a1" + hex("q".getBytes) + "92" + "01" + "03" +
        "a7" + hex("lexicon".getBytes) + "81" +
        "c0" + "01"
    assert(hex(got) == expected)
  }

  test("msgpack sink: groupby array of {result, vars}") {
    val gp = Ir.Program(
      Vector(
        Ir.Rule(None, None, None, entrypoint = false,
          List(
            Ir.Clause(Map("type" -> List("%t")), negated = false, Some("repeat"),
              List(Ir.Yield("$n", Nil))),
            Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil),
          ), None),
      ),
      Some(Ir.GroupBy(List("%t"), Some("@arr"), mergeResults = false)),
    )
    val tuples = Vector(ForeachTuple(Vector(Left("cli"))), ForeachTuple(Vector(Left("imp"))))
    val out = LocalRunner.run(Compiled.compile(gp), Seq(db), foreachTuples = Some(tuples))
    val got = OutputMsgpack.render(out)
    // [{result: {"$n":{"type":"int","value":3}}, vars: {"%t":"cli"}},
    //  {result: {"$n":{"type":"int","value":0}}, vars: {"%t":"imp"}}]
    val expected =
      "92" +
        "82" + "a6" + hex("result".getBytes) + "81" +
        "a2" + hex("$n".getBytes) + "82" +
        "a4" + hex("type".getBytes) + "a3" + hex("int".getBytes) +
        "a5" + hex("value".getBytes) + "03" +
        "a4" + hex("vars".getBytes) + "81" + "a2" + hex("%t".getBytes) + "a3" + hex("cli".getBytes) +
        "82" + "a6" + hex("result".getBytes) + "81" +
        "a2" + hex("$n".getBytes) + "82" +
        "a4" + hex("type".getBytes) + "a3" + hex("int".getBytes) +
        "a5" + hex("value".getBytes) + "00" +
        "a4" + hex("vars".getBytes) + "81" + "a2" + hex("%t".getBytes) + "a3" + hex("imp".getBytes)
    assert(hex(got) == expected)
  }

  test("proto sink: length-prefixed Result with SetTuple/MultisetTuple wire format") {
    val out = LocalRunner.run(Compiled.compile(program), Seq(db))
    val got = OutputProto.render(out)
    // default numbering: counter_n=1, set_s=2, multiset_m=3
    // counter: 08 03
    // set tuples (sorted): ("a","x") -> 12 06 0a 01 61 0a 01 78, ("a","y"), ("b","x")
    // multiset ("q") count 3 -> 1a 07 0a 01 71 10 03
    val msg =
      "0803" +
        "1206" + "0a0161" + "0a0178" +
        "1206" + "0a0161" + "0a0179" +
        "1206" + "0a0162" + "0a0178" +
        "1a05" + "0a0171" + "1003"
    val msgLen = msg.length.toLong / 2
    val prefix = (0 until 8).map(i => f"${(msgLen >> (8 * i)) & 0xff}%02x").mkString
    assert(hex(got) == prefix + msg)
  }

  test("proto sink: groupby scalar echo per message") {
    val gp = Ir.Program(
      Vector(
        Ir.Rule(None, None, None, entrypoint = false,
          List(
            Ir.Clause(Map("type" -> List("%t")), negated = false, Some("repeat"),
              List(Ir.Yield("$n", Nil))),
            Ir.Clause(Map.empty, negated = false, Some("repeat"), Nil),
          ), None),
      ),
      Some(Ir.GroupBy(List("%t"), Some("@arr"), mergeResults = false)),
    )
    val tuples = Vector(ForeachTuple(Vector(Left("cli"))), ForeachTuple(Vector(Left("imp"))))
    val out = LocalRunner.run(Compiled.compile(gp), Seq(db), foreachTuples = Some(tuples))
    val got = OutputProto.render(out)
    // numbering: scalar_t=1, counter_n=2
    // msg1: scalar "cli" (0a 03 63 6c 69) + counter 3 (10 03)
    // msg2: scalar "imp" only (zero counter omitted)
    val m1 = "0a03636c69" + "1003"
    val m2 = "0a03696d70"
    def prefix(n: Long) = (0 until 8).map(i => f"${(n >> (8 * i)) & 0xff}%02x").mkString
    assert(hex(got) == prefix(m1.length.toLong / 2) + m1 + prefix(m2.length.toLong / 2) + m2)
  }

  test("JSON render budget fails fast with a clear error, not a driver OOM") {
    import scala.collection.mutable
    def out(n: Int): mutable.LinkedHashMap[String, Any] =
      mutable.LinkedHashMap[String, Any](
        "n" -> 1L, "big" -> OutputJson.Mset(Vector.tabulate(n)(i => s"key$i" -> 1L)))
    // within budget: renders normally (both shapes)
    assert(OutputJson.render(Vector(out(3)), grouped = false).contains("\"key2\":1"))
    assert(OutputJson.render(Vector(out(3), out(2)), grouped = true).startsWith("["))
    // over budget: clear IllegalStateException naming the bound, in both
    // the single-object and grouped-array shapes; the grouped path checks
    // incrementally (per tuple), so the failure happens at ~the bound,
    // not after building the whole oversized string
    val e1 = intercept[IllegalStateException] {
      OutputJson.render(Vector(out(1000)), grouped = false, maxRenderBytes = 64)
    }
    assert(e1.getMessage.contains("render budget"))
    val e2 = intercept[IllegalStateException] {
      OutputJson.render(Vector.fill(100)(out(100)), grouped = true, maxRenderBytes = 1024)
    }
    assert(e2.getMessage.contains("render budget"))
  }

  test("msgpack and protobuf renders enforce the same budget") {
    val out = LocalRunner.run(Compiled.compile(program), Seq(db))
    // normal render fits comfortably
    assert(OutputMsgpack.render(out).nonEmpty)
    assert(OutputProto.render(out).nonEmpty)
    // a 4-byte budget trips on the same clear error
    val em = intercept[IllegalStateException] { OutputMsgpack.render(out, maxRenderBytes = 4) }
    assert(em.getMessage.contains("render budget"))
    val ep = intercept[IllegalStateException] {
      OutputProto.render(out, maxRenderBytes = 4)
    }
    assert(ep.getMessage.contains("render budget"))
  }
}
