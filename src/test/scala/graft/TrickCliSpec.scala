package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The `graft.Trick` CLI (the reference's trick.py entrypoint) end-to-end
  * on the README's own "engaged user" example (reference:
  * trick/README.md Usage + Constraints sections): the generated positive
  * trails must produce the declared outputs, every negativity mask's
  * trails must produce zero, the `-Params` alternative case must run with
  * its own binds (a conversion-segment set the events never carry → 0),
  * a wrong expectation must fail loudly, and `--emit-dir` must write a
  * reference-format test file (program + `----- unit tests ----` JSON
  * trailer).
  */
class TrickCliSpec extends AnyFunSuite {

  private def withCapturedStdout[A](f: => A): (A, String) = {
    val buf = new ByteArrayOutputStream()
    val ps = new PrintStream(buf, true, "UTF-8")
    val old = System.out
    System.setOut(ps)
    try {
      val r = Console.withOut(ps)(f)
      ps.flush()
      (r, new String(buf.toByteArray, "UTF-8"))
    } finally System.setOut(old)
  }

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-trick")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private val machine =
    """foreach %camp_id, %ag_id in @adgroups_campaign
      |    start ->
      |        receive
      |            type = "imp", campaign_id = %camp_id, adgroup_id = %ag_id -> seen
      |            * -> repeat
      |    seen ->
      |        receive
      |            type = "pxl", campaign_id = %camp_id, segment_id in #conversion_segments -> yield $engaged, quit
      |            * -> repeat
      |""".stripMargin

  private val spec =
    """# Engaged user
      |Window: 30 days
      |Input: @adgroups_campaign = %camp_id, %ag_id
      |Output: $engaged = 1
      |Params: #conversion_segments
      |-Params: #conversion_segments = zzz1 zzz2
      |-Output: $engaged = 0
      |[ type=imp, campaign_id=%camp_id, adgroup_id=%ag_id ]
      |< max 3 days >
      |[ !type=pxl, campaign_id=%camp_id, segment_id in #conversion_segments ]
      |""".stripMargin

  test("README engaged-user case: positives match, negatives zero, alt params zero") {
    val tr = writeTemp("engaged.tr", machine)
    val tk = writeTemp("engaged.trick", spec)
    val (_, out) = withCapturedStdout(Trick.main(Array(tr, tk)))
    assert(out.contains("Test: Engaged user"), out)
    assert(out.contains("Test: Engaged user (alternative case)"), out)
    // main run: 10 set values x 5 time deltas = 50 positive trails + the
    // 3 negativity masks' 150 negatives; alt run: 50 positives expecting 0
    assert(out.contains("200 / 200 trails ok!"), out)
    assert(out.contains("50 / 50 trails ok!"), out)
    assert(out.contains("All 250 trails ok."), out)
  }

  test("multi-case spec: Positive Only skips negativity masks; repeated-yield counters") {
    val tr = writeTemp("count.tr",
      """foreach %aeid in @arr
        |    start ->
        |        receive
        |            type = "cli", advertisable_eid = %aeid -> yield $match, repeat
        |            * -> repeat
        |""".stripMargin)
    val tk = writeTemp("two.trick",
      """# Double click
        |Input: @arr = %aeid
        |Output: $match = 2
        |Positive Only
        |[ type=cli, advertisable_eid=%aeid ]
        |< min 2 hours, max 1 day >
        |[ type=cli, advertisable_eid=%aeid ]
        |
        |# Single click
        |Input: @arr = %aeid
        |Output: $match = 1
        |[ type=cli, advertisable_eid=%aeid ]
        |""".stripMargin)
    val (_, out) = withCapturedStdout(Trick.main(Array(tr, tk)))
    // case 1: Positive Only -> 4 time deltas = 4 positive trails, no masks;
    // case 2: 1 positive + 1 negativity mask's negative
    assert(out.contains("Test: Double click"), out)
    assert(out.contains("4 / 4 trails ok!"), out)
    assert(out.contains("Test: Single click"), out)
    assert(out.contains("2 / 2 trails ok!"), out)
    assert(out.contains("All 6 trails ok."), out)
  }

  test("a wrong expectation fails loudly with per-trail diagnostics") {
    val tr = writeTemp("engaged.tr", machine)
    val tk = writeTemp("bad.trick",
      spec.replace("Output: $engaged = 1", "Output: $engaged = 2"))
    val (err, out) = withCapturedStdout(
      intercept[RuntimeException](Trick.main(Array(tr, tk))))
    assert(err.getMessage.contains("trails failed"), err.getMessage)
    assert(out.contains("$engaged expected 2 got 1"), out)
  }

  test("--emit-dir writes a reference-format test file (golden-corpus shape)") {
    val tr = writeTemp("engaged.tr", machine)
    val tk = writeTemp("engaged.trick", spec)
    val dir = Files.createTempDirectory("graft-trick-emit").toString
    withCapturedStdout(Trick.main(Array(tr, tk, "--emit-dir", dir)))
    val emitted = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(emitted.exists(_.startsWith("engaged_user")), emitted)
    val main = Files.readString(
      new java.io.File(dir).listFiles().filter(_.getName == "engaged_user.tr").head.toPath)
    assert(main.startsWith("foreach %camp_id"), main.take(80))
    assert(main.contains("----- unit tests ----"), "trailer marker missing")
    val json = org.json4s.jackson.JsonMethods.parse(
      main.split("----- unit tests ----", 2)(1).split("-- ", 2)(1))
    val expected = (json \ "tests")(0) \ "expected"
    assert(expected.children.length == 200, s"${expected.children.length} expected rows")
    val params = json \ "params"
    assert((params \ "@adgroups_campaign").children.length == 200)
    assert((params \ "#conversion_segments").children.length == 10)
  }
}
