package graft.trck

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end tests: every reference IR-level test program
  * (reference: the test/json corpus, 14 files) run through
  * Compiled+Fsm+LocalRunner and compared with ddiff semantics.
  */
class GoldenJsonSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/test/json")

  // The reference's own suite runs json/test*.json only (reference:
  // test/run_all_tests_c.sh:5); impressions.json / imp_uniques_by_adgroup
  // use a stale expected-output format and are excluded there too.
  private val files =
    if (Files.isDirectory(dir))
      Files.list(dir).iterator.asScala
        .filter(p => p.getFileName.toString.matches("test.*\\.json"))
        .toList.sortBy(_.toString)
    else Nil

  for (path <- files) {
    val jv = JsonMethods.parse(Files.readString(path))
    val gf = TestHarness.parseFile(jv, None)
    for ((t, i) <- gf.tests.zipWithIndex) {
      val name = s"${path.getFileName} #$i${if (t.desc.nonEmpty) s" (${t.desc})" else ""}"
      test(name) {
        TestHarness.runGolden(gf, t) match {
          case None      => succeed
          case Some(err) => fail(err)
        }
      }
    }
  }

  test("corpus discovered") {
    assert(files.size >= 12, s"expected >=12 reference IR test files, found ${files.size}")
  }
}
