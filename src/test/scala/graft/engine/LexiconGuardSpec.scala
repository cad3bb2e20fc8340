package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The implicit-foreach lexicon sweep is a (reference-sanctioned) driver
  * collect — pointing it at a high-cardinality field must fail fast with a
  * clear message instead of OOMing the driver.
  */
class LexiconGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("lexicon-guard").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sweep fails fast above the configured cardinality bound") {
    val s = spark
    import s.implicits._
    val ev = (1 to 5000).map(i => (s"u${i % 10}", i.toLong, s"val$i")).toDF("uuid", "ts", "f")
    spark.conf.set(TrailEngine.MaxImplicitForeachKey, "1000")
    try {
      val e = intercept[IllegalArgumentException](TrailEngine.lexiconSweep(ev, "f"))
      assert(e.getMessage.contains("high-cardinality"))
    } finally spark.conf.unset(TrailEngine.MaxImplicitForeachKey)
  }

  test("enum-like sweeps are unaffected and sorted with nulls dropped") {
    val s = spark
    import s.implicits._
    val ev = Seq(("u1", 1L, "b"), ("u1", 2L, "a"), ("u2", 3L, null), ("u2", 4L, "b"))
      .toDF("uuid", "ts", "f")
    assert(TrailEngine.lexiconSweep(ev, "f") == Vector("a", "b"))
  }
}
