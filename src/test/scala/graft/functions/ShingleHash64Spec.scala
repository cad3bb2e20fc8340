package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** ShingleHash64 must be byte-for-byte the same hash family as the
  * composable chain it replaces:
  * `transform(sequence(...), i -> xxhash64(concat_ws(" ", slice(split(
  * trim(text), "\\s+"), i+1, k))))` with the <k single-joined-shingle
  * case — across every tokenization edge the curation corpus can hit
  * (leading/trailing spaces vs tabs/newlines, runs of mixed whitespace,
  * empty and all-whitespace strings, multi-byte UTF-8, k=1).
  */
class ShingleHash64Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("shingle-hash-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** the reference chain: one xxhash64 per shingle string */
  private def chain(k: Int) = {
    val words = split(trim(col("text")), "\\s+")
    val shingles = when(size(words) < k, array(concat_ws(" ", words)))
      .otherwise(transform(
        sequence(lit(0), size(words) - k),
        i => concat_ws(" ", slice(words, i + 1, lit(k)))))
    transform(shingles, s => xxhash64(s))
  }

  private val edges = Seq(
    "simple three word text",
    "one",
    "",
    " ",
    "   ",
    "\t",
    "\ttab lead",
    "trail tab\t",
    "  space pad  ",
    " \t mixed \n runs \r\n here  ok ",
    "a  b   c    d",
    "multi\nline\ntext here",
    "ünïcode wörds ärë fine größe 文字 列 です",
    "x " * 300 + "tail",
    (1 to 50).map(i => s"w$i").mkString(" "),
  )

  test("native hashes == composable-chain hashes on every edge case, k in {1,3,5}") {
    val s = spark
    import s.implicits._
    val df = edges.toDF("text").cache()
    for (k <- Seq(1, 3, 5)) {
      val got = df.select(col("text"), ShingleHash64(col("text"), k).as("h")).collect()
      val want = df.select(col("text"), chain(k).as("h")).collect()
      got.zip(want).foreach { case (g, w) =>
        assert(g.getSeq[Long](1) == w.getSeq[Long](1),
          s"k=$k text=${g.getString(0).take(40).replace("\n", "\\n")}")
      }
    }
  }

  test("randomized parity: 500 generated whitespace-heavy strings, k=3") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "ab \t\n cd  e \r f"
    val texts = (0 until 500).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = texts.toDF("text")
    val diff = df
      .select(ShingleHash64(col("text"), 3).as("a"), chain(3).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0L)
  }

  test("unicode-adversarial parity: NBSP/ZWSP don't split, surrogates survive, k in {1,2,5}") {
    val s = spark
    import s.implicits._
    // Java regex \s is exactly [ \t\n\x0B\f\r]: U+00A0 NBSP, U+200B ZWSP,
    // U+3000 ideographic space must NOT split tokens in either engine; the
    // byte-level scanner must agree on multi-byte boundaries (2-byte
    // Latin-1, 3-byte CJK, 4-byte surrogate-pair emoji, combining marks)
    val pool: Array[String] = Array(
      " ", "\t", "\n", "\r", "", "\f", // splitting ws
      " ", "​", "　", // NON-splitting exotic "spaces"
      "a", "Z", "9", "ü", "ß", "é", "文", "字", "あ", "한",
      "😀", "🤖", // surrogate-pair emoji
      "é", // combining acute
      "word", "λόγος", "слово",
    )
    val rnd = new scala.util.Random(0x5eed7L)
    val texts = (0 until 400).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val df = texts.toDF("text").cache()
    for (k <- Seq(1, 2, 5)) {
      val diff = df
        .select(ShingleHash64(col("text"), k).as("a"), chain(k).as("b"))
        .filter(col("a") =!= col("b"))
        .count()
      assert(diff == 0L, s"k=$k: native/chain divergence on unicode-adversarial corpus")
    }
    df.unpersist()
  }

  test("SQL registration + null propagation + whole-stage codegen path") {
    val s = spark
    import s.implicits._
    Seq(Some("a b c d e"), None).toDF("text").createOrReplaceTempView("sh_t")
    val rows = spark.sql("SELECT shingle_hash64(text, 2) AS h FROM sh_t ORDER BY h IS NULL").collect()
    assert(rows.length == 2 && !rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(0).getSeq[Long](0).length == 4)
    // codegen actually engages (no CodegenFallback): a non-foldable input
    // (so ConvertToLocalRelation can't pre-evaluate) plans the expr inside
    // a WholeStageCodegen stage, and the generated path agrees with eval
    val df = spark.range(100)
      .select(concat(lit("pfx "), col("id").cast("string"), lit(" sfx\t")).as("text"))
    // Spark renders whole-stage-codegen stages as a "*(<id>)" prefix (e.g.
    // "*(1) Project [shingle_hash64(...)]"), not the class name — assert on
    // that, and structurally on the executed plan tree.
    val exec = df.select(ShingleHash64(col("text"), 2)).queryExecution.executedPlan
    val plan = exec.toString
    val codegenNode = exec.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(plan.contains("*(") || codegenNode.isDefined, plan)
    val viaCodegen = df.select(ShingleHash64(col("text"), 2).as("h")).collect().map(_.getSeq[Long](0))
    val viaChain = df.select(chain(2).as("h")).collect().map(_.getSeq[Long](0))
    assert(viaCodegen.toSeq == viaChain.toSeq)
  }
}
