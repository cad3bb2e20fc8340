package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Byte-level reproducibility of the shard WRITE path: two runs of
  * [[Curation.writeTokenShards]] — and a run over a differently-
  * partitioned input — must produce byte-identical per-shard files
  * (file names carry the committer's per-run UUID; identity is over
  * contents). Plus the structural contract: one data file per shard,
  * `pos` dense and ordered within each shard, and the shard union
  * carrying exactly the packTokens sequences.
  */
class ShardWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("shard-write-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"
  private val nShards = 4

  private def shardFiles(dir: String): Map[Int, Seq[Path]] = {
    val root = Paths.get(dir)
    (0 until nShards).map { k =>
      val d = root.resolve(s"shard=$k")
      val files =
        if (!Files.isDirectory(d)) Seq.empty[Path]
        else {
          val s = Files.list(d)
          try s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
          finally s.close()
        }
      k -> files
    }.toMap
  }

  private def sha256(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  private def shardHashes(dir: String): Map[Int, Seq[String]] =
    shardFiles(dir).map { case (k, fs) => k -> fs.map(sha256) }

  test("two runs write byte-identical shards; partitioning does not leak into the bytes") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val d1 = Files.createTempDirectory("shards1").toString
    val d2 = Files.createTempDirectory("shards2").toString
    val d3 = Files.createTempDirectory("shards3").toString
    Curation.writeTokenShards(docs, d1, nShards)
    Curation.writeTokenShards(docs, d2, nShards)
    // adversarial input partitioning: the bytes must not change
    Curation.writeTokenShards(docs.repartition(7), d3, nShards)

    val h1 = shardHashes(d1)
    // exactly one data file per shard, every shard present
    (0 until nShards).foreach { k =>
      assert(h1(k).size == 1, s"shard $k has ${h1(k).size} files")
    }
    assert(shardHashes(d2) == h1, "re-run produced different bytes")
    assert(shardHashes(d3) == h1, "input partitioning leaked into shard bytes")
  }

  test("within each shard pos is dense and ordered; shards partition the packed sequences") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val dir = Files.createTempDirectory("shards4").toString
    Curation.writeTokenShards(docs, dir, nShards)

    // per-shard, read the SINGLE file directly (no Spark re-sort): row
    // order in the file is the order a training loader sees
    (0 until nShards).foreach { k =>
      val f = shardFiles(dir)(k).head.toString
      val pos = spark.read.parquet(f).select("pos").collect().map(_.getLong(0))
      assert(pos.toSeq == pos.indices.map(_.toLong), s"shard $k pos not dense-ordered")
    }

    // union of shards == packTokens output exactly (same seqs, same ids)
    val back = spark.read.parquet(dir).select("seq_id", "n_tokens", "ids")
    val packed = Curation.packTokens(docs, maxLen = 256)
    assert(back.count() == packed.count())
    assert(back.except(packed).isEmpty && packed.except(back).isEmpty)

    // placement is the md5 rule, not an accident of execution
    val placed = spark.read.parquet(dir)
      .select(col("seq_id"), col("shard").cast("int").as("shard"))
    val expected = Curation.shardAssign(packed, nShards, "seq_id")
      .select(col("seq_id"), col("shard"))
    assert(placed.except(expected).isEmpty && expected.except(placed).isEmpty)
  }
}
