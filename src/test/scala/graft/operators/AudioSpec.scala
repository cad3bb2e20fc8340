package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Behavioral specs for the audio modality: real WAV round-trip, the
  * fingerprint's dedup/Hamming properties, and the classify-never-throw
  * crawl-corpus contract (truncation, forged lengths, wrong layouts).
  */
class AudioSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("4").appName("audio-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("real WAV header decode round-trips the encoded parameters; junk classifies") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(40).select(col("doc_id"))
    val rows = Audio.decodeMeta(Audio.synthesizeAudio(docs, "doc_id"), "blob")
      .select(col("doc_id"), col("meta.sample_rate"), col("meta.channels"),
        col("meta.bits"), col("meta.n_samples"), col("meta.format"))
      .collect()
    assert(rows.length == 40)
    assert(rows.forall { r =>
      val id = r.getLong(0)
      r.getInt(1) == 8000 + (id % 3).toInt * 4000 && r.getInt(2) == 1 &&
        r.getInt(3) == 8 && r.getLong(4) == 2048 + (id % 5) * 512 &&
        r.getString(5) == "wave"
    }, rows.take(5).mkString(", "))
    // non-audio bytes classify, never throw
    assert(Audio.decodeAudioMeta("not audio".getBytes("UTF-8")).getString(4) == "undecodable")
    assert(Audio.decodeAudioMeta(Array.emptyByteArray).getString(4) == "empty")
    assert(Audio.decodeAudioMeta(null).getString(4) == "empty")
    // deterministic fixture bytes (streaming replay safety)
    assert(java.util.Arrays.equals(Audio.syntheticWav(7L), Audio.syntheticWav(7L)))
  }

  test("banded fingerprint: collision on identical audio, Hamming-close on edits, guards classify") {
    // identical waveforms collide exactly
    val a = Audio.fingerprintPcm8(Audio.syntheticWav(3L), 32)
    assert(a.isDefined && a == Audio.fingerprintPcm8(Audio.syntheticWav(3L), 32))
    // different seeds → different fingerprints (sensitivity)
    assert(a != Audio.fingerprintPcm8(Audio.syntheticWav(4L), 32))
    // a small local edit (one band's samples boosted) flips few bits
    val blob = Audio.syntheticWav(3L)
    val edited = blob.clone()
    var i = 44 // first band ≈ first n/32 samples after the 44-byte header
    while (i < 44 + 64) { edited(i) = 0xf0.toByte; i += 1 }
    val e = Audio.fingerprintPcm8(edited, 32)
    assert(e.isDefined && e != a)
    assert(java.lang.Long.bitCount(a.get ^ e.get) <= 4,
      s"one-band edit flipped ${java.lang.Long.bitCount(a.get ^ e.get)} bits")
    // fingerprint matches the closed-form expectation the oracle derives
    // (band floor-means of the sawtooth, floor-mean threshold)
    val id = 3L
    val n = (2048 + (id % 5) * 512).toInt
    val st = 1 + id % 16
    val sums = new Array[Long](32); val counts = new Array[Long](32)
    for (k <- 0 until n) {
      val b = (k.toLong * 32 / n).toInt
      sums(b) += (k * st + id) % 256; counts(b) += 1
    }
    val cells = Array.tabulate(32)(b => sums(b) / counts(b))
    val mean = cells.sum / 32
    val expected = (0 until 32).filter(b => cells(b) > mean).map(1L << _).sum
    assert(a.get == expected, "fingerprint drifted from the closed form")
    // truncated stream (declared frames missing) classifies null
    assert(Audio.fingerprintPcm8(blob.dropRight(100), 32).isEmpty)
    // forged declared length — the audio decompression-bomb analog: patch
    // the RIFF + data-chunk sizes to claim ~2G samples over 2 KiB of
    // data; the guard must classify before allocating anything
    val forged = blob.clone()
    def putLe32(off: Int, v: Int): Unit = {
      forged(off) = v.toByte; forged(off + 1) = (v >> 8).toByte
      forged(off + 2) = (v >> 16).toByte; forged(off + 3) = (v >> 24).toByte
    }
    putLe32(4, Int.MaxValue - 8); putLe32(40, Int.MaxValue - 44)
    assert(Audio.fingerprintPcm8(forged, 32).isEmpty)
    // undecodable / null classify
    assert(Audio.fingerprintPcm8("junk".getBytes("UTF-8"), 32).isEmpty)
    assert(Audio.fingerprintPcm8(null, 32).isEmpty)
    // a 16-bit stereo WAV (wrong layout for the PCM8 contract) classifies
    // rather than fingerprinting wrongly
    val stereo16 = {
      val samples = new Array[Byte](4096)
      val out = new Array[Byte](44 + samples.length)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(2).putInt(8000).putInt(32000).putShort(4).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(samples.length).put(samples)
      out
    }
    assert(Audio.fingerprintPcm8(stereo16, 32).isEmpty)
    // fewer frames than bands → empty bands; must classify via the
    // explicit pre-check, and a bands-sized file is the smallest accepted
    assert(Audio.fingerprintPcm8(Audio.wavEncodePcm8(new Array[Byte](31), 8000), 32).isEmpty)
    assert(Audio.fingerprintPcm8(Audio.wavEncodePcm8(new Array[Byte](32), 8000), 32).isDefined)
  }

  test("afp32 SQL expression matches fingerprintPcm8 bit-for-bit; nulls classify") {
    val s = spark
    import s.implicits._
    val blobs = Audio.synthesizeAudio(
      (0L until 30L).map(d => (d, d % 50)).toDF("doc_id", "aid"), "aid")
    val op = Audio.fingerprint(blobs, "blob")
      .select(col("doc_id"), col("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    blobs.createOrReplaceTempView("afp_probe")
    val sql = spark.sql("SELECT doc_id, afp32(blob) AS fp FROM afp_probe")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == op, "SQL expression must emit the operator's exact bits")
    // undecodable / truncated / null blobs evaluate to NULL, never throw
    val junk = Seq(
      (1L, "not audio".getBytes("UTF-8")),
      (2L, Audio.syntheticWav(3L).dropRight(100)),
      (3L, null.asInstanceOf[Array[Byte]]),
    ).toDF("doc_id", "blob")
    junk.createOrReplaceTempView("afp_junk")
    val nulls = spark.sql("SELECT afp32(blob) FROM afp_junk").collect()
    assert(nulls.forall(_.isNullAt(0)), nulls.mkString(","))
  }

  test("au_fingerprint_dup clusters exactly the docs sharing a waveform seed") {
    val s = spark
    import s.implicits._
    val docs = (0L until 120L).map(d => (d, d % 50)).toDF("doc_id", "aid")
    val out = Audio.fingerprint(Audio.synthesizeAudio(docs, "aid"), "blob")
      .select(col("doc_id"), col("aid"), col("fp")).collect()
    assert(out.length == 120 && out.forall(!_.isNullAt(2)))
    // same seed ⇒ same fingerprint (the engineered duplicates cluster)
    val bySeed = out.groupBy(_.getLong(1)).map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
    assert(bySeed.forall(_._2.size == 1))
    // the fingerprint must separate waveforms, not hash everything
    // together — a coarse 32-band threshold hash legitimately collides
    // on phase-shifted variants of one sawtooth shape (a constant offset
    // moves every band mean together), so expect a spread, not 1:1
    // (measured: 22 distinct across the 50 seeds)
    val distinctFps = out.map(_.getLong(2)).toSet
    assert(distinctFps.size >= 15, s"only ${distinctFps.size} distinct fingerprints across 50 seeds")
  }
}
