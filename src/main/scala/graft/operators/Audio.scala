package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Audio-column plumbing: waveforms as opaque `binary` WAV blobs with typed
  * metadata, completing the multimodal column family (images:
  * [[Multimodal]], video-like frames: [[Multimodal.decodeFrames]]).
  *
  * The decode step is REAL: `javax.sound.sampled` (in the JDK — no new
  * dependency) parses the RIFF/WAVE header for sample rate / channels /
  * bits / frame count without touching sample data, and streams the PCM
  * frames for the fingerprint path. The environment ships no audio corpus,
  * so the registered queries attach deterministic synthetic waveforms
  * (closed-form integer sawtooth per doc — [[synthesizeAudio]]) and the
  * oracles recompute the decoder/fingerprint output from first principles,
  * the same end-to-end codec round-trip technique as the image fixtures.
  * Everything else is what a 100 TB audio pipeline needs: blob + struct
  * schema, per-partition batch loop, bounded allocation with a declared-
  * length guard, and a banded integer fingerprint whose Hamming distance
  * is an audio near-duplicate distance.
  */
object Audio {

  val metaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("format", StringType),
  ))

  /** Canonical 44-byte RIFF/WAVE header + raw PCM payload. Unsigned 8-bit
    * mono is the storage format — the WAV spec's 8-bit convention, and a
    * byte-exact round trip through `javax.sound.sampled`.
    */
  def wavEncodePcm8(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + n)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate)      // byte rate (1 byte/frame)
      .putShort(1)             // block align
      .putShort(8)             // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(samples)
    out
  }

  /** Deterministic synthetic waveform for seed `id`: an integer sawtooth —
    * sample n = (n·(1 + id%16) + id) mod 256 — of 2048 + (id%5)·512
    * samples at 8000 + (id%3)·4000 Hz. Every parameter is SQL-derivable,
    * so the decode and fingerprint oracles recompute the exact PCM stream
    * with `generate_series`, no recursion needed.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (2048 + (id % 5) * 512).toInt
    val step = 1 + id % 16
    val samples = new Array[Byte](n)
    var i = 0
    while (i < n) { samples(i) = ((i * step + id) % 256).toByte; i += 1 }
    wavEncodePcm8(samples, (8000 + (id % 3) * 4000).toInt)
  }

  /** Attach a deterministic synthetic WAV per row (seeded from `idCol`) —
    * blob fixtures for the real-decode path, in the mapPartitions batch
    * shape of the image synthesizers.
    */
  def synthesizeAudio(df: DataFrame, idCol: String, blobCol: String = "blob"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(blobCol, BinaryType)
    val idIdx = inSchema.fieldIndex(idCol)
    val getId: Row => Long = inSchema.fields(idIdx).dataType match {
      case LongType    => _.getLong(idIdx)
      case IntegerType => _.getInt(idIdx).toLong
      case ShortType   => _.getShort(idIdx).toLong
      case ByteType    => _.getByte(idIdx).toLong
      case dt => throw new IllegalArgumentException(
        s"$idCol must be an integral type (got ${dt.simpleString})")
    }
    val enc = RowEncoder.encoderFor(outSchema)
    // r21: NOT spread (unlike the image synthesizers) — measured 0.65 s →
    // 1.64 s on au_decode_meta and 0.52 s → 1.0 s on au_fingerprint_dup
    // with a 32-way repartition here: javax.sound's provider lookup
    // contends under concurrent decode where ImageIO does not, so the
    // audio chain stays on the scan's own parallelism.
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ syntheticWav(getId(r))))
    }(enc)
  }

  /** REAL header decode: `AudioSystem.getAudioFileFormat` parses the
    * container header only (sample data untouched — the metadata pass a
    * 100 TB audio audit runs). Non-audio bytes classify as "undecodable",
    * never throw — crawl-corpus contract.
    */
  def decodeAudioMeta(blob: Array[Byte]): Row = {
    if (blob == null || blob.isEmpty) return Row(0, 0, 0, 0L, "empty")
    try {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(blob))
      val f = ff.getFormat
      Row(f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
        ff.getFrameLength.toLong,
        ff.getType.toString.toLowerCase(java.util.Locale.ROOT))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => Row(0, 0, 0, 0L, "undecodable")
      case scala.util.control.NonFatal(_) => Row(0, 0, 0, 0L, "undecodable")
    }
  }

  /** Attach decoded audio metadata ONLY (header parse, no sample read) to
    * a DataFrame with a binary `blobCol`.
    */
  def decodeMeta(df: DataFrame, blobCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("meta", metaSchema)
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decodeAudioMeta(blob))
      }
    }(enc)
  }

  /** Declared-length guard for the fingerprint path: the header's frame
    * count drives band partitioning, and a forged header can declare
    * billions of frames over a few real bytes — the audio analog of the
    * image decompression bomb. 16M samples ≈ 33 min of 8 kHz mono; past
    * that the row classifies instead of allocating.
    */
  val MaxFingerprintSamples: Long = 16L * 1024 * 1024

  /** Banded audio fingerprint — the 1-D analog of the image aHash, in pure
    * integer arithmetic: partition the PCM stream into `bands` contiguous
    * time bands (sample n → band n·bands/N, the same floor partition as
    * the luminance grid), take each band's floor-mean amplitude, then set
    * bit b iff band b's mean exceeds the floor-mean of all band means.
    * Identical waveforms collide exactly; small edits flip few bits
    * (Hamming-meaningful). Band sums accumulate STREAMING over 8 KiB
    * chunks — the full sample array is never materialized, so memory is
    * O(bands), not O(duration).
    *
    * Contract: unsigned 8-bit mono PCM (the fixture/storage format —
    * other layouts classify null rather than fingerprint wrongly);
    * declared frame count past [[MaxFingerprintSamples]], a truncated
    * stream, or an undecodable container → null.
    */
  def fingerprintPcm8(blob: Array[Byte], bands: Int): Option[Long] = {
    if (blob == null || blob.isEmpty) return None
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      catch { case scala.util.control.NonFatal(_) => return None }
    try {
      val f = in.getFormat
      val n = in.getFrameLength
      // n < bands leaves empty bands; classify explicitly instead of
      // letting the division throw (exception-as-control-flow)
      if (f.getChannels != 1 || f.getSampleSizeInBits != 8 || f.getFrameSize != 1 ||
        n < bands || n > MaxFingerprintSamples) return None
      val sums = new Array[Long](bands)
      val counts = new Array[Long](bands)
      val buf = new Array[Byte](8192)
      var pos = 0L
      var read = in.read(buf)
      while (read > 0) {
        var i = 0
        while (i < read) {
          val b = ((pos + i) * bands / n).toInt
          sums(b) += buf(i) & 0xff
          counts(b) += 1
          i += 1
        }
        pos += read
        read = in.read(buf)
      }
      if (pos != n) return None // truncated vs declared — classify
      var bandMeanSum = 0L
      val cells = new Array[Long](bands)
      var b = 0
      while (b < bands) { cells(b) = sums(b) / counts(b); bandMeanSum += cells(b); b += 1 }
      val mean = bandMeanSum / bands
      var bits = 0L
      b = 0
      while (b < bands) { if (cells(b) > mean) bits |= 1L << b; b += 1 }
      Some(bits)
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally in.close()
  }

  /** Attach the banded fingerprint (`fp`, nullable long) to a DataFrame
    * with a binary `blobCol` — mapPartitions batch shape, streaming band
    * accumulation per row.
    */
  def fingerprint(df: DataFrame, blobCol: String, bands: Int = 32): DataFrame = {
    require(bands >= 1 && bands <= 64, s"bands must be 1..64, got $bands")
    val inSchema = df.schema
    val outSchema = inSchema.add("fp", LongType)
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ fingerprintPcm8(blob, bands).map(Long.box).orNull)
      }
    }(enc)
  }
}
