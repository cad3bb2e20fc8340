package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batch shape.
  *
  * The decode step is REAL: `javax.imageio` (in the JDK — no new
  * dependency) parses the container header for width/height/components/
  * format without decoding pixel data. The feature step is REAL too:
  * deterministic perceptual hashes (aHash over an 8×8 area-mean luminance
  * grid, dHash over 9×8 — the textbook public algorithms, no model
  * required) computed from the fully-decoded raster, plus the 64-cell
  * luminance grid itself as a float vector so the embedding operators have
  * a genuine image-derived input. What the container env can't provide is
  * a real media corpus, so the registered queries render deterministic
  * tiny PNGs per document ([[synthesizeImages]]) and the oracles recompute
  * the decoder/hash output from first principles — an end-to-end codec
  * round-trip. Everything here is the real thing a 100 TB media pipeline
  * needs: the schema (blob + struct metadata), the partition-level batch
  * loop (mapPartitions — the Scala analog of mapInPandas batches: amortize
  * per-batch setup, stream rows, never materialize a partition), and
  * narrow one-pass processing with no shuffle.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
  ))

  /** REAL decode: parse the image container header with javax.imageio —
    * width/height/raw component count/format name, WITHOUT decoding pixel
    * data (header-only reads; a 100 TB metadata pass must not pay full
    * decompression). Non-image bytes classify as "undecodable" rather than
    * erroring — on a real crawl corpus that row is the norm, not the
    * exception.
    */
  // in-memory streams only: the default ImageIO disk cache would create and
  // delete a temp FILE per decoded row on every executor (and fail outright
  // on a full/unwritable java.io.tmpdir) — these blobs are already byte
  // arrays, there is nothing to cache
  javax.imageio.ImageIO.setUseCache(false)

  def decodeImageMeta(blob: Array[Byte]): Row = {
    if (blob == null || blob.isEmpty) return Row(0, 0, 0, "empty")
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Row(0, 0, 0, "undecodable")
      val r = readers.next()
      try {
        r.setInput(iis)
        val raw = r.getRawImageType(0)
        val channels =
          if (raw != null) raw.getNumComponents
          else {
            val it = r.getImageTypes(0)
            if (it.hasNext) it.next().getNumComponents else 0
          }
        // Locale.ROOT: a default-locale lowercase is machine-dependent
        // (Turkish-locale JVMs dot-map "GIF") — metadata must be stable
        // across executors
        Row(r.getWidth(0), r.getHeight(0), channels,
          r.getFormatName.toLowerCase(java.util.Locale.ROOT))
      } finally r.dispose()
    } catch {
      // valid magic bytes but a truncated/corrupt header (THE common bad
      // row on a crawl corpus) throws from the header reads — that row
      // classifies, it must never fail the task
      case scala.util.control.NonFatal(_) => Row(0, 0, 0, "undecodable")
    } finally iis.close()
  }

  /** Deterministic tiny PNG: an LCG fills a gray (seed % 4 == 0) or RGB
    * image, encoded by the JDK's PNG writer. The fixture generator for the
    * real-decode round-trip — NOT part of the operator surface. Pass a
    * reusable [[PngEncoder]] when encoding in bulk — a fresh
    * `ImageIO.write` pays an ImageIO-registry writer lookup and stream
    * setup per call, exactly the per-row cost the mapPartitions batch
    * shape exists to amortize.
    */
  def syntheticPng(seed: Long, width: Int, height: Int,
                   enc: PngEncoder = new PngEncoder): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      if (seed % 4 == 0) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var x = seed
    var j = 0
    while (j < height) {
      var i = 0
      while (i < width) {
        x = x * 6364136223846793005L + 1442695040888963407L
        img.setRGB(i, j, (x >>> 40).toInt)
        i += 1
      }
      j += 1
    }
    enc.encode(img)
  }

  /** One PNG ImageWriter + output buffer, reused across a partition's rows
    * (per-partition codec setup — the real decoder/encoder pattern this
    * module documents). NOT thread-safe; one instance per task.
    */
  final class PngEncoder {
    private val writer = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "JDK PNG writer missing")
      it.next()
    }
    private val buf = new java.io.ByteArrayOutputStream(4096)
    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      buf.reset()
      val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally ios.close()
      buf.toByteArray
    }
  }

  /** Attach a deterministic synthetic PNG per row (dims derived from
    * `idCol`, SQL-derivable for the oracle): blob fixtures for the
    * real-decode path, rendered in the mapPartitions batch shape an
    * ingestion job would use — the PNG writer is initialized once per
    * partition and reused for every row.
    */
  def synthesizeImages(df: DataFrame, idCol: String, blobCol: String = "blob"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(blobCol, BinaryType)
    val idIdx = inSchema.fieldIndex(idCol)
    // resolve the id extractor from the schema ONCE — a non-long integral
    // id must widen (r.getLong on an IntegerType column ClassCastExceptions
    // inside the task), and a non-integral id must fail at plan time, not
    // mid-job
    val getId: Row => Long = inSchema.fields(idIdx).dataType match {
      case LongType    => _.getLong(idIdx)
      case IntegerType => _.getInt(idIdx).toLong
      case ShortType   => _.getShort(idIdx).toLong
      case ByteType    => _.getByte(idIdx).toLong
      case dt => throw new IllegalArgumentException(
        s"$idCol must be an integral type (got ${dt.simpleString})")
    }
    val enc = RowEncoder.encoderFor(outSchema)
    // r21: spread the id rows before the codec kernel — the bench corpus
    // is a one-split scan, which serialized every synthesize+decode chain
    // onto one core (measured: the whole mm_* family ran single-task
    // stages); Spread is a no-op at lake scale (see graft.Spread)
    graft.Spread(df).mapPartitions { rows =>
      val png = new PngEncoder // per-partition codec setup
      rows.map { r =>
        val id = getId(r)
        Row.fromSeq(r.toSeq :+ syntheticPng(id, (8 + id % 32).toInt, (8 + (id / 3) % 32).toInt, png))
      }
    }(enc)
  }

  /** Integer Rec.601-weighted luminance with 8-bit fixed-point weights
    * (77 + 151 + 28 = 256). The exact formula is part of the operator
    * contract — the mm_features oracle recomputes it bit-for-bit.
    */
  def luminance(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (77 * r + 151 * g + 28 * b) >> 8
  }

  /** `cols`×`rows` area-mean luminance grid over a decoded raster — the
    * downsampling step of aHash/dHash, in pure integer arithmetic so the
    * result is engine-reproducible (no interpolation kernel, no float
    * rounding): pixel (i, j) belongs to cell (i·cols/w, j·rows/h) (integer
    * floor — an exact partition of the raster into contiguous blocks), and
    * the cell value is floor(sum/count) of the cell's luminances. Images
    * narrower/shorter than the grid point-sample each cell's anchor pixel
    * instead (floor(gx·w/cols), floor(gy·h/rows)) so tiny thumbnails still
    * hash rather than hitting empty cells.
    */
  def luminanceGrid(img: java.awt.image.BufferedImage, cols: Int, rows: Int): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Long](cols * rows)
    if (w >= cols && h >= rows) {
      val sums = new Array[Long](cols * rows)
      val counts = new Array[Long](cols * rows)
      var j = 0
      while (j < h) {
        val gy = j * rows / h
        var i = 0
        while (i < w) {
          val c = gy * cols + i * cols / w
          sums(c) += luminance(img.getRGB(i, j))
          counts(c) += 1
          i += 1
        }
        j += 1
      }
      var c = 0
      while (c < out.length) { out(c) = sums(c) / counts(c); c += 1 }
    } else {
      var gy = 0
      while (gy < rows) {
        var gx = 0
        while (gx < cols) {
          out(gy * cols + gx) = luminance(img.getRGB(gx * w / cols, gy * h / rows)).toLong
          gx += 1
        }
        gy += 1
      }
    }
    out
  }

  /** aHash: bit (gy·8+gx) set iff the 8×8 grid cell exceeds the grid's
    * floor-mean. Ties clear the bit (strict >).
    */
  def aHash(grid8: Array[Long]): Long = {
    require(grid8.length == 64, s"aHash needs an 8x8 grid, got ${grid8.length} cells")
    var sum = 0L; var c = 0
    while (c < 64) { sum += grid8(c); c += 1 }
    val mean = sum / 64
    var bits = 0L; c = 0
    while (c < 64) { if (grid8(c) > mean) bits |= 1L << c; c += 1 }
    bits
  }

  /** dHash: bit (gy·8+gx) set iff cell (gx+1, gy) of the 9×8 grid exceeds
    * cell (gx, gy) — the horizontal-gradient hash.
    */
  def dHash(grid9: Array[Long]): Long = {
    require(grid9.length == 72, s"dHash needs a 9x8 grid, got ${grid9.length} cells")
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (grid9(gy * 9 + gx + 1) > grid9(gy * 9 + gx)) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Decompression-bomb guard for [[readImage]]: the largest raster the
    * feature path will allocate (64 Mpx ≈ 256 MB ARGB). A crafted PNG can
    * declare enormous dimensions in a few hundred compressed bytes — THE
    * classic crawl-corpus attack on an image pipeline — and
    * `ImageIO.read` would faithfully allocate the full raster and OOM the
    * executor. The header carries the dimensions, so the guard costs a
    * header parse, not a decode.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Full pixel decode for the feature path — unlike [[decodeImageMeta]]'s
    * header-only parse, features need the raster. Undecodable/null blobs,
    * and blobs whose declared raster exceeds [[MaxDecodePixels]], return
    * null (classify, never throw — crawl-corpus contract).
    */
  private[graft] def readImage(blob: Array[Byte]): java.awt.image.BufferedImage =
    if (blob == null || blob.isEmpty) null
    else
      try {
        val meta = decodeImageMeta(blob)
        val (w, h) = (meta.getInt(0).toLong, meta.getInt(1).toLong)
        if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) null
        else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      } catch { case scala.util.control.NonFatal(_) => null }

  /** Attach decoded metadata ONLY (REAL header parse, [[decodeImageMeta]]
    * — no pixel decompression) to a DataFrame with a binary `blobCol`.
    * The metadata pass a 100 TB media audit runs: use this when features
    * aren't needed — [[decodeAndFeaturize]] pays the full pixel decode
    * its hashes require.
    */
  def decodeMeta(df: DataFrame, blobCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("meta", metaSchema)
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decodeImageMeta(blob))
      }
    }(enc)
  }

  /** Attach decoded metadata (REAL header parse, [[decodeImageMeta]]) and
    * REAL perceptual features to a DataFrame with a binary `blobCol`, in
    * batch shape via mapPartitions (rows streamed; per-partition setup —
    * where a pipeline with a learned encoder would also load its model).
    * Output columns: `meta` (struct), `features` (the 64-cell area-mean
    * luminance grid as floats in [0,1] — a deterministic image-derived
    * vector the embedding/ANN operators can consume directly), `ahash` and
    * `dhash` (64-bit perceptual hashes; Hamming distance = visual
    * near-duplicate distance). Rows whose blob doesn't pixel-decode get
    * null features/hashes alongside their classified `meta`.
    */
  def decodeAndFeaturize(df: DataFrame, blobCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add("meta", metaSchema)
      .add("features", ArrayType(FloatType))
      .add("ahash", LongType)
      .add("dhash", LongType)
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        val meta = decodeImageMeta(blob)
        val img = readImage(blob)
        if (img == null)
          Row.fromSeq(r.toSeq :+ meta :+ null :+ null :+ null)
        else {
          val g8 = luminanceGrid(img, 8, 8)
          val g9 = luminanceGrid(img, 9, 8)
          Row.fromSeq(r.toSeq :+ meta :+ g8.map(_ / 255.0f).toSeq
            :+ aHash(g8) :+ dHash(g9))
        }
      }
    }(enc)
  }

  /** One GIF sequence writer + output buffer, reused across a partition's
    * rows (the [[PngEncoder]] pattern for the animated fixture). NOT
    * thread-safe; one instance per task.
    */
  final class GifEncoder {
    private val writer = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
      require(it.hasNext, "JDK GIF writer missing")
      it.next()
    }
    private val buf = new java.io.ByteArrayOutputStream(4096)
    def encode(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      buf.reset()
      val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f =>
          writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally ios.close()
      buf.toByteArray
    }
  }

  /** One deterministic gray frame: LCG bytes written DIRECTLY into the
    * raster (`setSample`), not through `setRGB` — the RGB path runs the
    * JDK's gray ICC conversion, which is deterministic but not
    * SQL-re-derivable; raw samples are, and a gray GIF palette round-trips
    * them exactly (decoded pixel (v,v,v) has integer luminance
    * (77+151+28)·v/256 = v). Pixel (i,j) row-major uses the (j·w+i+1)-th
    * LCG state's bits 40..47.
    */
  def syntheticGifFrame(seed: Long, width: Int, height: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var x = seed
    var j = 0
    while (j < height) {
      var i = 0
      while (i < width) {
        x = x * 6364136223846793005L + 1442695040888963407L
        raster.setSample(i, j, 0, ((x >>> 40) & 0xff).toInt)
        i += 1
      }
      j += 1
    }
    img
  }

  /** Attach a deterministic multi-frame (animated) GIF per row: 2–4 gray
    * frames of `(8 + id%9) × (8 + (id/3)%9)` pixels, frame k seeded
    * `(id+1)·1000003 + k` — every parameter SQL-derivable so the
    * frame-decode oracle recomputes each frame's pixels from the LCG
    * closed form. Fixture generator for [[decodeFrames]]' real-decode
    * round-trip, in the same per-partition-encoder batch shape as
    * [[synthesizeImages]].
    */
  def synthesizeGifs(df: DataFrame, idCol: String, blobCol: String = "blob"): DataFrame = {
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
    // r21: spread before the codec kernel (synthesizeImages rationale)
    graft.Spread(df).mapPartitions { rows =>
      val gif = new GifEncoder // per-partition codec setup
      rows.map { r =>
        val id = getId(r)
        val w = (8 + id % 9).toInt
        val h = (8 + (id / 3) % 9).toInt
        val frames = (0 until (2 + id % 3).toInt)
          .map(k => syntheticGifFrame((id + 1) * 1000003L + k, w, h))
        Row.fromSeq(r.toSeq :+ gif.encode(frames))
      }
    }(enc)
  }

  /** REAL resize: decode the raster ([[readImage]] — bomb guard included),
    * area-mean downscale the integer luminance onto an `outW`×`outH` grid
    * (the same exact floor-partition arithmetic as the hash grids, so the
    * resized CONTENT is engine-reproducible — no interpolation kernel, no
    * float rounding), and re-encode as an 8-bit gray PNG written
    * sample-direct (PNG grayscale stores the samples verbatim, so the
    * resized blob round-trips losslessly). Images narrower/shorter than
    * the target point-sample ([[luminanceGrid]]'s documented fallback).
    * Undecodable/oversized blobs get a null `resized` — classify, never
    * throw. mapPartitions batch shape; one PNG writer per partition.
    */
  def resizeLuma(df: DataFrame, blobCol: String, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1 && outW <= 4096 && outH <= 4096)
    val inSchema = df.schema
    val outSchema = inSchema.add("resized", BinaryType)
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val png = new PngEncoder
      rows.map { r =>
        val img = readImage(r.get(blobIdx).asInstanceOf[Array[Byte]])
        val out =
          if (img == null) null
          else {
            val grid = luminanceGrid(img, outW, outH)
            val g = new java.awt.image.BufferedImage(outW, outH,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = g.getRaster
            var c = 0
            while (c < grid.length) {
              raster.setSample(c % outW, c / outW, 0, grid(c).toInt)
              c += 1
            }
            png.encode(g)
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Row-major lowercase-hex dump of a gray image's RAW samples (raster
    * reads, NOT getRGB — getRGB runs the ICC gray→sRGB conversion and
    * would destroy the reproducibility the sample-direct encode paid
    * for). Null for undecodable blobs. The verification face of
    * [[resizeLuma]]: decoding the resized blob back and hexing its
    * samples proves the whole resize→encode→decode chain bit-exact.
    */
  def graySamplesHex(blob: Array[Byte]): String = {
    val img = readImage(blob)
    if (img == null || img.getRaster.getNumBands != 1) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val sb = new java.lang.StringBuilder(w * h * 2)
    val raster = img.getRaster
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val v = raster.getSample(i, j, 0)
        sb.append(Character.forDigit(v >> 4, 16)).append(Character.forDigit(v & 15, 16))
        i += 1
      }
      j += 1
    }
    sb.toString
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frame_ahash", LongType),
    StructField("n_frames", IntegerType),
  ))

  /** REAL multi-frame decode: open the container once per blob with
    * javax.imageio, enumerate its frames, decode each frame's raster and
    * emit one row per frame with its dimensions and 64-bit perceptual
    * aHash (`kind = "frame"`). The guards a crawl corpus forces:
    *
    *   - the [[MaxDecodePixels]] decompression-bomb check runs PER FRAME
    *     from the frame header, before its raster is allocated — an
    *     animated container can hide one enormous frame behind small ones
    *     (`kind = "oversize"`, dims reported, no decode paid);
    *   - a frame that throws mid-decode (truncated stream) classifies as
    *     `kind = "corrupt"` and stops the frame loop — never the task;
    *   - a blob no installed reader recognizes falls back to the honest
    *     byte-slice sampler ([[frameSample]]'s contract: every
    *     `sliceEveryNth`-th `sliceBytes` slice, `frame_idx` = source slice
    *     ordinal, `kind = "slice"`, null dims/hash) so undecodable rows
    *     still flow through the same schema;
    *   - null/empty blobs emit no rows.
    *
    * Per-frame fanout is bounded by `maxFrames`; `n_frames` carries the
    * container's true frame count so truncation is visible. Runs in the
    * mapPartitions batch shape — one reader/stream per row, rows streamed,
    * frame lists bounded, nothing partition-wide materialized.
    */
  def decodeFrames(df: DataFrame, blobCol: String, maxFrames: Int = 8,
                   sliceEveryNth: Int = 4, sliceBytes: Int = 1024): DataFrame = {
    require(maxFrames >= 1 && sliceEveryNth >= 1 && sliceBytes >= 1)
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ frameSchema.fields)
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        if (blob == null || blob.isEmpty) Iterator.empty
        else {
          val frames = decodeFrameRows(blob, maxFrames, sliceEveryNth, sliceBytes)
          frames.iterator.map(f => Row.fromSeq(r.toSeq ++ f.toSeq))
        }
      }
    }(enc)
  }

  /** The per-blob frame loop of [[decodeFrames]], returning bounded
    * frame-column rows (see [[frameSchema]]). Separated so specs can pin
    * the classification contract without a Spark job.
    */
  private[graft] def decodeFrameRows(blob: Array[Byte], maxFrames: Int,
                                     sliceEveryNth: Int, sliceBytes: Int): Vector[Row] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) {
        // undecodable → byte-slice fallback, frameSample's slicing contract
        val nSlices = (blob.length + sliceBytes - 1) / sliceBytes
        val lastIdx = math.min(nSlices - 1, (maxFrames - 1) * sliceEveryNth)
        (0 to lastIdx by sliceEveryNth).iterator
          .map(k => Row(k.toLong, "slice", null, null, null, null)).toVector
      } else {
        val rd = readers.next()
        try {
          rd.setInput(iis)
          val n = rd.getNumImages(true)
          val out = Vector.newBuilder[Row]
          var k = 0
          var corrupt = false
          while (k < math.min(n, maxFrames) && !corrupt) {
            out += (try {
              val w = rd.getWidth(k); val h = rd.getHeight(k)
              if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels)
                Row(k.toLong, "oversize", w, h, null, n)
              else {
                val g8 = luminanceGrid(rd.read(k), 8, 8)
                Row(k.toLong, "frame", w, h, aHash(g8), n)
              }
            } catch {
              case scala.util.control.NonFatal(_) =>
                corrupt = true
                Row(k.toLong, "corrupt", null, null, null, n)
            })
            k += 1
          }
          out.result()
        } finally rd.dispose()
      }
    } catch {
      // container so broken even enumeration throws: classify the blob
      case scala.util.control.NonFatal(_) => Vector(Row(0L, "corrupt", null, null, null, null))
    } finally iis.close()
  }

  /** Frame-sample stub for video-like blobs: every nth 1 KiB slice as a
    * "frame" (one row per frame — the exploding-fanout shape a real frame
    * sampler has; fanout bounded by maxFrames). Pure column expressions
    * (sequence → substr slices, codegen'd — no UDF), and `frame_idx` is
    * the PER-BLOB source slice ordinal emitted by the generator itself, so
    * it is deterministic under any partitioning. Blobs shorter than one
    * slice yield their single short frame; null blobs yield no rows.
    */
  def frameSample(df: DataFrame, blobCol: String, everyNth: Int = 4, maxFrames: Int = 8,
                  frameBytes: Int = 1024): DataFrame = {
    require(everyNth >= 1 && maxFrames >= 1 && frameBytes >= 1)
    val blob = col(blobCol)
    val nSlices = ceil(length(blob) / lit(frameBytes.toDouble)).cast("int")
    val lastIdx = least(nSlices - 1, lit((maxFrames - 1) * everyNth))
    val idxs = when(blob.isNull || nSlices <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), lastIdx, lit(everyNth)))
    df.select(col("*"), explode(idxs).as("frame_idx"))
      .withColumn("frame", blob.substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .withColumn("frame_idx", col("frame_idx").cast("long"))
  }

  /** Joint image-text PAIR dedup — the LAION-style rule for web-scale
    * image-caption corpora: two samples are duplicates only when BOTH
    * modalities match (near-dup image AND near-dup caption); matching on
    * either alone over-merges (one stock photo under thousands of
    * distinct captions, one boilerplate caption under thousands of
    * images). Composition of two existing kernels: the image side keys
    * on the perceptual `ahash64` ([[graft.functions.PerceptualHash64]] —
    * the mm_image_dedup bits), the caption side on MinHash-LSH band
    * buckets ([[MinHash.membershipsMd5]] — the d_minhash_lsh family);
    * the composed bucket is (band, ahash, bandKey), so sharing one
    * requires agreement in both modalities simultaneously.
    *
    * Canonical assignment and hot-bucket policy are inherited verbatim
    * from the LSH canonical family: per composed bucket (size, min-id)
    * via one window pass, per-doc min over non-hot buckets (> maxBucket
    * members = boilerplate collision, not duplicate evidence — sized
    * against the COMPOSED key space, which is strictly finer than either
    * modality alone), docs with no eligible bucket self-canonical.
    *
    * Scale shape: one id-keyed join attaching the per-doc image hash to
    * the N×bands membership rows, one exchange on the composed key for
    * the window, one id-keyed aggregation — all AQE-skew-splittable, no
    * corpus text in any shuffle (memberships carry only 8-byte keys).
    */
  def pairDedup(pairs: DataFrame, idCol: String = "doc_id", blobCol: String = "blob",
                captionCol: String = "caption", k: Int = 3, h: Int = 16,
                bands: Int = 8, maxBucket: Int = 50): DataFrame = {
    val ah = pairs.select(col(idCol),
      graft.functions.PerceptualHash64.aHash(col(blobCol)).as("ah"))
    val mem = MinHash.membershipsMd5(pairs, idCol, captionCol, k, h, bands)
      .join(ah, Seq(idCol))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "ah", "bk")
    val fromBuckets = mem
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__bmin", min(col(idCol)).over(w))
      .groupBy(idCol)
      .agg(min(when(col("__n") <= maxBucket, col("__bmin"))).as("__cmin"))
    pairs.select(col(idCol))
      .join(fromBuckets, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__cmin"), col(idCol)).as("canonical_id"))
  }

  /** Deterministic caption fixture for the pair-dedup query: caption
    * cluster c = doc_id % 30, five words all derived from c — same-
    * cluster docs carry the exact caption, different clusters share no
    * shingle. Combined with the doc_id % 50 image clusters, joint pairs
    * form at doc_id ≡ (mod 150) — strictly finer than EITHER modality's
    * own clusters, so the composition is visible in the output (image-
    * only or caption-only matching would produce different canonicals).
    * Mirrored expression-for-expression by [[captionSql]].
    */
  def withSyntheticCaptions(docs: DataFrame, idCol: String = "doc_id",
                            captionCol: String = "caption"): DataFrame = {
    val c = (col(idCol) % 30).cast("string")
    docs.withColumn(captionCol, concat(
      lit("cap"), c, lit(" w"), c, lit("a w"), c, lit("b w"), c, lit("c w"), c, lit("d")))
  }

  /** DuckDB expression computing exactly [[withSyntheticCaptions]]. */
  def captionSql(idExpr: String = "doc_id"): String = {
    val c = s"CAST($idExpr % 30 AS VARCHAR)"
    s"'cap' || $c || ' w' || $c || 'a w' || $c || 'b w' || $c || 'c w' || $c || 'd'"
  }

  /** CLIP-style image–caption pair FILTER (the LAION construction rule —
    * Schuhmann et al. 2022 keep a crawled pair only when the image/text
    * similarity clears a threshold; CLIP-filtering is how web-scale
    * multimodal training sets are built): per row, the quantized cosine
    * between the image's feature vector and its caption's embedding must
    * reach tNum/tDen. Exact integer arithmetic — the
    * [[Similarity.quantizedPairsAbove]] compare (keep ⟺ dot > 0 ∧
    * d²·dot² ≥ n²·|qi|²·|qc|² over floor(x·scale) vectors, BigInt here /
    * HUGEINT in the oracle) applied per PAIRED row instead of per
    * candidate pair, so the decision AND the reported dot hash-match
    * across engines.
    *
    * Input: one row per pair with both vectors already joined on
    * (`imgCol`, `capCol`). A row missing either side reports (qdot 0,
    * keep 0) — a crawl pair with an undecodable modality is dropped,
    * not errored, matching the decode faces' classify-don't-fail
    * contract. Mismatched dims score over the common prefix (the module
    * contract).
    *
    * Scale shape: one typed map pass, no shuffle beyond the caller's
    * id-equijoin that pairs the modalities — at 100 TB that join is the
    * irreducible step (features and captions are produced by different
    * pipelines), and everything downstream is map-only.
    */
  def pairCosineGate(pairs: DataFrame, tNum: Int, tDen: Int,
                     idCol: String = "doc_id", imgCol: String = "features",
                     capCol: String = "embedding",
                     scale: Double = 1e6): DataFrame = {
    require(tNum > 0 && tDen > 0, "threshold must be a positive rational")
    require(tDen <= 128, "threshold denominators above 128 can push the " +
      "cross-multiplied compare past DuckDB's HUGEINT range (see quantizeChecked)")
    val spark = pairs.sparkSession
    import spark.implicits._
    val n2 = BigInt(tNum) * tNum
    val d2 = BigInt(tDen) * tDen
    pairs
      .select(col(idCol).cast("long"), col(imgCol), col(capCol))
      .as[(Long, Array[Float], Array[Float])]
      .map { case (id, img, cap) =>
        if (img == null || cap == null) (id, 0L, 0L)
        else {
          val qi = Similarity.quantizeChecked(img, scale)
          val qc = Similarity.quantizeChecked(cap, scale)
          val n = math.min(qi.length, qc.length)
          var dot = 0L; var ni = 0L; var nc = 0L; var k = 0
          while (k < n) { dot += qi(k) * qc(k); k += 1 }
          k = 0
          while (k < qi.length) { ni += qi(k) * qi(k); k += 1 }
          k = 0
          while (k < qc.length) { nc += qc(k) * qc(k); k += 1 }
          val keep = dot > 0 && d2 * (BigInt(dot) * dot) >= n2 * (BigInt(ni) * nc)
          (id, dot, if (keep) 1L else 0L)
        }
      }
      .toDF(idCol, "qdot", "keep")
  }
}
