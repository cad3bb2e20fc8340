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
  * format without decoding pixel data. What the container env still can't
  * provide is a real media corpus, so the registered query renders
  * deterministic tiny PNGs per document ([[synthesizeImages]]) and the
  * oracle checks the real decoder returns exactly the encoded dimensions —
  * an end-to-end codec round-trip. The remaining stub is
  * [[featuresStub]]: feature extraction needs an encoder model the
  * environment does not ship. Everything else is the real thing a 100 TB
  * media pipeline needs: the schema (blob + struct metadata), the
  * partition-level batch loop (mapPartitions — the Scala analog of
  * mapInPandas batches: amortize per-batch setup, stream rows, never
  * materialize a partition), and narrow one-pass processing with no
  * shuffle.
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
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val png = new PngEncoder // per-partition codec setup
      rows.map { r =>
        val id = r.getLong(idIdx)
        Row.fromSeq(r.toSeq :+ syntheticPng(id, (8 + id % 32).toInt, (8 + (id / 3) % 32).toInt, png))
      }
    }(enc)
  }

  /** STUB feature extraction: deterministic 8-dim float vector from blob
    * content (a real pipeline would run an encoder model per batch).
    */
  def featuresStub(blob: Array[Byte]): Array[Float] = {
    if (blob == null) return Array.fill(8)(0f)
    val out = new Array[Float](8)
    var i = 0
    while (i < blob.length) { out(i % 8) += (blob(i) & 0xff) / 255.0f; i += 1 }
    out
  }

  /** Attach decoded metadata (REAL header parse, [[decodeImageMeta]]) +
    * features (stub — model-blocked) to a DataFrame with a binary
    * `blobCol`, in batch shape via mapPartitions (rows streamed; per-batch
    * setup happens once per partition — where a real pipeline would load
    * its feature model).
    */
  def decodeAndFeaturize(df: DataFrame, blobCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add("meta", metaSchema)
      .add("features", ArrayType(FloatType))
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition setup: a real feature extractor initializes its
      // model here, once, and processes rows in batches
      rows.map { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decodeImageMeta(blob) :+ featuresStub(blob).toSeq)
      }
    }(enc)
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
}
