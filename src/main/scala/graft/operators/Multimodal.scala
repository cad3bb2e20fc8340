package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batch shape.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (pure arithmetic on the blob bytes).
  * Everything around it is the real thing a 100 TB media pipeline needs:
  * the schema (blob + struct metadata), the partition-level batch loop
  * (mapPartitions — the Scala analog of mapInPandas batches: amortize
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

  /** STUB decode: deterministic fake metadata from blob bytes. A real
    * implementation would parse the container header; the Spark-side
    * contract (binary in, struct out, applied per-batch) is identical.
    */
  def decodeStub(blob: Array[Byte]): Row = {
    if (blob == null || blob.isEmpty) Row(0, 0, 0, "empty")
    else {
      val n = blob.length
      val w = 64 + (n % 512)
      val h = 64 + ((n / 7) % 512)
      val c = 1 + (n % 3)
      Row(w, h, c, if (n % 2 == 0) "png" else "jpeg")
    }
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

  /** Attach decoded metadata + features to a DataFrame with a binary
    * `blobCol`, in batch shape via mapPartitions (rows streamed; per-batch
    * setup happens once per partition — where a real decoder would load
    * its codec/model).
    */
  def decodeAndFeaturize(df: DataFrame, blobCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add("meta", metaSchema)
      .add("features", ArrayType(FloatType))
    val blobIdx = inSchema.fieldIndex(blobCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition setup: a real implementation initializes the decoder
      // here, once, and processes rows in batches
      rows.map { r =>
        val blob = r.get(blobIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decodeStub(blob) :+ featuresStub(blob).toSeq)
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
