package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** JSONL (newline-delimited JSON) interchange for document corpora — the
  * format crawl dumps, annotation tools, and most public datasets speak.
  * Thin, deliberately: Spark's native JSON source/sink already does
  * distributed line-splittable IO with full escaping; what this module
  * adds is the pinned CONTRACT a pipeline needs to rely on it
  * (JsonlSpec):
  *
  *   - round-trip identity, including newlines inside `text` (JSON
  *     escapes them — the property that makes JSONL line-splittable at
  *     all), quotes, backslashes, unicode, and NULL text;
  *   - corrupt input lines are CLASSIFIED, not thrown: PERMISSIVE mode
  *     lands them in `_corrupt_record` with every schema column null, so
  *     a truncated crawl shard costs its bad lines, not the job (the
  *     Multimodal/Audio undecodable-blob posture);
  *   - explicit schema on read — schema inference is a full extra pass
  *     over 100 TB and type-drifts on dirty data, so it is not offered.
  */
object Jsonl {

  /** The documents-table interchange schema. */
  val DocumentsSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("lang", StringType).add("source", StringType)
    .add("n_chars", LongType)

  /** Write any frame as JSONL. `nFiles` bounds the file fan-out (one file
    * per partition); gzip-compress with
    * `.option("compression", "gzip")` upstream when exchange size
    * matters — left to callers, as are partitioned layouts.
    */
  def write(df: DataFrame, outDir: String, nFiles: Int = 1): Unit = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    df.repartition(nFiles).write.mode("overwrite").json(outDir)
  }

  /** Read JSONL under an EXPLICIT schema; malformed lines survive as
    * `_corrupt_record` rows (all schema columns null) for the caller to
    * count, quarantine, or drop. Spark caveat (its own rule, spec-pinned):
    * a query referencing ONLY `_corrupt_record` must run through a
    * cache/checkpoint of the parsed frame, never straight off the file
    * source.
    */
  def read(spark: SparkSession, dir: String,
           schema: StructType = DocumentsSchema): DataFrame = {
    // A caller re-reading a previously classified dump already carries the
    // corrupt column — adding it again would fail on the duplicate name.
    val withCorrupt =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add("_corrupt_record", StringType)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
  }
}
