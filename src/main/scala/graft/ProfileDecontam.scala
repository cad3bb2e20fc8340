package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, MinHash, TextAnalysis}

/** Scratch profiler: where does c_decontaminate's wall go, and does an
  * xxhash64 shingle key beat the md5-60 one? Deleted after measurement.
  */
object ProfileDecontam {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").appName("profile-decontam").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir, "documents")

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val withSplit = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.splitName(col("doc_id")).as("__split"), col("text"))

    def shingleMd5(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(array_distinct(MinHash.shingles(col("text"), 5))).as("__sh"))
        .select(col("doc_id"), MinHash.md5Hash60(col("__sh")).as("__h"))
    def shingleXx(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(array_distinct(MinHash.shingles(col("text"), 5))).as("__sh"))
        .select(col("doc_id"), xxhash64(col("__sh")).as("__h"))
    def shingleRaw(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(array_distinct(MinHash.shingles(col("text"), 5))).as("__h"))

    time("full_current")(Curation.decontaminate(docs, 5).orderBy("doc_id"))
    time("train_hashes_md5")(shingleMd5(withSplit.filter(col("__split") === "train")))
    time("train_hashes_xx")(shingleXx(withSplit.filter(col("__split") === "train")))
    time("train_shingles_only")(shingleRaw(withSplit.filter(col("__split") === "train")))

    def full(h: DataFrame => DataFrame): DataFrame = {
      val trainH = h(withSplit.filter(col("__split") === "train"))
      val testH = h(withSplit.filter(col("__split") === "test")).select("__h").distinct()
      trainH.join(testH, Seq("__h"), "left_semi").groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared")).orderBy("doc_id")
    }
    def shingleNative(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        explode(array_distinct(graft.functions.ShingleHash64(col("text"), 5))).as("__h"))

    time("full_xx")(full(shingleXx))
    time("full_raw_string_join")(full(shingleRaw))
    time("train_hashes_native")(shingleNative(withSplit.filter(col("__split") === "train")))
    time("full_native")(full(shingleNative))

    // sanity: xx variant produces identical (doc_id, n_shared) rows
    val a = Curation.decontaminate(docs, 5).orderBy("doc_id").collect()
    val b = full(shingleXx).collect()
    println(s"[profile] equal_md5_vs_xx=${a.sameElements(b)} rows=${a.length}")
    spark.stop()
  }
}
