package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, MinHash}

/** One-off cost-split probe for the heaviest curation query
  * (c_repetition): times each component of Curation.repetitionSignals in
  * isolation with Bench's noop-write protocol, so plan decisions (per-row
  * array_distinct vs exploded two-level agg for the gram metrics) rest on a
  * measurement instead of the r4/r5 bench variance.
  *
  * Usage: runMain graft.ProfileRepetition [sfDir] — prints one JSON line.
  */
object ProfileRepetition {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("profile-repetition").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir, "documents").filter(col("text").isNotNull)
    docs.count() // warm scan + codegen

    def time(name: String, df: org.apache.spark.sql.DataFrame): (String, Double) = {
      df.write.format("noop").mode("overwrite").save() // warm pass
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (name, (System.nanoTime() - t0) / 1e9)
    }

    val words = split(trim(col("text")), "\\s+")
    val grams = MinHash.shingles(col("text"), 3)
    val results = Seq(
      // cumulative per-row slices
      time("scan_only", docs.select(col("doc_id"))),
      time("split_words", docs.select(col("doc_id"), size(words).as("n"))),
      time("words_distinct", docs.select(col("doc_id"),
        size(array_distinct(words)).as("n"))),
      time("build_grams", docs.select(col("doc_id"), size(grams).as("n"))),
      time("grams_distinct", docs.select(col("doc_id"),
        size(array_distinct(grams)).as("n"))),
      time("base_all4", docs.select(col("doc_id") +: Curation.repetitionBaseCols("text"): _*)),
      // the shuffle side: explode → (doc, word) → max two-level agg
      time("top_word_agg", docs.select(col("doc_id"), explode(words).as("__w"))
        .groupBy("doc_id", "__w").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id").agg(max("__c").as("top_word_n"))),
      // alternative formulation of n_distinct_grams via explode (what the
      // verdict suggested IF array_distinct dominated)
      time("grams_distinct_via_explode", docs
        .select(col("doc_id"), explode(grams).as("__g"))
        .groupBy("doc_id").agg(countDistinct("__g").as("n"))),
      time("full_query", Curation.repetitionSignals(docs)),
    )
    println(results.map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
      .mkString("""{"metric":"profile_repetition","sf":"""" + dir + "\",", ",", "}"))
    spark.stop()
  }
}
