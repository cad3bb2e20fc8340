package graft

import org.apache.spark.sql.functions._

/** Scale-probe harness: replicates the sf0.1 corpus `mult`× with
  * deterministic per-replica perturbations (prefixed text, rotated
  * embeddings, offset ids — statistically similar, no artificial exact
  * duplicates beyond the corpus's own), then times the heaviest registered
  * queries at both scales and reports the scaled/base ratio per query.
  * A query whose plan survives 100× data growth should scale ~linearly in
  * rows (quadratic for the intentionally-exact pair kernels); a
  * super-linear ratio on a linear-shape query is the regression signal.
  *
  * Usage: runMain graft.ScaleProbe [baseDir] [mult] [workDir]
  * Prints one JSON line: {"metric":"scale_probe","mult":N,
  * "base":{q:sec},"scaled":{q:sec},"ratio":{q:x},"errors":{...}}
  */
object ScaleProbe {

  private val probeQueries = Seq(
    "m1_fsm_count", "m1_fsm_count_prepared", "m1_fsm_funnel",
    "d_exact_dup", "d_minhash_lsh", "d_ngram_jaccard", "d_simhash",
    // both CC formulations: min-label (diameter-bound) AND the
    // large/small-star scale path, so the documented "use stars at scale"
    // claim carries a measured ratio
    "ann_ivf_topk", "d_embed_cc", "d_embed_cc_stars",
    // r9: the registered production CC shape — LSH candidate edges + stars
    // closure; its ratio should sit well under min-label-over-exact-pairs'
    "d_embed_cc_lsh",
    // the heaviest curation queries: their r4→r5 bench swings (c_repetition
    // 14.2→3.9 s with no code change) showed we had no measured cost model
    // for them — probe them at 10×/30× like everything else
    "c_repetition", "c_decontaminate", "c_decontaminate_bloom", "c_pii_scan",
    // r8 additions: passage-level dedup (explode-heavy) + mixing filter
    "d_passage_dup", "c_source_sample",
    // r9: content-defined chunking (typed sequential kernel per doc)
    "d_cdc_dup")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- scaled corpus --------------------------------------------------
    val docs = Tables(spark, base, "documents")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until mult).map { k =>
      docs
        .withColumn("doc_id", col("doc_id") + lit(k * nDocs))
        .withColumn("text",
          if (k == 0) col("text") else concat(lit(s"rep$k "), col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")

    val emb = Tables(spark, base, "embeddings")
    val nVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    (0 until mult).map { k =>
      val r = k % dim
      val rot =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r), slice(col("embedding"), 1, r))
      emb
        .withColumn("vec_id", col("vec_id") + lit(k * nVec))
        .withColumn("embedding", rot)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    val ev = Tables(spark, base, "events")
    val nUser = ev.agg(max("user_id")).head.getLong(0) + 1
    val nEvent = ev.agg(max("event_id")).head.getLong(0) + 1
    (0 until mult).map { k =>
      ev.withColumn("user_id", col("user_id") + lit(k * nUser))
        .withColumn("event_id", col("event_id") + lit(k * nEvent))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/events.parquet")

    // ---- timed runs (Bench's noop-write protocol) -----------------------
    def timeAt(dir: String): (Map[String, Double], Map[String, String]) = {
      // warm the session/scan path at this dir so the first query isn't
      // charged footer reads + codegen
      try {
        Tables(spark, dir, "events").count()
        SparkEntry.queries("m1_fsm_count")(spark, dir).count()
        engine.TrckQueries.preparedTrailEvents(spark, dir)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-probe] warmup failed at $dir: $e") }
      val times = scala.collection.mutable.LinkedHashMap[String, Double]()
      val errs = scala.collection.mutable.LinkedHashMap[String, String]()
      probeQueries.foreach { name =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
          times(name) = (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[scale-probe] $name failed at $dir: $e")
          errs(name) = e.getClass.getSimpleName
        }
      }
      (times.toMap, errs.toMap)
    }

    val (baseT, baseE) = timeAt(base)
    val (scaledT, scaledE) = timeAt(work)

    // ---- adversarial-cardinality foreach arm ----------------------------
    // 10k foreach tuples over the base corpus: the reference bounds match
    // calls per trail at ~N+1 for N distinct foreach values PRESENT in the
    // trail (src/match_traildb.c:596-608); TrailMatcher's early-break +
    // distinct-value memo must reproduce that bound — calls and wall time
    // must NOT scale with |@arr|. matchCalls is a JVM-wide adder, valid
    // under local[*] only (which is how this probe runs).
    val foreachProbe: String = try {
      import graft.trck.LocalRunner.ForeachTuple
      val prog = graft.trck.Compiled.compile(engine.TrckQueries.foreachProgram)
      val nTrails = Tables.events(spark, base).select("user_id").distinct().count()
      def run(nAbsent: Int): (Double, Double) = {
        val tuples = (Vector("click", "purchase", "signup") ++
          (0 until nAbsent).map(i => s"absent$i"))
          .map(v => ForeachTuple(Vector(Left(v))))
        graft.trck.TrailMatcher.matchCalls.reset()
        val t0 = System.nanoTime()
        engine.TrailEngine.emits(
          prog, engine.TrckQueries.trailEvents(spark, base), "uuid", "ts_sec",
          Seq("event_id"), foreachTuples = Some(tuples))
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, graft.trck.TrailMatcher.matchCalls.sum().toDouble / math.max(nTrails, 1L))
      }
      val (tSmall, cSmall) = run(13)    // 16 tuples
      val (tBig, cBig) = run(9997)      // 10_000 tuples
      def r2(v: Double) = math.round(v * 100) / 100.0
      s""""foreach_probe":{"trails":$nTrails,"small_tuples":16,"small_sec":${r2(tSmall)},""" +
        s""""small_calls_per_trail":${r2(cSmall)},"big_tuples":10000,"big_sec":${r2(tBig)},""" +
        s""""big_calls_per_trail":${r2(cBig)}}"""
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-probe] foreach arm failed: $e")
        s""""foreach_probe":{"error":"${e.getClass.getSimpleName}"}"""
    }
    def js(m: Map[String, Double]) =
      probeQueries.flatMap(q => m.get(q).map(v => s""""$q":${math.round(v * 1000) / 1000.0}"""))
        .mkString("{", ",", "}")
    val ratios = probeQueries.flatMap { q =>
      for (b <- baseT.get(q); s <- scaledT.get(q) if b > 0)
        yield s""""$q":${math.round(s / b * 100) / 100.0}"""
    }.mkString("{", ",", "}")
    val errs = (baseE.map { case (k, v) => s""""base:$k":"$v"""" } ++
      scaledE.map { case (k, v) => s""""scaled:$k":"$v"""" }).mkString("{", ",", "}")
    // commit stamp: probe numbers quoted in SURVEY must be attributable
    // to the code state that produced them
    val commit =
      try scala.sys.process.Process(Seq("git", "describe", "--always", "--dirty")).!!.trim
      catch { case scala.util.control.NonFatal(_) => "unknown" }
    println(
      s"""{"metric":"scale_probe","commit":"$commit","mult":$mult,"base_dir":"$base","base":${js(baseT)},"scaled":${js(scaledT)},"ratio":$ratios,$foreachProbe,"errors":$errs}""")
    spark.stop()
  }
}
