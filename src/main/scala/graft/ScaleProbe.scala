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
    "m1_fsm_count", "m1_fsm_count_prepared", "m1_fsm_count_durable", "m1_fsm_funnel",
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
    "d_cdc_dup",
    // r10: verified Hamming join (chunk-bucket exchange + in-bucket pair
    // expansion; replica text clusters stress the hot-cap path at mult×).
    // Probed via the SUBSET override (maxHotDropFrac=1.0, see
    // probeOverrides): at mult× the armed registered query correctly
    // REFUSES (8-bit chunks saturate), which is the guard working — but
    // the probe still wants the capped path's scaling ratio, so it times
    // the documented opt-out shape instead of recording a bare error.
    "d_simhash_hamming",
    // r10: corpus-stats quality score (ONE windowed count over hashed
    // bigram keys — 75M rows at 30×) and the composed curation pipeline
    "c_bigram_support", "c_pipeline_e2e",
    // r13: sequence packing — the two-level cumsum's totals pass + packing
    // pass should scale linearly; a drifting ratio would indict the
    // checkpoint or the per-partition offset plumbing
    "c_pack_sequences",
    // r13: LM likelihood scoring (two explode passes + one bgh-equi-join;
    // the LM side grows with the corpus, so a drifting ratio would indict
    // the join strategy at scale) and shard assignment (two-level rank —
    // same invariant as c_pack_sequences, keyed per shard)
    "c_lm_score", "c_shard_assign",
    // r13: SemDeDup — probed with nCells scaled by mult at the scaled arm
    // (see probeOverrides): the operator's contract is "nCells scales with
    // N", which keeps per-cell pair work ~flat; probing at FIXED nCells
    // would only re-measure the designed-quadratic in-cell scan
    "d_semdedup",
    // r13: the two-corpus incremental dedup — LSH semi-join against the
    // existing side's non-hot bucket directory, same family as
    // d_minhash_lsh (10×/30× lines in the r13 artifacts: 1.54 / 2.12)
    "d_incremental_dedup",
    // r14: substring-level exact dedup — one explode (a row per token),
    // one fingerprint aggregation, one semi-join, a per-doc window over
    // the duplicated minority; every stage is linear in tokens, so the
    // ratio should track the data multiple
    "d_substr_dup",
    // r14: subword counting — map-only trie scan, the ratio should track
    // the data multiple exactly; drift would indict per-task trie
    // recompilation (the kernel caches per JVM)
    "c_token_count_bpe",
    // r14 continued: substring decontamination (the directory semi-join
    // shape against the test split) and the composed decon→BPE→pack
    // chain — the chain's ratio is the sum of its parts' postures, so a
    // drift here localizes to whichever stage regressed
    "c_substr_decon", "c_pipeline_llm",
    // r14 continued: shard materialization (a row per token through one
    // seq_id-keyed shuffle) and the map-only linear quality scorer
    "c_pack_tokens", "c_quality_linear",
    // r15: BPE vocab training — 20 iterations of (pair-type aggregation +
    // argmax); corpus growth raises pair COUNTS, pair-type cardinality
    // grows only with vocabulary (Heaps), so the ratio should be well
    // below the data multiple
    "c_bpe_train",
    // r15: joint image-caption pair dedup (ahash join + composed-key
    // window at N×bands membership rows — linear)
    "mm_pair_dedup",
    // r15: the image-side Hamming join, probed UNGUARDED so the artifact
    // records either the capped path's scaling or the guard's refusal
    // verdict (mm image clusters grow with the data multiple — at 100×
    // the pair-mass guard is EXPECTED to refuse; that error entry is the
    // measured outcome, not a failure of the probe)
    "mm_phash_hamming",
    // r15: the shard WRITE path (override below): packTokens +
    // shardAssign composed into real one-file-per-shard parquet writes
    "c_shard_write",
    // r15 late additions: the rules filter + dataset card (map-only /
    // single global agg — ratios should track the data multiple), the
    // tf/df join + per-doc window, the dedup-recall evaluation face
    // (truth feeder quadratic across replicas BY DESIGN — prefixed
    // replicas share every non-prefix shingle, so bucket sizes grow
    // ×mult and pair mass ×mult²; probed via the maxPairMass opt-out
    // below, the mm_phash_hamming precedent), and the composed
    // train→apply tokenizer chain
    "c_quality_rules", "c_dataset_card", "c_tfidf_topk",
    "d_minhash_recall", "c_bpe_train_apply",
    // r15 late: the one-pass release funnel (canonical join + two gate
    // flags + conditional sums — should track d_minhash_lsh's posture)
    "c_curation_funnel",
    // r15 continuation: verified dedup (candidates bounded by the hot-
    // bucket policy, verification restricted to candidate docs — the
    // ratio should track d_minhash_lsh, NOT the exact feeder's
    // replica-quadratic), RAG chunking (map-only bounded explode),
    // DSIR weights + selection (gram explode into d buckets; the
    // broadcast weight join), per-source OOV stats (map-only tokenizer
    // + one agg), snapshot diff (id-keyed fingerprint join), and the
    // histogram-shaped quantiles (no per-source sort — the probe would
    // expose one as a superlinear ratio on the replicated corpus)
    "d_minhash_verified", "c_chunk_docs", "c_dsir_weights", "c_dsir_topq",
    "c_oov_stats", "c_corpus_diff", "t_length_quantiles",
    // r15 continuation: CCNet perplexity terciles — the lm_score chain
    // plus a score-domain-bounded histogram; its ratio should track
    // c_lm_score's
    "c_ppl_buckets",
    // r15 continuation: token-budget prefix — packSequences' two-level
    // cumsum on the hash key; same linear posture
    "c_token_budget",
    // r15 continuation 2: exact stratified split (shardAssign's two-level
    // rank keyed per source — driver traffic is partitions × sources, so
    // the ratio should track c_shard_assign), vocabulary drift (two
    // token-keyed aggs + vocab-sized merge + TakeOrdered top-k),
    // temperature quotas (one agg to a languages-sized frame), and the
    // threshold curve (the exact pair feeder again — replica-quadratic
    // BY DESIGN, same ≤10× opt-out / past-10× refusal as
    // d_minhash_recall via the override below)
    "c_split_stratified", "c_vocab_drift", "c_lang_balance",
    "d_dedup_thresholds",
    // the calibration report (two corpus aggs + a histogram-bounded
    // window + a one-row broadcast cross join) and the source-overlap
    // matrix (shingle-hash distinct + source-bounded member sets — the
    // ratio should track c_decontaminate's shingle-keyed posture)
    "c_quality_calibration", "c_source_overlap",
    // the materialized balanced corpus (quota agg + the two-level token
    // cumsum — c_token_budget's posture keyed per language) and shingle
    // novelty (two distinct hash frames + one hash-keyed join)
    "c_balanced_sample", "c_novelty_stats",
    // the composed release pipeline (split → md5 canonical → quotas →
    // admission): its ratio is the sum of d_minhash_lsh's and
    // c_balanced_sample's postures — a drift localizes to a stage
    "c_pipeline_release",
    // no-split greedy packing: one bucket-keyed exchange, O(1) streaming
    // state per bucket — should track the data multiple exactly
    "c_pack_greedy",
    // the per-benchmark contamination report — the decontaminate join
    // posture with a labels-bounded aggregation on top
    "c_decon_report",
    // crawl-stage URL dedup: one URL-keyed agg + join-back — the
    // exchange carries short addresses, never documents
    "d_url_dedup",
    // r16: line-level dedup (md5 line-key agg + join-back + per-doc
    // fold — the passage posture at line granularity; the clean face
    // adds the bounded per-doc reconstruction), integer BM25 (map-only
    // scan + one-row stats broadcast — should track the data multiple
    // exactly, like c_quality_rules), semantic decon (train-side map
    // against the broadcast test split: the test side grows with the
    // corpus here, so the probe's ratio carries the O(train×test)
    // product — watch it, the production eval set is FIXED-size), and
    // the packing report (c_pack_greedy's exchange + two bounded aggs)
    "d_line_dup", "d_line_clean", "t_bm25_topk", "c_embed_decon",
    "c_pack_stats",
    // r16: NB-ratio quality training (one gram explode into <= d buckets
    // + a d-row weight frame — the dsir_weights posture) and its
    // train→serve eval face (adds the broadcast scoring join)
    "c_quality_train", "c_quality_train_eval",
    // r16 continued: line-based layout rules (pure projection — should
    // track the data multiple like c_quality_rules) and the epochs table
    // (c_lang_balance's languages-sized aggregation posture)
    "t_line_rules", "c_source_epochs",
    // r16 continued: normalized exact dedup (d_exact_dup's fingerprint
    // window over normalized text + the fixture union) and the cluster
    // histogram (two bounded aggs over the minhash canonical)
    "d_exact_dup_norm", "d_cluster_stats",
    // r16 continued: markup strip — a pure regex projection; the ratio
    // should track the data multiple exactly
    "t_html_strip",
    // r17: mojibake repair + code layout rules (pure projections — the
    // t_html_strip posture) and the domain blocklist (bounded suffix
    // explode + broadcast list join + id-keyed fold — the exchange
    // carries hosts/rules, so the ratio should track d_url_dedup's)
    "t_mojibake_fix", "t_code_rules", "c_domain_block",
    // r17: WordPiece ids (pure native-expression projection — the BPE
    // faces' posture), exact heavy hitters (explode + one groupBy — the
    // t_vocab_topk posture), and the CMS face (exact audit side plus the
    // no-explode Aggregator sketch: its one-partial-per-partition
    // exchange should make the sketch side's cost track the SCAN, not
    // the token count)
    "c_tokenize_wordpiece", "t_heavy_hitters", "t_heavy_hitters_cms", "t_cms_merge",
    "t_vocab_hll", "c_pipeline_crawl", "t_cms_err", "d_url_canon", "t_script_stats", "c_unigram_train", "c_unigram_train_apply", "ann_hard_negatives", "c_pack_unigram", "c_unigram_heldout",
    // r17: PQ ANN and its exact integer-L2 truth face — both ride the
    // broadcast-heap shape (slim exchange bounded by partitions × Q × k);
    // PQ's encode pass is the corpus-linear step, ADC the per-candidate
    // O(m) lookup, so the ratio should sit with the quantized MIPS family
    "ann_quant_l2_topk", "ann_quant_pq_topk", "ann_quant_ivfpq_topk", "ann_pq_recall",
    "ann_ivfpq_recall",
    // r17: CLIP-style pair gate — image synthesis + pixel decode + one
    // id-equijoin + a typed map; should track mm_features' ratio (the
    // decode dominates, the join carries slim 64-dim rows)
    "mm_pair_filter",
    // r17: phrase mining — two explodes with partial-agg counts + two
    // vocabulary-sized string joins + top-k; the c_bigram_support family's
    // posture with strings kept only because they are the output
    "c_pmi_topk",
    // r17: unigram Viterbi ids — a pure native-expression projection like
    // the BPE/WordPiece faces, with an O(len·maxPiece) DP per word
    "c_tokenize_unigram",
    // r17 continuation: the quantile sketch — one typed-Aggregator scan
    // folding 7.7 KB partials per (partition, source); the ratio should
    // track the data multiple like the CMS face, and the posexplode side
    // is aggregate-sized (constant), so drift would indict the partial
    // path, not the readout
    "t_qsketch",
    // r17 continuation: PageRank over the host-link fixture — the scan +
    // residue projection + edge DEDUP grow with docs, but the distinct
    // graph saturates at the host universe (23 nodes — exactly how real
    // host graphs behave: |V| ≪ |docs|), so the 5 fixed-size iterations
    // are constant work and the ratio should sit well BELOW the data
    // multiple, pinning the "dedup before iterate" claim
    "g_pagerank",
    // r17 continuation 2: harmonic/HyperBall — the 9.6 s band is 16
    // rounds of fixed stage-setup overhead (codegen + scheduling on a
    // 23-node graph), so the probe ratio should sit near 1.0: a ratio
    // tracking the data multiple would instead indict the edge-dedup
    // scan feeding the rounds. The broadcast host-quality gate is
    // scan-bound and should track the multiple.
    "g_harmonic", "c_host_quality",
    // r17 continuation 2: the event-transition PageRank — the lag window
    // over user trails is the corpus-sized stage (the FSM partitioning);
    // the weighted iterations run on the saturated type-universe graph,
    // so the ratio should track the events multiple, not exceed it
    "g_event_pagerank",
    // r18 continuation: trail analytics. sessionize/cohort/attribution
    // all ride the one user_id exchange (the FSM trail layout), so their
    // ratios should track the events multiple; the as-of join is the
    // union-tag window — same posture (orders replicate with a stride
    // shared with users, so the cust↔user alignment holds per replica).
    // ta_session_overlap is replica-quadratic BY DESIGN: every replica
    // stacks into the same 30-day window, so per-interval purchase
    // density grows ×mult and matched pairs ×mult² (3.25M at sf0.1) —
    // in production the time span grows with the corpus instead. Probe
    // it at ≤10× only, the d_minhash_recall policy.
    // ta_funnel_cohort composes the FSM funnel (per-trail match — the
    // m1_fsm_funnel posture) with the first-touch cohort aggregation:
    // both sides ride the user_id exchange, so the ratio should track
    // the events multiple
    // ta_asof_enrich_static is the streaming kernel's batch face: the
    // dimension collapses to one sorted version array per key (orders-
    // scale, not events-scale), so the ratio should track the events
    // multiple like the union-tag face
    // ta_time_to_convert (two user-keyed aggs + user-scale join) and
    // ta_purchase_paths (the sessionize windows + one lag pass) both
    // ride the user_id exchange — ratios should track the events multiple
    "ta_sessionize", "ta_cohort_retention", "ta_attribution",
    "ta_asof_orders", "ta_asof_enrich_static", "ta_session_overlap",
    "ta_funnel_cohort", "ta_time_to_convert", "ta_purchase_paths",
    // r18 continuation: RFM — one user-keyed aggregation feeding three
    // rankGlobal passes over the users-sized frame; the two-level rank's
    // claim is precisely that this stays distributed (range partitions +
    // partition-local windows), so the ratio should track the events
    // multiple for the aggregation and the users multiple for the ranks
    "ta_rfm", "ta_rfm_segments",
    // r20 additions: the prepared ta faces (the amortized layout is warmed
    // like m1_fsm_count_prepared — the probe times the per-query cost the
    // shared prepare buys), the two further attribution models
    // (first-touch = the as-of kernel on the reversed axis, linear
    // multi-touch = the bucketed window join on the time axis — replicas
    // are distinct users, so its pair mass grows linearly, unlike the
    // cross-user overlap face), the streaming-kernel batch face with the
    // lookback, and the multi-snapshot cut (three scans + union + the
    // session windows — linear by shape)
    "ta_purchase_paths_prepared", "ta_time_to_convert_prepared",
    "ta_funnel_cohort_prepared", "ta_attribution_first",
    "ta_attribution_linear", "ta_attribution_streamed",
    "ta_sessionize_multidb")

  /** Probe-local query shapes where the registered query's fail-loud guard
    * would (correctly) refuse at mult× but the probe wants the guarded
    * path's timing anyway — each override is the registered query with the
    * documented opt-out applied, never a different algorithm.
    */
  private def probeOverrides(mult: Int, workDir: String):
      Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "d_simhash_hamming" -> ((s, dir) =>
      operators.SimHash
        .hammingPairs(
          operators.SimHash.simhashOfMd5(Tables(s, dir, "documents")),
          r = 3, bits = 32, maxHotDropFrac = 1.0)
        .orderBy("id_a", "id_b")),
    // the truth feeder's pair-mass guard correctly refuses at mult×
    // (replicas share every non-prefix shingle → mass ×mult²). At ≤10×
    // the probe lifts the cap to MEASURE the quadratic feeder (same
    // algorithm, documented opt-out); past 10× the registered guarded
    // face runs so the artifact records the refusal verdict itself —
    // mass ×mult² at 100× is hours of pair expansion, and fail-loud IS
    // the designed outcome (the mm_phash_hamming 100× precedent).
    "d_minhash_recall" -> ((s, dir) =>
      operators.MinHash.minhashRecall(Tables(s, dir, "documents"),
        maxPairMass = if (mult <= 10) Long.MaxValue else 100000000L)),
    // same truth feeder, same policy: measure the unguarded quadratic at
    // ≤10×, record the guard's refusal past it
    "d_dedup_thresholds" -> ((s, dir) =>
      operators.MinHash.dedupThresholdCurve(Tables(s, dir, "documents"),
        maxPairMass = if (mult <= 10) Long.MaxValue else 100000000L)),
    // replica-quadratic BY DESIGN (every replica stacks into the same
    // 30-day window → matched pairs ×mult²): the "probe at ≤10× only"
    // policy is enforced HERE in code, not by comment — at ≤10× the
    // registered face runs unchanged; past 10× the override refuses
    // loudly and the artifact records the refusal verdict (the
    // d_minhash_recall guarded-face pattern; the registered query has no
    // pair-mass knob of its own to arm, so the refusal lives in the
    // override)
    "ta_session_overlap" -> ((s, dir) => {
      require(mult <= 10,
        s"ta_session_overlap is replica-quadratic under corpus replication " +
          s"(pairs x mult^2); probe policy caps it at 10x, got ${mult}x - " +
          "use the span-scaled probe (TaScaleProbe) for longitudinal growth")
      SparkEntry.queries("ta_session_overlap")(s, dir)
    }),
    // the registered query's fixed nCells=8 is an oracle-scale setting;
    // the contract at scale is nCells ∝ N, so the scaled arm runs 8·mult
    // cells — the ratio then witnesses the ~flat per-cell pair work the
    // design claims (fixed cells would witness only the in-cell O(s²))
    "d_semdedup" -> ((s, dir) =>
      operators.Similarity
        .semDedup(Tables(s, dir, "embeddings"), tNum = 7, tDen = 20,
          nCells = if (samePath(dir, workDir)) 8 * mult else 8)
        .orderBy("vec_id")),
    // IVF cells scale with √N (the published IVF sizing rule — e.g. FAISS
    // guidelines, nlist ≈ √N..4√N): UNLIKE semDedup, whose in-cell pair
    // work is quadratic and wants nCells ∝ N, ivfTopK's total cost is
    // assign O(N·C) + query O(Q·nProbe·N/C) + driver train
    // O(sample·C·iters), minimized at C ≈ √(corpus). Scaling cells ∝ mult
    // (the r13 verdict's first guess) was MEASURED WRONG this round: at
    // 10× it read 17.3 s (ratio 18.5) because assignment and driver
    // training both grow with C. √mult keeps per-cell size AND cell count
    // growing like √mult — the posture a production re-size would take.
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val cells =
        if (samePath(dir, workDir)) 16 * math.round(math.sqrt(mult)).toInt else 16
      operators.Similarity
        .ivfTopK(emb, queries, k = 5, nCells = cells, nProbe = 4)
        .orderBy("query_id")
    }),
    // the shard WRITE path is a side effect, not a frame to noop-write:
    // the override performs the REAL partitioned parquet write inside the
    // timed call (per-arm subdir so base and scaled never collide), then
    // returns a one-row summary for the harness's noop sink. 64 shards at
    // both arms — the per-shard file grows with the data multiple, the
    // write fan-out stays fixed, exactly a production shard count.
    "c_shard_write" -> ((s, dir) => {
      import org.apache.spark.sql.functions.lit
      val arm = if (samePath(dir, workDir)) "scaled" else "base"
      val out = s"$workDir/__shard_write_$arm"
      operators.Curation.writeTokenShards(
        Tables(s, dir, "documents"), out, nShards = 64)
      s.range(1).select(lit(out).as("out_dir"))
    }),
  )

  /** Scaled-arm detection must survive equivalent path spellings (trailing
    * slash, relative path, symlink prefix) — exact string equality would
    * silently run the scaled arm with base-scale knobs and invalidate the
    * ratio (ADVICE r13). `toRealPath` resolves symlinks when the path
    * exists (the work dir does by probe time); for a not-yet-created path
    * fall back to lexical normalization, which still covers the
    * trailing-slash and relative spellings.
    */
  private def samePath(a: String, b: String): Boolean = {
    def canon(p: String): java.nio.file.Path = {
      val abs = java.nio.file.Paths.get(p).toAbsolutePath.normalize
      try abs.toRealPath() catch { case _: java.io.IOException => abs }
    }
    canon(a) == canon(b)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_scaleprobe")
    // optional 4th arg: comma-separated probe-query subset — the 100× arm
    // runs the linear-shape core families only (the exact-pair kernels
    // are documented-quadratic and would compute 10,000× pairs there, a
    // by-design non-finding that costs hours). Validated loudly like
    // Verify's subset.
    val only: Option[Set[String]] =
      args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- probeQueries.toSet
      require(names.nonEmpty && unknown.isEmpty,
        s"unknown probe queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val qs = probeQueries.filter(q => only.forall(_.contains(q)))
    val overrides = probeOverrides(mult, work)
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
    // orders replicate alongside events with a SHARED user stride (the
    // max of the two key universes) so replica k's o_custkey range maps
    // onto replica k's user_id range and nothing bleeds across replicas —
    // the as-of probe needs the cust↔user alignment to hold per replica.
    val ord = Tables(spark, base, "orders")
    val nCust = ord.agg(max("o_custkey")).head.getLong(0) + 1
    val nOrder = ord.agg(max("o_orderkey")).head.getLong(0) + 1
    val stride = math.max(nUser, nCust)
    (0 until mult).map { k =>
      ev.withColumn("user_id", col("user_id") + lit(k * stride))
        .withColumn("event_id", col("event_id") + lit(k * nEvent))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    (0 until mult).map { k =>
      ord
        .withColumn("o_custkey", col("o_custkey") + lit(k * stride))
        .withColumn("o_orderkey", col("o_orderkey") + lit(k * nOrder))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/orders.parquet")

    // ---- timed runs (Bench's noop-write protocol) -----------------------
    // closureIters: per-query round count of the CC closures (the
    // d_embed_cc_stars superlinearity witness — a logarithmic bound must
    // show log-of-multiple growth in rounds, not multiple-of-rounds)
    val closureIters = scala.collection.mutable.LinkedHashMap[String, Int]()
    def timeAt(dir: String): (Map[String, Double], Map[String, String]) = {
      // warm the session/scan path at this dir so the first query isn't
      // charged footer reads + codegen
      try {
        Tables(spark, dir, "events").count()
        SparkEntry.queries("m1_fsm_count")(spark, dir).count()
        engine.TrckQueries.preparedTrailEvents(spark, dir)
        // the durable table write is the amortized one-time step — the
        // probe times the cold bucketed read, not the build
        engine.TrckQueries.durableTrailEvents(spark, dir).count()
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-probe] warmup failed at $dir: $e") }
      val times = scala.collection.mutable.LinkedHashMap[String, Double]()
      val errs = scala.collection.mutable.LinkedHashMap[String, String]()
      qs.foreach { name =>
        operators.Dedup.lastClosureIterations = -1
        val t0 = System.nanoTime()
        try {
          overrides.getOrElse(name, SparkEntry.queries(name))(spark, dir)
            .write.format("noop").mode("overwrite").save()
          times(name) = (System.nanoTime() - t0) / 1e9
          if (operators.Dedup.lastClosureIterations >= 0)
            closureIters(s"$dir:$name") = operators.Dedup.lastClosureIterations
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[scale-probe] $name failed at $dir: $e")
          // carry the MESSAGE, not just the class: a guard's refusal
          // verdict (pair-mass pre-flight, union-find gate) is a measured
          // outcome the artifact must record in its own words.
          // JSON-sanitized: printable ASCII, no quotes/backslashes.
          val msg = Option(e.getMessage).getOrElse("")
            .filter(c => c >= ' ' && c < 127 && c != '"' && c != '\\').take(220)
          errs(name) = s"${e.getClass.getSimpleName}: $msg"
        }
      }
      (times.toMap, errs.toMap)
    }

    val (baseT, baseE) = timeAt(base)
    val (scaledT, scaledE) = timeAt(work)

    def rep(dir: String, name: String): Option[Double] =
      try {
        val t0 = System.nanoTime()
        overrides.getOrElse(name, SparkEntry.queries(name))(spark, dir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-probe] $name rep failed at $dir: $e"); None
      }
    def r2(v: Double) = math.round(v * 100) / 100.0
    def r3(v: Double) = math.round(v * 1000) / 1000.0

    // ---- arbitration 1: base arm vs the Bench clean bands ---------------
    // A contaminated BASE reading silently corrupts every ratio (r9:
    // d_passage_dup read 17.04@10× from one polluted shot, contradicted by
    // its own 30× arm). The base dir is the same sf0.1 corpus Bench bands
    // were recorded on, so the same suspect rule applies: first reading
    // above max(2×band, band+0.75) → 3 in-process reps, min wins, verdict
    // embedded. Base times used for ratios are the arbitrated minima.
    val bandsPath = sys.env.getOrElse("SPARK_GRAFT_BANDS", "bench_bands.json")
    val bands = Bench.loadBands(bandsPath)
    val bandMap =
      if (bands.exists { case (sf, _) => new java.io.File(base.stripSuffix("/")).getName == sf })
        bands.map(_._2).getOrElse(Map.empty[String, Double])
      else Map.empty[String, Double]
    val baseArb = scala.collection.mutable.LinkedHashMap[String, String]()
    val baseUsed = scala.collection.mutable.LinkedHashMap[String, Double]() ++ baseT
    baseT.foreach { case (name, first) =>
      bandMap.get(name).filter(b => first > Bench.threshold(b)).foreach { band =>
        System.err.println(f"[scale-probe] base $name: $first%.2f s vs band $band%.2f — 3 reps")
        val reps = (0 until 3).flatMap(_ => rep(base, name))
        val best = if (reps.nonEmpty) (first +: reps).min else first
        val verdict =
          if (reps.isEmpty) "reps_failed"
          else if (reps.min <= Bench.threshold(band)) "contaminated" else "regression"
        baseUsed(name) = best
        baseArb(name) =
          s"""{"first":${r3(first)},"band":${r3(band)},"reps":[${reps.map(r3).mkString(",")}],"min":${r3(best)},"verdict":"$verdict"}"""
      }
    }

    // ---- arbitration 2: scaled arm vs the run's own ratio census --------
    // No pre-recorded bands exist for a synthetic mult× corpus, but the run
    // carries its own expectation: most probe queries are linear-shape and
    // land in a tight ratio cluster (0.5–3.5 at 10–30× on 32 cores), so the
    // MEDIAN ratio is a robust in-run baseline. Any first reading whose
    // ratio exceeds max(3×median, 2.0) — with a 1 s absolute floor so
    // sub-second jitter never triggers — gets 3 in-process reps and a
    // verdict: min back inside ⇒ "noise" (environment), still outside ⇒
    // "persistent_superlinear" ("quadratic_by_design" for the two exact
    // O(N²) oracle twins, whose super-linear ratio is the documented
    // contract, not a finding). Headline ratios use the arbitrated minima.
    val quadByDesign = Set("d_embed_cc", "d_embed_cc_stars")
    val firstRatios = qs.flatMap { q =>
      for (b <- baseUsed.get(q); s <- scaledT.get(q) if b > 0) yield q -> s / b
    }.toMap
    val medianRatio = {
      val rs = firstRatios.values.toSeq.sorted
      if (rs.isEmpty) 1.0
      else if (rs.size % 2 == 1) rs(rs.size / 2)
      else (rs(rs.size / 2 - 1) + rs(rs.size / 2)) / 2
    }
    val ratioThreshold = math.max(3 * medianRatio, 2.0)
    val scaledArb = scala.collection.mutable.LinkedHashMap[String, String]()
    val scaledUsed = scala.collection.mutable.LinkedHashMap[String, Double]() ++ scaledT
    firstRatios.toSeq.sortBy(-_._2).foreach { case (name, fr) =>
      val first = scaledT(name)
      if (fr > ratioThreshold && first > 1.0) {
        System.err.println(
          f"[scale-probe] scaled $name: ratio $fr%.2f vs threshold $ratioThreshold%.2f — 3 reps")
        val reps = (0 until 3).flatMap(_ => rep(work, name))
        val best = if (reps.nonEmpty) (first +: reps).min else first
        val minRatio = best / baseUsed(name)
        val verdict =
          if (reps.isEmpty) "reps_failed"
          else if (minRatio <= ratioThreshold) "noise"
          else if (quadByDesign(name)) "quadratic_by_design"
          else "persistent_superlinear"
        scaledUsed(name) = best
        scaledArb(name) =
          s"""{"first":${r3(first)},"first_ratio":${r2(fr)},"reps":[${reps.map(r3).mkString(",")}],""" +
            s""""min":${r3(best)},"min_ratio":${r2(minRatio)},"verdict":"$verdict"}"""
      }
    }

    // ---- persisted-layout storage witness -------------------------------
    // If the prepared trail layout no longer fits executor storage at mult×,
    // m1_fsm_count_prepared pays recompute/disk-read per query — a genuine
    // scale finding, not noise. Report what the block manager actually holds
    // so a persistent super-linear prepared ratio is explainable from the
    // artifact alone.
    val preparedStorage = spark.sparkContext.getRDDStorageInfo.toSeq
      .sortBy(-_.memSize).headOption.map { i =>
        // an InMemoryRelation's RDD name is a multi-line plan string —
        // JSON-sanitize: printable ASCII only, quotes dropped, truncated
        val nm = i.name.filter(c => c >= ' ' && c < 127 && c != '"' && c != '\\').take(80)
        s""""prepared_storage":{"name":"$nm","cached_partitions":${i.numCachedPartitions},""" +
          s""""total_partitions":${i.numPartitions},"mem_mb":${i.memSize / (1 << 20)},"disk_mb":${i.diskSize / (1 << 20)}}"""
      }.getOrElse(""""prepared_storage":null""")

    // ---- adversarial-cardinality foreach arm ----------------------------
    val foreachProbe: String = ForeachProbe.json(spark, base)
    def js(m: collection.Map[String, Double]) =
      qs.flatMap(q => m.get(q).map(v => s""""$q":${r3(v)}"""))
        .mkString("{", ",", "}")
    // headline ratios from the arbitrated minima; the raw single-shot pair
    // is still in "base"/"scaled" and every re-measured reading is under
    // the arbitration blocks, so the artifact carries its own audit trail
    val ratios = qs.flatMap { q =>
      for (b <- baseUsed.get(q); s <- scaledUsed.get(q) if b > 0)
        yield s""""$q":${r2(s / b)}"""
    }.mkString("{", ",", "}")
    val errs = (baseE.map { case (k, v) => s""""base:$k":"$v"""" } ++
      scaledE.map { case (k, v) => s""""scaled:$k":"$v"""" }).mkString("{", ",", "}")
    // commit stamp: probe numbers quoted in SURVEY must be attributable
    // to the code state that produced them
    val commit =
      try scala.sys.process.Process(Seq("git", "describe", "--always", "--dirty")).!!.trim
      catch { case scala.util.control.NonFatal(_) => "unknown" }
    val closureJson = closureIters
      .map { case (k, v) => s""""${k.replace(base, "base").replace(work, "scaled")}":$v""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale_probe","commit":"$commit","mult":$mult,"base_dir":"$base","base":${js(baseUsed)},"scaled":${js(scaledUsed)},"ratio":$ratios,""" +
        s""""base_first":${js(baseT)},"scaled_first":${js(scaledT)},""" +
        s""""closure_iterations":$closureJson,""" +
        s""""median_ratio":${r2(medianRatio)},"ratio_threshold":${r2(ratioThreshold)},""" +
        s""""base_arbitrated":${baseArb.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")},""" +
        s""""scaled_arbitrated":${scaledArb.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")},""" +
        s"""$preparedStorage,$foreachProbe,"errors":$errs}"""
    // file first (Bench's lesson): a truncated stdout capture must not
    // lose the artifact
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "probe_out.json")
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(json) finally w.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-probe] could not write $outPath: $e")
    }
    println(json)
    spark.stop()
  }
}

/** Adversarial-cardinality foreach probe, standalone-runnable (also
  * embedded in every [[ScaleProbe]] artifact): 10k foreach tuples over the
  * base corpus. The reference bounds match calls per trail at ~N+1 for N
  * distinct foreach values PRESENT in the trail
  * (src/match_traildb.c:596-608); TrailMatcher's early-break +
  * distinct-value memo must reproduce that bound — calls must NOT scale
  * with |@arr|, and after the shared-initial-state/aliased-group work the
  * WALL ratio big/small is the per-tuple bookkeeping residual (emit rows +
  * state-array fill), targeted ≤ 2.5×. matchCalls is a JVM-wide adder,
  * valid under local[*] only (which is how this probe runs).
  *
  * Usage: runMain graft.ForeachProbe [baseDir]
  */
object ForeachProbe {
  def json(spark: org.apache.spark.sql.SparkSession, base: String): String = try {
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

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).appName("foreach-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the scan + FSM path so the small arm isn't charged startup
    try {
      Tables(spark, base, "events").count()
      SparkEntry.queries("g1_fsm_foreach")(spark, base).count()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[foreach-probe] warmup failed: $e") }
    println("{" + json(spark, base) + "}")
    spark.stop()
  }
}
