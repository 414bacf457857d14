package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve probe (VERDICT r03 next-#6, adapted: the driver provides
  * no sf1 testdata and /root/testdata is read-only, so the probe
  * manufactures a K× replica of sf0.1 under target/ and measures each
  * headline query family at 1× vs K× to estimate its scaling exponent).
  *
  * Replication is PERTURBED so the workload stays representative instead
  * of degenerate:
  *  - documents: every word of a copy is prefixed with the copy tag, so a
  *    copy shares NO shingles with its original — near-dup density stays
  *    the per-copy rate instead of every doc gaining K-1 twins (which
  *    would blow the pair graph up quadratically and measure a different
  *    problem);
  *  - embeddings: each copy gets a fresh deterministic pseudo-random
  *    vector (xxhash64-derived), preserving the near-uniform geometry the
  *    real table has;
  *  - lineitem/orders/customer: keys offset by copy × (max key + 1) so
  *    join fan-outs stay 1:1 and group counts scale linearly;
  *  - events: user_id offset per copy (window/session partitions scale in
  *    count, not in per-key depth), event_id offset to stay unique.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [workDir] [K]
  * Prints one JSON line: {"metric":"scale_probe","k":K,
  * "queries":{name:{"t1":sec,"tk":sec,"ratio":r}},...}. Perfect linear
  * scaling on a fixed-size cluster ⇒ ratio ≈ K; ratio ≫ K flags a
  * super-linear operator (the thing this probe exists to catch).
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("target/scaleprobe")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // generate-only mode (r12): materialize the K× replica as a standalone
    // SF tier (e.g. target/testdata/sf1 = 10× sf0.1) for a full
    // Verify/oracle/Bench pass, and exit without probing.
    if (args.contains("--generate-only")) {
      generate(spark, sfDir, workDir, k)
      println(s"""{"metric":"scale_generate","k":$k,"base":"$sfDir","out":"$workDir"}""")
      spark.stop()
      return
    }

    val kxDir = s"$workDir/sfx$k"
    generate(spark, sfDir, kxDir, k)

    // 1× pass reads a re-write of the base tables from the same storage
    // (so parquet encoding/layout is identical between the two passes).
    val x1Dir = s"$workDir/sfx1"
    generate(spark, sfDir, x1Dir, 1)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    import graft.operators.{Curation, Dedup, Sampling, Similarity, TextOps, Relational, Pipeline}
    val families: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q07_agg_tpch_q1" -> Relational.q07AggTpchQ1 _,
      "q03_join_broadcast" -> Relational.q03JoinBroadcast _,
      "q04_join_shuffle" -> Relational.q04JoinShuffle _,
      "q13_window_running" -> Relational.q13WindowRunning _,
      "q26_session_window" -> Relational.q26SessionWindow _,
      "ngram_jaccard" -> Dedup.qNgramJaccard _,
      "minhash_lsh" -> Dedup.qMinHashLsh _,
      "dedup_exact" -> Dedup.qDedupExact _,
      "embedding_dedup" -> Similarity.qEmbeddingDedup _,
      // probe the single-level auto-K path directly (the registered entry
      // now delegates to two-level; the probe keeps measuring the N·K leg)
      "embedding_dedup_blocked" -> ((s: SparkSession, dir: String) =>
        Similarity.qEmbeddingDedupSingleLevel(s, dir, cells = -1)),
      "embedding_dedup_2level" -> Similarity.qEmbeddingDedupTwoLevel _,
      "ann_brute" -> Similarity.qAnnBrute _,
      "q31_tfidf" -> TextOps.qTfIdf _,
      "training_mix" -> Pipeline.qTrainingMix _,
      "repetition_signals" -> Curation.qRepetitionSignals _,
      "contamination" -> Curation.qContamination _,
      "segment_dedup" -> Curation.qSegmentDedup _,
      "pii_scrub" -> Curation.qPiiScrub _,
      "unigram_surprisal" -> Curation.qUnigramSurprisal _,
      "bigram_surprisal" -> Curation.qBigramSurprisal _,
      "bigram_surprisal_scale" -> Curation.qBigramSurprisalScale _,
      "corpus_curate" -> Pipeline.qCorpusCurate _,
      "corpus_curate_scale" -> Pipeline.qCorpusCurateScale _,
      "sequence_pack" -> Curation.qSequencePack _,
      "domain_mix" -> Pipeline.qDomainMix _,
      "q44_minmax_by" -> Relational.q44MinMaxBy _,
      "q47_interval_join" -> Relational.q47IntervalJoin _,
      "q48_range_frame" -> Relational.q48RangeFrame _,
      "q49_resample_ffill" -> Relational.q49ResampleFfill _,
      "scd2_snapshot" -> Relational.qScd2Snapshot _,
      "heavy_hitters" -> TextOps.qHeavyHitters _,
      "q50_lateral" -> Relational.q50Lateral _,
      "q51_topk_agg" -> Relational.q51TopKAgg _,
      "q52_variant" -> Relational.q52Variant _,
      "doc_chunk" -> TextOps.qDocChunk _,
      "dedup_incremental" -> Dedup.qDedupIncremental _,
      "minhash_lsh_md5" -> Dedup.qMinHashLshMd5 _,
      "minhash_incremental" -> Dedup.qMinHashIncremental _,
      "ann_pq" -> Similarity.qAnnPq _,
      "ann_ivfpq" -> Similarity.qAnnIvfPq _,
      "simhash_md5" -> Dedup.qSimHashMd5 _,
      "simhash_pairs_md5" -> Dedup.qSimHashPairsMd5 _,
      "winnow_md5" -> TextOps.qWinnowFingerprintMd5 _,
      // r11 frozen-artifact registered forms (entry cost includes the
      // artifact write+read the hash gate runs through)
      "simhash" -> Dedup.qSimHash _,
      "simhash_pairs" -> Dedup.qSimHashPairs _,
      "winnow_fingerprint" -> TextOps.qWinnowFingerprint _,
      "media_resize" -> graft.operators.Multimodal.qMediaResize _,
      "media_report" -> graft.operators.Multimodal.qMediaReport _,
      "canonical_select" -> Dedup.qCanonicalSelect _,
      "q53_funnel" -> Relational.qFunnel _,
      "q54_retention" -> Relational.q54Retention _,
      "html_extract" -> TextOps.qHtmlExtract _,
      "classifier_score" -> Curation.qClassifierScore _,
      "embedding_centroids" -> Similarity.qEmbeddingCentroids _,
      "hash_split" -> Sampling.qHashSplit _,
      "stratified_sample" -> Sampling.qStratifiedSample _,
      "global_shuffle" -> Sampling.qGlobalShuffle _,
      "vocab_build" -> TextOps.qVocabBuild _,
      "vocab_coverage" -> TextOps.qVocabCoverage _,
      "bpe_merges" -> TextOps.qBpeMerges _,
      "bpe_tokenize" -> TextOps.qBpeTokenize _,
      "media_features" -> ((s: SparkSession, dir: String) =>
        graft.operators.Multimodal.extractFeatures(
          graft.operators.Multimodal.mediaFromDocuments(s, dir)).toDF()),
      "prefix_jaccard" -> Dedup.qPrefixJaccard _,
      "domain_cap" -> Sampling.qDomainCap _,
      "weighted_sample" -> Sampling.qWeightedSample _,
      "reservoir_sample" -> Sampling.qReservoirSample _,
      "boilerplate_strip" -> Curation.qBoilerplateStrip _,
      "robust_outliers" -> Curation.qRobustOutliers _,
      "zorder_key" -> graft.operators.Layout.qZorderKey _,
      "embedding_quantize" -> Similarity.qEmbeddingQuantize _,
      "novelty_score" -> TextOps.qNoveltyScore _,
      "rtbf_purge" -> Curation.qRtbfPurge _,
      "corpus_diff" -> Relational.qCorpusDiff _,
      "dq_audit" -> graft.operators.Audit.qDqAudit _,
      "rollup_incremental" -> Relational.qRollupIncremental _,
      "bm25_search" -> TextOps.qBm25Search _,
      "bm25_incremental" -> TextOps.qBm25Incremental _,
      "heavy_hitters_exact" -> TextOps.qHeavyHittersExact _,
      "equidepth_hist" -> Relational.qEquidepthHist _,
      "q28_percentiles_scale" -> Relational.q28PercentilesScale _,
      "q55_sessionize" -> Relational.q55Sessionize _,
      "merge_apply" -> Relational.qMergeApply _,
      "pit_join" -> Relational.qPitJoin _,
      "ingest_anomaly" -> Relational.qIngestAnomaly _,
      "funnel_latency" -> Relational.qFunnelLatency _,
      "release_manifest" -> Pipeline.qReleaseManifest _,
      "pack_assemble" -> Curation.qPackAssemble _,
      "overlap_exact" -> graft.operators.Overlap.qOverlapExact _,
      "overlap_kmv" -> graft.operators.Overlap.qOverlapKmv _,
      "pmi_collocations" -> TextOps.qPmiCollocations _,
      "oov_rate" -> TextOps.qOovRate _,
      "hybrid_search" -> Similarity.qHybridSearch _,
      "triplet_mine" -> Similarity.qTripletMine _,
      "triplet_mine_scale" -> Similarity.qTripletMineScale _,
      "quality_calibrate" -> Curation.qQualityCalibrate _,
      "skipgram_cooc" -> TextOps.qSkipgramCooc _,
      "token_fertility" -> TextOps.qTokenFertility _,
      "kanon_release" -> Pipeline.qKanonRelease _,
      "epoch_plan" -> Pipeline.qEpochPlan _,
      "skew_report" -> graft.operators.Audit.qSkewReport _,
      "lsh_eval" -> Dedup.qLshEval _,
      "curation_funnel" -> Pipeline.qCurationFunnel _,
      "classifier_eval" -> Curation.qClassifierEval _,
      "split_leakage" -> Sampling.qSplitLeakage _,
      "cluster_split" -> Sampling.qClusterSplit _,
      "selectivity_estimate" -> Relational.qSelectivityEstimate _,
      "passage_search" -> TextOps.qPassageSearch _,
      "heldout_surprisal" -> Curation.qHeldoutSurprisal _,
      "embedding_drift" -> Similarity.qEmbeddingDrift _,
      "curate_incremental" -> Pipeline.qCurateIncremental _,
      "curation_state_report" -> Pipeline.qCurationStateReport _,
      "centroid_incremental" -> Similarity.qCentroidIncremental _,
      "dedup_agreement" -> Dedup.qDedupAgreement _)

    // optional 4th arg: comma-separated family filter, so a round can probe
    // just its new families without re-timing the whole catalogue
    val picked = args.lift(3)
      .map(_.split(',').toSet)
      .map(sel => families.filter(f => sel(f._1)))
      .getOrElse(families)

    val rows = picked.map { case (name, fn) =>
      // untimed warm-up at 1×: the first execution of a query shape pays
      // whole-stage-codegen compilation (~0.5-1.5 s), which dwarfs the data
      // work of fast families and inverts their ratio (measured: sub-second
      // ops "ran 2-3× faster" at 10× before this run was added)
      fn(spark, x1Dir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
      val t1 = time { fn(spark, x1Dir).queryExecution.toRdd.count() }
      spark.catalog.clearCache()
      val tk = time { fn(spark, kxDir).queryExecution.toRdd.count() }
      spark.catalog.clearCache()
      val ratio = if (t1 > 0) tk / t1 else -1.0
      System.err.println(f"[scale] $name%-22s 1x=$t1%7.2fs ${k}x=$tk%7.2fs ratio=$ratio%5.1f")
      name -> (t1, tk, ratio)
    }
    val qs = rows.map { case (n, (t1, tk, r)) =>
      f"""\"$n\":{\"t1\":$t1%.3f,\"tk\":$tk%.3f,\"ratio\":$r%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","k":$k,"base":"$sfDir","queries":$qs}""")
    spark.stop()
  }

  /** Writes perturbed K× replicas of the probe tables to `out`. */
  def generate(spark: SparkSession, sfDir: String, out: String, k: Int): Unit = {
    import graft.Tables
    import spark.implicits._
    val copies = spark.range(k).select(col("id").cast("int").as("c"))

    def replicated(df: DataFrame): DataFrame = df.crossJoin(copies)

    // documents: per-copy word prefix → zero cross-copy shingle overlap
    replicated(Tables.documents(spark, sfDir))
      .select(
        (col("doc_id") * k + col("c")).as("doc_id"),
        when(col("c") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\w+)"),
            concat(lit("c"), col("c"), lit("$1"))))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: fresh deterministic vector per copy (near-uniform, like
    // the source table); copy 0 keeps the original vectors
    replicated(Tables.embeddings(spark, sfDir))
      .select(
        (col("vec_id") * k + col("c")).as("vec_id"),
        when(col("c") === 0, col("embedding")).otherwise(
          expr("transform(sequence(0, size(embedding)-1), " +
            "i -> cast((pmod(xxhash64(vec_id, c, i), 2000) - 1000) / 1000.0 as float))"))
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val loff = Tables.lineitem(spark, sfDir).agg(max("l_orderkey")).as[Long].head() + 1
    replicated(Tables.lineitem(spark, sfDir))
      .withColumn("l_orderkey", col("l_orderkey") + col("c") * loff)
      .drop("c")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val coff = Tables.customer(spark, sfDir).agg(max("c_custkey")).as[Long].head() + 1
    replicated(Tables.orders(spark, sfDir))
      .withColumn("o_orderkey", col("o_orderkey") + col("c") * loff)
      .withColumn("o_custkey", col("o_custkey") + col("c") * coff)
      .drop("c")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    replicated(Tables.customer(spark, sfDir))
      .withColumn("c_custkey", col("c_custkey") + col("c") * coff)
      .drop("c")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // events: raw read (ts stays a nanos long on disk — rewrite verbatim)
    val eventsRaw = spark.read.parquet(s"$sfDir/events.parquet")
    val eoff = eventsRaw.agg(max("event_id")).as[Long].head() + 1
    val uoff = eventsRaw.agg(max("user_id")).as[Long].head() + 1
    replicated(eventsRaw)
      .withColumn("event_id", col("event_id") + col("c") * eoff)
      .withColumn("user_id", col("user_id") + col("c") * uoff)
      .drop("c")
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // small dims referenced by the join families: copy verbatim
    for (t <- Seq("nation", "region", "supplier", "part"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
  }
}
