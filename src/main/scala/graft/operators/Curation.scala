package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: repetition quality signals (the Gopher-style
  * "is this document degenerate" filters), benchmark-contamination
  * detection (n-gram overlap vs a held-out evaluation set), PII scrubbing
  * (regex redaction of emails / IPv4s / phone numbers), and cross-document
  * duplicated-segment removal (the RefinedWeb-style substring-granularity
  * dedup that exact/MinHash doc-level dedup cannot express).
  *
  * All four are DuckDB-oracle-checked end to end (see SparkEntry.oracleSql)
  * and built from codegen'd primitives: posexplode + window lead for
  * n-grams (never interpreted HOF lambdas on the hot path — the only HOF is
  * segment reassembly over ~tens of elements per document), hash-partition
  * shuffles keyed on doc_id / n-gram only.
  */
object Curation {

  // ---------------------------------------------------------------------
  // Repetition signals (Gopher-style quality filters)
  // ---------------------------------------------------------------------

  /** Per-document repetition signals: duplicate-word fraction and the
    * share of word bigrams taken by the single most frequent bigram — the
    * two cheapest "degenerate document" detectors (boilerplate, keyword
    * stuffing, generation loops). A document is flagged `repetitive` when
    * either signal crosses its threshold.
    *
    * Scale: one tokenize explode (the same shuffle shape the dedup cascade
    * already pays), one (doc_id, bigram) partial-agg count, one per-doc
    * max — all map-side combinable, nothing quadratic, no driver data.
    */
  val DupWordFracMax = 0.7
  val TopBigramFracMax = 0.1

  def qRepetitionSignals(s: SparkSession, d: String): DataFrame =
    repetitionSignals(documents(s, d))

  def repetitionSignals(docs: DataFrame): DataFrame =
    repetitionSignalsFrom(tokens(docs))

  def repetitionSignalsFrom(toks: DataFrame): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val base = toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_words"),
      countDistinct(col("w")).as("n_uniq"))
    val topBigram = toks
      .select(col("doc_id"), col("w"), lead(col("w"), 1).over(byPos).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy(col("doc_id"), concat_ws(" ", col("w"), col("w2")).as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_count"))
    base.join(topBigram, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_words"),
        round(lit(1.0) - col("n_uniq").cast("double") / col("n_words").cast("double"), 6)
          .as("dup_word_frac"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        round(coalesce(col("top_bigram_count"), lit(0L)).cast("double") /
          (col("n_words") - 1).cast("double"), 6).as("top_bigram_frac"))
      .withColumn("repetitive",
        col("dup_word_frac") > DupWordFracMax || col("top_bigram_frac") > TopBigramFracMax)
  }

  // ---------------------------------------------------------------------
  // Benchmark contamination (n-gram overlap vs a held-out set)
  // ---------------------------------------------------------------------

  /** Contamination check: for every corpus document, the fraction of its
    * distinct word 5-grams that also occur in the benchmark set (here: the
    * `src0` slice of `documents`, standing in for an eval suite). The
    * standard pre-training hygiene step — training documents overlapping
    * the benchmark above the threshold must be dropped or flagged.
    *
    * Scale: the benchmark n-gram set is small by construction (eval suites
    * are MBs, corpora are TBs) so it BROADCASTS — the corpus side never
    * shuffles for the membership test (left-semi against the broadcast),
    * only the per-doc count agg moves doc_id-keyed rows. The n-gram window
    * is the winnow/shingle pattern: posexplode + lead, all codegen.
    */
  val ContamK = 5
  val BenchmarkSource = "src0"
  val ContamFracMin = 0.5

  def qContamination(s: SparkSession, d: String): DataFrame =
    contaminationFrom(documents(s, d))

  def contaminationFrom(docs: DataFrame): DataFrame =
    contaminationFromTokens(tokens(docs))

  /** The (doc_id, source, g) [[ContamK]]-gram table of a token frame — the
    * shared grain of the contamination check and the frozen benchmark-gram
    * artifact ([[CurationState]]). */
  def contamGrams(toks: DataFrame): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .select(col("doc_id"), col("source"),
        concat_ws(" ",
          col("w") +: (1 until ContamK).map(k => lead(col("w"), k).over(byPos)): _*).as("g"),
        lead(col("w"), ContamK - 1).over(byPos).as("wk"))
      .filter(col("wk").isNotNull)
      .select(col("doc_id"), col("source"), col("g"))
  }

  def contaminationFromTokens(toks: DataFrame): DataFrame = {
    val grams = contamGrams(toks)
    contaminationAgainst(
      grams.filter(col("source") === BenchmarkSource).select("g").distinct(),
      grams.filter(col("source") =!= BenchmarkSource).select("doc_id", "g"))
  }

  /** Contamination check against an explicit (distinct) benchmark-gram set
    * — the frozen-artifact form: `benchGrams` may be loaded from parquet
    * instead of recomputed from the corpus. `docGrams` is the (doc_id, g)
    * gram table of the documents under test. */
  def contaminationAgainst(benchGrams: DataFrame, docGramsRaw: DataFrame): DataFrame = {
    // ONE pass over the distinct gram table: a broadcast left join tags
    // each gram with a hit flag and a single doc-grain agg counts total
    // and contaminated together. (The previous two-branch form — total
    // agg + semi-join agg + doc_id re-join — recomputed the gram distinct
    // twice and was the dominant cost of the curate_incremental serve,
    // r10 profile.) benchGrams is distinct, so the left join cannot
    // fan out and row counts are preserved exactly.
    val docGrams = docGramsRaw.select("doc_id", "g").distinct()
    docGrams
      .join(broadcast(benchGrams.withColumn("bench_hit", lit(true))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("bench_hit"), 1L).otherwise(0L)).as("n_contaminated"))
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_contaminated"),
        round(col("n_contaminated").cast("double") /
          col("n_grams").cast("double"), 6).as("contamination_frac"))
      .withColumn("contaminated", col("contamination_frac") >= ContamFracMin)
  }

  // ---------------------------------------------------------------------
  // PII scrubbing (regex redaction)
  // ---------------------------------------------------------------------

  /** Regex patterns shared with the DuckDB oracle — deliberately RE2-safe
    * (character classes, bounded repetition, \b; no lookaround or
    * backreferences) so Java regex (Spark) and RE2 (DuckDB) agree glyph for
    * glyph. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re  = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\b\d{3}-\d{4}\b"""

  /** Count + redact emails, IPv4 addresses and phone-shaped numbers.
    * Replacement order matters and is fixed: emails first (their local
    * parts contain digits and dots that the IPv4 pattern could otherwise
    * chew on), then IPv4, then phones. Pure per-row codegen'd regex work —
    * zero shuffle, scales with input splits like the TextOps family. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Plain-string twin of [[scrub]] for unit tests — same patterns, same
    * engine (Spark's regexp_replace compiles java.util.regex too). */
  def scrubText(text: String): String =
    text.replaceAll(EmailRe, "<EMAIL>")
      .replaceAll(Ipv4Re, "<IP>")
      .replaceAll(PhoneRe, "<PHONE>")

  /** The synthetic corpus contains no PII glyphs at all (no digits, no @),
    * so redaction over the raw table would be an untestable no-op. The
    * query therefore INJECTS deterministic doc_id-derived PII (email + IP +
    * phone per document, built identically in the oracle SQL) and then
    * scrubs it — the oracle genuinely checks that every injected marker is
    * found, counted and replaced. CurationSpec covers the crafted edge
    * cases (multiple PII per doc, PII-free text, adjacency). */
  def qPiiScrub(s: SparkSession, d: String): DataFrame = {
    val injected = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com from 10."), (col("doc_id") % 200).cast("string"),
      lit(".0.1 call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    documents(s, d)
      .select(col("doc_id"), injected.as("raw"))
      .select(
        col("doc_id"),
        regexp_count(col("raw"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("raw"), lit(Ipv4Re)).as("n_ips"),
        regexp_count(col("raw"), lit(PhoneRe)).as("n_phones"),
        scrub(col("raw")).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")).cast("long"))
  }

  // ---------------------------------------------------------------------
  // Unigram surprisal (perplexity-proxy quality signal)
  // ---------------------------------------------------------------------

  /** Per-document mean unigram surprisal −E[ln p(w)] under the corpus's
    * own unigram distribution — the cheapest perplexity proxy (a real LM
    * needs external weights; the unigram model is the deterministic,
    * oracle-checkable core). Low surprisal ⇒ the document is made of
    * corpus-typical words (boilerplate); high ⇒ rare-word soup (OCR junk,
    * code in a prose corpus). The classic two-sided quality filter cut.
    *
    * Scale: one tokenize explode, one term-keyed count (map-side
    * combinable — the vocabulary table, ~millions of rows at 100 TB, is a
    * [[saltedCountJoin]] back onto tokens), the 1-row total broadcasts.
    * Scores are rounded before output so last-ulp ln/avg differences
    * across engines and partition orders cannot flip the hash.
    */
  def qUnigramSurprisal(s: SparkSession, d: String): DataFrame =
    unigramSurprisal(documents(s, d))

  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextOps.normWords(col("text"))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cw"))
    val total = toks.agg(count(lit(1)).as("t"))
    saltedCountJoin(toks, vocab, Seq("w"), col("doc_id"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cw").cast("double") / col("t").cast("double"))), 6)
          .as("avg_surprisal"))
  }

  /** Held-out LM scoring (heldout_surprisal) — the leak-free form of
    * [[unigramSurprisal]]: the unigram LM is trained on the TRAIN split
    * only (the [[Sampling.qHashSplit]] assignment) and scores the VALID
    * split, with add-one smoothing over the train vocabulary plus one
    * OOV bucket — p(w) = (c_train(w) + 1) / (T + V + 1) — so unseen
    * words get a finite, deterministic surprisal instead of a join miss.
    * [[unigramSurprisal]] and [[bigramSurprisalFrom]] score documents
    * under a model trained on the WHOLE corpus (fine for curation
    * signals); any published perplexity number must come from this
    * operator instead, or it's train-on-test. Emits per-valid-doc token
    * count, OOV count, and average surprisal.
    *
    * Scale shape: train-side vocab agg (map-side combined) + the salted
    * Zipf-safe count lookup on the valid tokens (LEFT form of
    * [[saltedCountJoin]] — an OOV token matches no copy and keeps NULL),
    * one broadcast 1-row stats frame. */
  def qHeldoutSurprisal(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val sp = Sampling.qHashSplit(s, d).select(col("doc_id"), col("split"))
    val withSplit = docs.join(sp, Seq("doc_id"))
    heldoutSurprisal(withSplit.filter(col("split") === "train"),
      withSplit.filter(col("split") === "valid"))
  }

  def heldoutSurprisal(train: DataFrame, heldout: DataFrame): DataFrame = {
    def toks(df: DataFrame) =
      df.select(col("doc_id"), explode(TextOps.normWords(col("text"))).as("w"))
    val vocab = toks(train).groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val stats = toks(train).agg(count(lit(1)).as("t"), countDistinct(col("w")).as("v"))
    val salted = vocab.withColumn("salt",
      explode(sequence(lit(0), lit(CountJoinSalt - 1))))
    val p = (coalesce(col("cw"), lit(0L)) + lit(1L)).cast("double") /
      (col("t") + col("v") + lit(1L)).cast("double")
    toks(heldout)
      .withColumn("salt", pmod(hash(col("doc_id")), lit(CountJoinSalt)))
      .join(salted, Seq("w", "salt"), "left")
      .drop("salt")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cw").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(avg(-log(p)), 6).as("avg_surprisal"))
  }

  /** Salt factor for Zipf-hot count-table lookups. */
  val CountJoinSalt = 16

  /** Zipf-safe count lookup: joins a token-grain table to an aggregated
    * count table WITHOUT a skewable single hot partition. A plain
    * token⋈counts shuffle join puts every occurrence of the hottest word
    * ("the" ≈ 5-7% of English tokens) in ONE task — and AQE's skew-join
    * rule cannot help here, because the count side is aggregated between
    * its shuffle and the join (`OptimizeSkewedJoin` only matches a sort
    * merge join whose children are bare shuffle stages; SkewSpec pins
    * this). So the join is salted instead: the count table (already
    * aggregated, vocabulary-sized) explodes into [[CountJoinSalt]]
    * deterministic copies, the token side tags `pmod(hash(saltBy), S)`,
    * and the hot key spreads across S partitions structurally —
    * independent of AQE, thresholds, or compression ratios. Results are
    * identical: every token row still meets exactly one copy of its
    * count row. */
  private[operators] def saltedCountJoin(
      rows: DataFrame, counts: DataFrame, keys: Seq[String],
      saltBy: org.apache.spark.sql.Column): DataFrame = {
    val salted = counts.withColumn("salt",
      explode(sequence(lit(0), lit(CountJoinSalt - 1))))
    rows.withColumn("salt", pmod(hash(saltBy), lit(CountJoinSalt)))
      .join(salted, keys :+ "salt")
      .drop("salt")
  }

  // ---------------------------------------------------------------------
  // Interpolated bigram LM surprisal + perplexity buckets (CCNet-style)
  // ---------------------------------------------------------------------

  /** Interpolation weights for the bigram LM. Both constants are spelled
    * as literals in Spark AND the oracle SQL — `1 - 0.7` in doubles is
    * 0.30000000000000004, which would diverge from a written `0.3`. */
  val BigramLambda = 0.7
  val UnigramLambda = 0.3

  /** Per-document mean surprisal under a λ-interpolated corpus bigram LM:
    * s(w₁w₂) = −ln(λ·c₂(w₁,w₂)/c₁(w₁) + (1−λ)·c₁(w₂)/T) — the KenLM-style
    * quality score one step up from [[unigramSurprisal]] (MLE bigram backed
    * off to unigram; real pipelines swap in externally-trained weights, the
    * corpus-MLE core is the deterministic, oracle-checkable part). Each
    * document then lands in a CCNet-style head/middle/tail tercile of the
    * corpus perplexity distribution (ntile 3 over the rounded score with a
    * doc_id tiebreak — deterministic).
    *
    * Scale: one tokenize explode; bigram counts are (w₁,w₂)-keyed partial
    * aggs (map-side combinable); occurrences join counts by bigram /
    * unigram keys via [[saltedCountJoin]] (Zipf hot keys spread
    * structurally — AQE's skew rule cannot match these aggregated-side
    * joins, see SkewSpec); the 1-row total broadcasts. The tercile is the one inherently global step
    * (a rank over per-doc scores — rows = documents, not tokens); at
    * 100 TB the same cut is taken from approx-percentile cutoffs instead
    * of an exact global rank, trading tie-edge documents only.
    */
  def qBigramSurprisal(s: SparkSession, d: String): DataFrame =
    bigramSurprisal(documents(s, d))

  def bigramSurprisal(docs: DataFrame): DataFrame =
    bigramSurprisalFrom(tokens(docs))

  /** (doc_id, source, pos, w) token table — the scan every n-gram gate
    * shares (see [[Pipeline.qCorpusCurate]]: one tokenize explode feeds
    * repetition, contamination and the bigram LM, the shingle-table
    * pattern applied to curation). */
  def tokens(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"), col("source"),
    posexplode(TextOps.normWords(col("text"))).as(Seq("pos", "w")))

  // ---------------------------------------------------------------------
  // Broadcast-model classifier scoring
  // ---------------------------------------------------------------------

  /** Linear classifier scoring over hashed token features — the "run a
    * (fastText-style) quality model over the whole corpus" pass every
    * curation pipeline ends with. The model is a (bucket, weight) TABLE
    * joined to the exploded features via broadcast, which is the
    * load-bearing design at 100 TB: weights live in storage like any other
    * dim table, the corpus-sized side never shuffles for the lookup, and
    * scoring is one broadcast hash join + one per-doc partial aggregation.
    *
    * Arithmetic is kept exact so the op is oracle-matched: weights are
    * integer deci-units (w10 ∈ -3..3), the per-doc margin is an integer
    * sum, and the final score is a single integer÷integer double division
    * — no float accumulation whose order could differ across engines.
    * [[linearModel]]'s weights are a deterministic formula only so the
    * DuckDB oracle can regenerate the same table; a real model swaps in
    * via the `model` parameter with the identical plan. */
  val FeatureDim = 4096

  /** Deterministic stand-in weight table: bucket b → w10 = (b % 7) - 3. */
  def linearModel(s: SparkSession): DataFrame =
    s.range(FeatureDim).select(col("id").as("bucket"), ((col("id") % 7) - 3).as("w10"))

  def qClassifierScore(s: SparkSession, d: String): DataFrame =
    classifierScore(documents(s, d), linearModel(s))

  /** See [[qClassifierScore]]; `model` is any (bucket, w10) weight table
    * small enough to broadcast (a hashed linear model always is: even
    * 2^24 buckets × 12 bytes is executor-memory-sized). */
  def classifierScore(docs: DataFrame, model: DataFrame): DataFrame = {
    val feats = tokens(docs).select(col("doc_id"),
      (conv(substring(md5(concat(lit("feat:"), col("w"))), 1, 8), 16, 10)
        .cast("long") % FeatureDim).as("bucket"))
    feats.join(broadcast(model), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w10")).as("margin_x10"))
      .withColumn("score", col("margin_x10") / (col("n_feats") * lit(10.0)))
      .withColumn("keep", col("score") > 0)
  }

  /** Classifier threshold sweep (classifier_eval) — the calibration
    * harness for [[qClassifierScore]]'s decision threshold: confusion
    * counts and precision/recall/F1 at each candidate threshold, against
    * the heuristic quality gate (quality ≥ CurateQualityMin, the same
    * cutoff [[Pipeline.qCorpusCurate]] enforces) as the reference label.
    * This is how a curation team picks the operating point before
    * swapping a trained model into [[classifierScore]]'s `model` slot —
    * and the quality-eval sibling of the dedup-side [[Dedup.qLshEval]].
    *
    * Precision/recall guard empty-prediction cells with greatest(·, 1)
    * (metric 0, never a division error); F1 falls back to 0 when both
    * are 0. Scale shape: per-doc scores (one broadcast model join) ×
    * an 11-row broadcast threshold frame → threshold-grain conditional
    * agg, map-side combined. */
  /** Thresholds are kept as INTEGER hundredths and divided by 100.0 at use
    * site on BOTH engines (Spark here, `unnest([ints]) / 100.0` in the
    * oracle SQL) — an int/100.0 IEEE division yields identical bits
    * everywhere, so the oracle never depends on a printed Double
    * round-tripping through DuckDB's parser (ADVICE r9). */
  val EvalThresholdHundredths: Seq[Int] = -5 to 5
  val EvalThresholds: Seq[Double] = EvalThresholdHundredths.map(_ / 100.0)

  def qClassifierEval(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val scored = classifierScore(docs, linearModel(s)).select(col("doc_id"), col("score"))
    val truth = docs.select(col("doc_id"),
      (TextOps.qualityExpr(col("text")) >= Pipeline.CurateQualityMin).as("label"))
    val th = s.createDataFrame(EvalThresholds.map(Tuple1(_))).toDF("threshold")
    val pred = col("score") > col("threshold")
    val agg = scored.join(truth, "doc_id")
      .crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(pred && col("label"), 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !col("label"), 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && col("label"), 1L).otherwise(0L)).as("fn"),
        sum(when(!pred && !col("label"), 1L).otherwise(0L)).as("tn"))
    val p = col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)).cast("double")
    val r = col("tp").cast("double") / greatest(col("tp") + col("fn"), lit(1L)).cast("double")
    agg.select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
      round(p, 6).as("precision"), round(r, 6).as("recall"),
      round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0)), 6).as("f1"))
  }

  // ---------------------------------------------------------------------
  // Distributed classifier TRAINING (logistic-style gradient descent)
  // ---------------------------------------------------------------------

  /** Gradient-descent rounds for [[classifierTrain]] and the learning
    * rate (a power of two, exactly representable in binary, so
    * `lit(TrainEta)` and the SQL literal are the same double on both
    * engines; 128 because the 1/n_feats-normalized features give per-doc
    * gradients of ‖x‖₁ = 1, so the N-averaged full gradient needs an
    * aggressive step to move margins into the sigmoid's active region —
    * and because Σ(x/n) = 1 makes the all-ones weight direction play the
    * intercept's role, which early rounds must inflate before the
    * class-conditional token-mix signal starts separating; 12 rounds ×
    * η=128 measurably separates the label classes on the fixture
    * (mean-margin gap ≈ 0.08, accuracy above the majority-class
    * baseline) while staying far from overshoot. */
  val TrainIters = 12
  val TrainEta = 128.0

  /** Label cutoff for [[classifierTrain]]. NOT [[Pipeline.CurateQualityMin]]
    * (0.05): that gate is an outlier FILTER and keeps essentially the whole
    * corpus, which would make the training label degenerate (all-positive —
    * GD then just inflates every weight toward σ̃→1 and learns nothing).
    * A discriminative label needs a bar near the quality median; 0.35
    * splits the fixture corpus ≈73/27 and is exactly representable in the
    * round(·, 4) grid the quality score lives on. */
  val TrainLabelMin = 0.35

  /** Trains the hashed-feature quality classifier that
    * [[classifierScore]] serves — the missing first leg of the
    * train → eval → score lifecycle (reference analogue: the quality
    * models CCNet/fastText-style curation pipelines fit on a labeled
    * seed set before scoring the corpus). Labels are the heuristic
    * quality score at the discriminative [[TrainLabelMin]] bar (see its
    * scaladoc for why not the permissive curation gate), features the
    * same md5-hashed token buckets as [[classifierScore]], so the
    * trained (bucket, w_micro) table drops straight into its broadcast
    * `model` slot.
    *
    * Exactness design (this entry is DRIVER-HASH-GREEN, no frozen
    * artifact): every cross-engine float hazard is removed at the
    * algebra level rather than frozen —
    *  - weights are integer MICRO-units (BIGINT), margins integer sums;
    *  - the activation is the rational "fast sigmoid"
    *    0.5 + z / (2*(1+|z|)) — only IEEE +,-,*,/,abs, each of which is
    *    correctly-rounded and therefore bit-identical in Spark and
    *    DuckDB (no exp/tanh, whose libm implementations differ);
    *  - the per-document gradient contribution
    *    ((x/n_feats) * r) * (eta/N) is a fixed-shape double expression
    *    (deterministic bits), SNAPPED to the decimal(20,12) grid before
    *    the order-dependent cross-document sum — the [[Pipeline]] sum_w
    *    convention — so partial-aggregation grouping cannot move it;
    *  - the weight update floors the decimal gradient into micro-units
    *    (floor, not cast: decimal→int rounding direction differs across
    *    engines, floor does not).
    * The DuckDB twin re-runs all [[TrainIters]] rounds as chained CTEs
    * (the bpe_merges pattern) and must land on bit-identical BIGINT
    * weights.
    *
    * Scale shape (100 TB): training runs on the LABELED subset (here the
    * whole fixture corpus; in production a seed set, orders of magnitude
    * smaller than the corpus it will score). One tokenize+hash pass
    * collapses it to the (doc, bucket, x) feature grain; each round is
    * two map-side-combined aggregations over that grain (doc-grain
    * margins, bucket-grain gradients) with the weight table always
    * broadcast — never a corpus-sized shuffle. The driver holds only the
    * FeatureDim-row weight vector per round (bounded by design, the
    * centroid-matrix precedent in [[Similarity]]); rounds are sequential
    * like pagerank/bpe_merges. Scoring 100 TB with the result is
    * [[classifierScore]]'s one broadcast join. */
  def qClassifierTrain(s: SparkSession, d: String): DataFrame =
    classifierTrain(documents(s, d))

  def classifierTrain(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val lab = docs.select(col("doc_id"),
      (TextOps.qualityExpr(col("text")) >= TrainLabelMin)
        .cast("int").as("y"))
    val fx = tokens(docs).select(col("doc_id"),
        (conv(substring(md5(concat(lit("feat:"), col("w"))), 1, 8), 16, 10)
          .cast("long") % FeatureDim).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("x"))
    // Labeled feature grain, reused by every round (2 scans per round).
    // CO-PARTITIONED AND CO-SORTED BY doc_id before caching (opt r17,
    // guide §2.4 "two operations keyed the same way share one exchange"):
    // every round runs a groupBy(doc_id) margin agg and an ex ⋈ resid
    // join on doc_id over this frame — with the cache partitioned by
    // (doc_id, bucket) each of the 12 rounds re-exchanged and re-sorted
    // the grain; hash-partitioned by doc_id the per-round plan needs no
    // ex-side Exchange or Sort at all. n_feats comes from a doc_id
    // window over the same partitioning (identical integer sum) instead
    // of a separate aggregate+join. Measured same-JVM at sf0.1:
    // 8.65 s → 5.75 s, output bit-identical.
    val ex = fx.join(lab, "doc_id")
      .repartition(col("doc_id")).sortWithinPartitions("doc_id")
      .withColumn("n_feats",
        sum(col("x")).over(Window.partitionBy(col("doc_id"))))
      .persist()
    val nDocs = docs.count().toDouble // scalar on driver, like pagerank's N
    // weight vector as a local broadcast relation each round: FeatureDim
    // rows collected per round — bounded by design; keeps every join a
    // broadcast and the per-round plan flat instead of a growing DAG
    var weights: Map[Long, Long] =
      (0L until FeatureDim.toLong).map(_ -> 0L).toMap
    import s.implicits._
    for (_ <- 1 to TrainIters) {
      val w = weights.toSeq.sortBy(_._1).toDF("bucket", "w_micro")
      val m = ex.join(broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(sum(col("x") * col("w_micro")).as("margin_micro"),
          max(col("n_feats")).as("n_feats"), max(col("y")).as("y"))
      val z = col("margin_micro").cast("double") /
        (col("n_feats").cast("double") * lit(1000000.0))
      val resid = m.select(col("doc_id"),
        ((lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z))))
          - col("y").cast("double")).as("r"))
      val grad = ex.join(resid, "doc_id")
        .select(col("bucket"),
          (((col("x").cast("double") / col("n_feats").cast("double")) * col("r"))
            * lit(TrainEta / nDocs)).cast("decimal(20,12)").as("c"))
        .groupBy("bucket").agg(sum(col("c")).as("g"))
      val deltas = grad
        .select(col("bucket"),
          floor(col("g") * lit(1000000L)).cast("long").as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      weights = weights.map { case (b, w0) => b -> (w0 - deltas.getOrElse(b, 0L)) }
    }
    ex.unpersist()
    weights.toSeq.sortBy(_._1).toDF("bucket", "w_micro")
      .select(col("bucket"), col("w_micro"))
  }

  /** Scores the corpus with the weights [[classifierTrain]] just fit —
    * the serve leg of the lifecycle, structurally [[classifierScore]]
    * with micro-unit weights: one broadcast join + one per-doc integer
    * aggregation; score = margin/(n_feats*1e6) is a single int/int
    * double division (exact bits), keep is an integer sign test. */
  def qClassifierTrainScore(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    classifierTrainScoreFrom(docs, classifierTrain(docs))
  }

  /** See [[qClassifierTrainScore]]; takes an already-trained
    * (bucket, w_micro) weight table so the bench bills the 12-round GD
    * once (as classifier_train) and this serve leg at its true cost —
    * one broadcast join + one integer aggregation (VERDICT r12 task 2:
    * the combined entry was double-billing ~8 s of training; in
    * production the trained table is materialized once and every scoring
    * run reuses it, exactly this call shape). */
  def classifierTrainScoreFrom(docs: DataFrame, model: DataFrame): DataFrame = {
    val feats = tokens(docs).select(col("doc_id"),
      (conv(substring(md5(concat(lit("feat:"), col("w"))), 1, 8), 16, 10)
        .cast("long") % FeatureDim).as("bucket"))
    feats.join(broadcast(model), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_micro")).as("margin_micro"))
      .withColumn("score",
        col("margin_micro").cast("double") /
          (col("n_feats").cast("double") * lit(1000000.0)))
      .withColumn("keep", col("margin_micro") > 0L)
  }

  /** Per-document (doc_id, n_bigrams, avg_surprisal) under the
    * interpolated corpus bigram LM — the tercile-free core shared by the
    * exact and approximate bucket cuts. */
  def bigramScores(toks: DataFrame): DataFrame = {
    val c1 = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("t"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = toks
      .select(col("doc_id"), col("w").as("w1"), lead(col("w"), 1).over(byPos).as("w2"))
      .filter(col("w2").isNotNull)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // all three count lookups are salted: the hot bigram ("the","the")
    // and hot unigram carry the same Zipf mass as unigramSurprisal's
    // vocab join, and the same aggregated-side shape AQE cannot split
    val scored = saltedCountJoin(
      saltedCountJoin(
        saltedCountJoin(bg, c2, Seq("w1", "w2"), col("doc_id")),
        c1.select(col("w").as("w1"), col("c").as("c1w")), Seq("w1"), col("doc_id")),
      c1.select(col("w").as("w2"), col("c").as("c1u")), Seq("w2"), col("doc_id"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log(
          lit(BigramLambda) * (col("c2").cast("double") / col("c1w").cast("double"))
            + lit(UnigramLambda) * (col("c1u").cast("double") / col("t").cast("double"))))
          .as("s"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("s")), 6).as("avg_surprisal"))
  }

  def bigramSurprisalFrom(toks: DataFrame): DataFrame =
    bigramScores(toks)
      .withColumn("tercile",
        ntile(3).over(Window.orderBy(col("avg_surprisal"), col("doc_id"))))
      .select(col("doc_id"), col("n_bigrams"), col("avg_surprisal"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))

  /** The 100 TB form of the tercile cut: ntile(3) is a global rank — one
    * total order over every document. This variant takes the two bucket
    * boundaries from percentile_approx (relative-error sketch, mergeable,
    * one tiny broadcast) and buckets each document with two comparisons —
    * no global sort anywhere. Documents whose score falls within sketch
    * error of a boundary may land one bucket over (rank-accuracy
    * semantics, same caveat as q37); agreement with the exact terciles is
    * asserted ≥95% in CurationSpec. */
  def qBigramSurprisalScale(s: SparkSession, d: String): DataFrame =
    bigramSurprisalScale(documents(s, d))

  def bigramSurprisalScale(docs: DataFrame): DataFrame =
    bigramSurprisalScaleFrom(tokens(docs))

  /** Frozen-cutoff location for a data directory — shared verbatim with
    * the DuckDB oracle's read_parquet (the bpeSegsPath pattern): the
    * sketch cutoffs are the ONE engine-specific piece of the scale form,
    * so the registered entry freezes them and the oracle independently
    * recomputes everything else (scores, bucketing algebra) and applies
    * the same frozen cuts — rows-only → hash-green.
    *
    * Keyed PER ENTRY (`which`), not shared (r10 ADVICE): two entries
    * overwriting one path would make the first entry's oracle depend on
    * percentile_approx being bit-stable across separately-built token
    * plans AND on driver execution order — each entry now freezes its own
    * boundary and its oracle reads exactly the artifact its Spark run
    * wrote. */
  def pplCutsPath(d: String, which: String): String =
    s"/tmp/graft-ppl-cuts-$which/" + new java.io.File(d).getName

  /** Registered scale entry: [[bigramSurprisalScaleFrom]] with the
    * percentile_approx cutoffs round-tripped through the parquet artifact
    * both engines read. */
  def qBigramSurprisalScaleArtifact(s: SparkSession, d: String): DataFrame =
    bigramSurprisalScaleArtifactFrom(s, d, tokens(documents(s, d)), "bigram")

  /** See [[qBigramSurprisalScaleArtifact]]; takes a prebuilt token table
    * plus the per-entry artifact key (corpus_curate_scale threads its
    * shared token table and its own key). */
  def bigramSurprisalScaleArtifactFrom(s: SparkSession, d: String,
                                       toks: DataFrame, which: String): DataFrame = {
    val scores = bigramScores(toks).persist()
    val cutsPath = pplCutsPath(d, which)
    scores.agg(
        percentile_approx(col("avg_surprisal"),
          array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("cuts"))
      .select(element_at(col("cuts"), 1).as("cut1"),
        element_at(col("cuts"), 2).as("cut2"))
      .write.mode("overwrite").parquet(cutsPath)
    scores.crossJoin(broadcast(s.read.parquet(cutsPath)))
      .select(col("doc_id"), col("n_bigrams"), col("avg_surprisal"),
        when(col("avg_surprisal") <= col("cut1"), "head")
          .when(col("avg_surprisal") <= col("cut2"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** See [[bigramSurprisalScale]]; takes an already-built token table so a
    * composed pipeline (corpus_curate_scale) can share ONE tokenize with
    * the other n-gram gates. */
  def bigramSurprisalScaleFrom(toks: DataFrame): DataFrame = {
    // scores is consumed twice (cutoff agg + bucket select) and sits on
    // top of the expensive token-grain joins — persist the doc-grain
    // frame (one row per document) so the LM pipeline runs once, the
    // same shared-table boundary as the shingle/signature tables
    val scores = bigramScores(toks).persist()
    val cuts = scores.agg(
      percentile_approx(col("avg_surprisal"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("cuts"))
    scores.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_bigrams"), col("avg_surprisal"),
        when(col("avg_surprisal") <= element_at(col("cuts"), 1), "head")
          .when(col("avg_surprisal") <= element_at(col("cuts"), 2), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  // ---------------------------------------------------------------------
  // Sequence packing (pretraining sample packing)
  // ---------------------------------------------------------------------

  /** Tokens per packed training sequence. */
  val PackBudget = 2048L

  /** Sequence packing: lay documents head-to-tail into fixed
    * [[PackBudget]]-token bins — the pretraining batch-assembly kernel
    * (documents straddling a boundary are split at training time; the
    * operator's contract is the deterministic placement, not the split).
    *
    * A single global cumulative sum would serialize the corpus through
    * one partition, so packing is sharded the way real pipelines shard it
    * per worker: documents hash (md5 prefix — portable to the oracle) into
    * 256 independent packing streams, each stream packs by cumulative
    * token count in doc_id order. One window shuffle keyed by bucket;
    * every stream is O(corpus/256) and streams scale with the corpus.
    */
  def qSequencePack(s: SparkSession, d: String): DataFrame =
    sequencePack(documents(s, d))

  /** One packed document emitted by [[sequencePackStream]]. */
  case class PackedDoc(doc_id: Long, bucket: String, n_tokens: Long,
      bin: Long, bin_offset: Long)

  /** STREAMING sequence packing — batch assembly as documents arrive from
    * ingest, instead of a batch pass over the finished corpus. The batch
    * form's per-bucket cumulative sum becomes per-bucket STATE: one long
    * (the bucket's running token count) per md5-prefix bucket, so the
    * state store holds exactly 256 longs regardless of stream length, and
    * each arriving document is placed (bin, bin_offset) the moment it
    * arrives. Within a micro-batch, placement order is doc_id (iterator
    * sorted), so replaying a bounded corpus in order reproduces
    * [[sequencePack]] bit for bit — asserted in CurationStreamSpec. */
  def sequencePackStream(docs: DataFrame): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs.select(
        col("doc_id").cast("long"),
        substring(md5(TextOps.normText(col("text")).cast("binary")), 1, 2).as("bucket"),
        size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: String, rows: Iterator[(Long, String, Long)], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, n) =>
            val placed = PackedDoc(id, bucket, n, cum / PackBudget, cum % PackBudget)
            cum += n
            placed
          }
          state.update(cum)
          out.iterator
      }
  }

  def sequencePack(docs: DataFrame): DataFrame = {
    val byBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col("doc_id"),
        substring(md5(TextOps.normText(col("text")).cast("binary")), 1, 2).as("bucket"),
        size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_excl", coalesce(sum(col("n_tokens")).over(byBucket), lit(0L)))
      .select(
        col("doc_id"), col("bucket"), col("n_tokens"),
        expr(s"cum_excl div $PackBudget").as("bin"),
        (col("cum_excl") % PackBudget).as("bin_offset"))
  }

  /** Separator written between packed documents by [[qPackAssemble]]. */
  val PackSep = " <doc> "

  /** Training-example assembly (pack_assemble): materialize the sequences
    * [[sequencePack]] laid out — each (bucket, bin) becomes one example
    * whose text is its documents' normalized text joined in bin-offset
    * order with a separator token. The step between packing and the
    * training reader: sequence_pack answers WHERE each document goes,
    * this emits the actual examples (plus their doc/token counts so a
    * reader can assert budget adherence without re-tokenizing).
    *
    * Scale shape: one doc_id join to attach text, one (bucket, bin) agg
    * whose collect_list holds only a bin's documents (bounded by
    * PackBudget tokens — this is the one op where a bounded collect_list
    * is the POINT: an example must exist as one row); sort+join runs over
    * tens of elements per bin. 256 buckets × bins shuffle keys. */
  def qPackAssemble(s: SparkSession, d: String): DataFrame =
    packAssemble(documents(s, d))

  def packAssemble(docs: DataFrame): DataFrame =
    sequencePack(docs)
      .join(docs.select(col("doc_id"), TextOps.normText(col("text")).as("nt")), Seq("doc_id"))
      .groupBy(col("bucket"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(
          transform(
            // doc_id as the deterministic tiebreak: two docs in a bin can
            // share a bin_offset when one normalizes to 0 tokens; without
            // it the sort falls through to text and the oracle's ORDER BY
            // would be free to disagree.
            array_sort(collect_list(struct(col("bin_offset"), col("doc_id"), col("nt")))),
            x => x.getField("nt")),
          PackSep).as("seq_text"))

  // ---------------------------------------------------------------------
  // Streaming signal projection (batch/stream-agnostic curation front end)
  // ---------------------------------------------------------------------

  /** The stateless per-document signal slice of the curation pass —
    * language ID, quality score, token count, PII count + scrubbed length —
    * as ONE projection that runs identically on a batch DataFrame or a
    * Structured Streaming source (no shuffle, no state, no watermark
    * needed: this is the map side of a streaming ingest pipeline that
    * scores documents as they arrive and defers the corpus-relative gates
    * — dedup, contamination, terciles, domain mix — to the batch pass).
    * CurationStreamSpec proves stream output == batch output row-for-row
    * on a replayed corpus slice. */
  def qSignalProjection(s: SparkSession, d: String): DataFrame =
    signalProjection(documents(s, d))

  def signalProjection(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    TextOps.langIdExpr(col("text")).as("pred_lang"),
    TextOps.qualityExpr(col("text")).as("quality"),
    size(TextOps.normWords(col("text"))).cast("long").as("ws_tokens"),
    (regexp_count(col("text"), lit(EmailRe)) +
      regexp_count(col("text"), lit(Ipv4Re)) +
      regexp_count(col("text"), lit(PhoneRe))).as("n_pii"),
    length(scrub(col("text"))).cast("long").as("clean_len"))

  // ---------------------------------------------------------------------
  // Cross-document duplicated-segment removal
  // ---------------------------------------------------------------------

  /** Words per segment: documents are re-chunked into consecutive
    * SegWords-word segments (last partial segment kept). */
  val SegWords = 10

  /** Substring-granularity dedup: every document is split into consecutive
    * [[SegWords]]-word segments; a segment whose exact text already
    * occurred earlier in the corpus (first occurrence = smallest
    * (doc_id, seg) — deterministic) is dropped, and each document is
    * reassembled from its kept segments. Catches boilerplate shared across
    * documents that doc-level dedup can't touch (doc A survives, doc B
    * keeps only its novel spans).
    *
    * Scale notes: segment assembly is ONE doc_id-keyed shuffle using
    * SegWords max(when(pos%k)) agg columns (the MinHash wide-agg trick —
    * no per-row lambdas, no collect_list of whole documents); the
    * first-occurrence pass shuffles (segment-hash → min owner) like
    * dedup_exact; reassembly is one more doc_id shuffle whose HOF runs on
    * tens of elements per document (bounded by doc length / SegWords, not
    * corpus size). Nothing quadratic, no driver data.
    */
  def qSegmentDedup(s: SparkSession, d: String): DataFrame =
    segmentDedup(documents(s, d))

  def segmentDedup(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"), posexplode(TextOps.normWords(col("text"))).as(Seq("pos", "w")))
    // (doc, segment) rows: pos%SegWords pivots the segment's words into
    // SegWords agg columns; concat_ws skips the NULLs of a short tail.
    val segs = toks
      .groupBy(col("doc_id"), floor(col("pos") / SegWords).cast("long").as("seg"))
      .agg(concat_ws(" ",
        (0 until SegWords).map(k => max(when(col("pos") % SegWords === k, col("w")))): _*)
        .as("seg_text"))
    val byFirst = Window.partitionBy(col("seg_text")).orderBy(col("doc_id"), col("seg"))
    val marked = segs.withColumn("kept", row_number().over(byFirst) === 1)
    marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_segs"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
      array_join(
        transform(
          array_sort(collect_list(when(col("kept"), struct(col("seg"), col("seg_text"))))),
          x => x.getField("seg_text")),
        " ").as("clean_text"))
  }

  // ---------------------------------------------------------------------
  // Corpus-frequency boilerplate removal (CCNet/RefinedWeb line dedup)
  // ---------------------------------------------------------------------

  /** A segment is boilerplate when it appears in at least this many
    * DISTINCT documents. */
  val BoilerplateDocFreq = 3

  /** Frequency-thresholded boilerplate strip: the CCNet-style "remove
    * lines that repeat across the corpus" pass (the corpus has no line
    * breaks, so the unit is the same [[SegWords]]-word segment grid as
    * [[segmentDedup]]). Differs from segment_dedup's keep-first policy in
    * BOTH direction and threshold: a segment seen in ≥ [[BoilerplateDocFreq]]
    * distinct documents is removed from EVERY document — including the
    * first — because cross-site boilerplate (cookie banners, nav text,
    * license footers) is noise wherever it appears, while a one-off
    * duplicated span is kept in all documents below the threshold.
    *
    * Scale shape: the hot-segment table is the df ≥ K HEAD of the segment
    * frequency distribution — at most (total segments)/K entries and in
    * practice tiny — but the mark join deliberately stays a plain equi
    * join on seg_text (AQE broadcasts it when small) rather than a
    * hard-coded broadcast, because "boilerplate head is small" is an
    * empirical property, not an invariant. Everything else is the
    * segment_dedup shuffle shape: one (doc_id, seg) agg, one seg_text
    * join, one doc_id reassembly agg. Nothing quadratic, no driver data.
    */
  def qBoilerplateStrip(s: SparkSession, d: String): DataFrame =
    boilerplateStrip(documents(s, d))

  def boilerplateStrip(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"), posexplode(TextOps.normWords(col("text"))).as(Seq("pos", "w")))
    val segs = toks
      .groupBy(col("doc_id"), floor(col("pos") / SegWords).cast("long").as("seg"))
      .agg(concat_ws(" ",
        (0 until SegWords).map(k => max(when(col("pos") % SegWords === k, col("w")))): _*)
        .as("seg_text"))
    val hot = segs.groupBy(col("seg_text"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= BoilerplateDocFreq)
      .select(col("seg_text"), lit(true).as("hot"))
    segs.join(hot, Seq("seg_text"), "left")
      .withColumn("kept", col("hot").isNull)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("seg"), col("seg_text"))))),
            x => x.getField("seg_text")),
          " ").as("clean_text"))
  }

  // ---------------------------------------------------------------------
  // Robust outlier gate (median / MAD)
  // ---------------------------------------------------------------------

  /** MAD multiplier: |len − median| > MadK·MAD flags an outlier. */
  val MadK = 3.0

  /** Robust per-source length-outlier gate: median and median-absolute-
    * deviation of the whitespace token count within each source domain,
    * flagging documents more than [[MadK]]·MAD from their source's median.
    * The robust (median/MAD) form survives exactly the contamination it
    * screens for — a handful of pathological giant or empty documents
    * shifts a mean/stddev gate but leaves the median untouched.
    *
    * Degenerate MAD = 0 (over half the source is one length) falls back to
    * "any deviation is an outlier" — the standard modified-z-score
    * convention, pinned in CurationSpec.
    *
    * Exactness: token counts are integers, so the interpolated medians end
    * in .0/.5 — exact in binary doubles — and every derived value
    * (|len − med|, its median, MadK·mad) is exact, making the boolean
    * engine-portable with no rounding guard. Scale shape: two per-source
    * exact-percentile aggs (source is dimension-sized; each group's sort
    * is a partial agg per source, not a global window) and two broadcast
    * joins of the dimension-sized stat tables back to the corpus. */
  /** Cross-source quality calibration: the raw quality heuristic is not
    * comparable across sources (a "0.7" in a clean books source and a
    * "0.7" in a noisy crawl mean different things), so before scores feed
    * a global keep-threshold or mixture weight the pipeline converts each
    * to its PERCENTILE RANK within its source — a distribution-free
    * calibration (the classifier-score analogue of quantile
    * normalization). Output adds the 6-dp percent_rank and its decile
    * bucket, both computed from the same rounded value on both engines.
    *
    * Scale shape: one scan computes the per-doc quality column; the rank
    * is a source-partitioned window over DOC-grain rows — an external
    * sort per source that spills and scales linearly. A mega-source
    * (one source = 30% of the corpus) serializes its partition through
    * one task; at that shape the same cut comes from percentile_approx
    * cutoffs instead (the [[bigramSurprisalScaleFrom]] sketch-cut
    * pattern, rank-accuracy trade documented there). Determinism: the
    * ORDER BY carries the doc_id tiebreak, so ranks are unique and the
    * rounded percent_rank is the same double on both engines. */
  def qQualityCalibrate(s: SparkSession, d: String): DataFrame = {
    val byQ = Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), col("source"), TextOps.qualityExpr(col("text")).as("quality"))
      .withColumn("q_rank", round(percent_rank().over(byQ), 6))
      .withColumn("decile", least(floor(col("q_rank") * 10), lit(9.0)).cast("int"))
  }

  def qRobustOutliers(s: SparkSession, d: String): DataFrame =
    robustOutliers(documents(s, d))

  def robustOutliers(docs: DataFrame): DataFrame = {
    val lens = docs.select(col("doc_id"), col("source"),
      size(TextOps.normWords(col("text"))).cast("long").as("len"))
    val med = lens.groupBy(col("source"))
      .agg(percentile(col("len"), lit(0.5)).as("med"))
    val dev = lens.join(broadcast(med), Seq("source"))
      .withColumn("adev", abs(col("len") - col("med")))
    val mad = dev.groupBy(col("source"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq("source"))
      .select(col("doc_id"), col("source"), col("len"),
        col("med"), col("mad"),
        when(col("mad") === 0.0, col("adev") > 0.0)
          .otherwise(col("adev") > lit(MadK) * col("mad")).as("is_outlier"))
  }

  // ---------------------------------------------------------------------
  // Opt-out purge (right-to-be-forgotten, content-hash granularity)
  // ---------------------------------------------------------------------

  /** Opt-out purge audit (rtbf_purge): remove every document whose
    * CONTENT fingerprint appears on an opt-out list, and account for the
    * removal per source. Purging by content hash rather than doc id is
    * the point — a web corpus holds near-verbatim copies of an opted-out
    * page under many ids, and a compliance pass must take them all, not
    * just the id the request named. The stand-in opt-out list here is
    * the fingerprints of every 17th document (a deterministic proxy for
    * the external request table; [[rtbfPurge]] takes any fingerprint
    * frame).
    *
    * Output: per-source kept/purged counts plus the number of DISTINCT
    * opted-out fingerprints that actually matched in that source — the
    * number a compliance report needs ("N of the requested contents were
    * found and removed here").
    *
    * Scale shape: the opt-out list is request-table-sized (tiny against
    * the corpus) → broadcast; the corpus pays one scan and never
    * shuffles for the membership test; only source-grain counts
    * aggregate. A plan test pins the broadcast. */
  def qRtbfPurge(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val optOut = docs.filter(col("doc_id") % 17 === 0)
      .select(md5(TextOps.normText(col("text")).cast("binary")).as("opt_fp"))
      .distinct()
    rtbfPurge(docs, optOut)
  }

  /** See [[qRtbfPurge]]; `optOut` is a 1-column frame of opted-out
    * content fingerprints (md5 of normalized text). */
  def rtbfPurge(docs: DataFrame, optOut: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        md5(TextOps.normText(col("text")).cast("binary")).as("fp"))
      .join(broadcast(optOut.withColumn("hit", lit(true))),
        col("fp") === col("opt_fp"), "left")
      .groupBy(col("source"))
      .agg(
        sum(when(col("hit"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_purged"),
        countDistinct(when(col("hit"), col("fp"))).as("n_matched_fps"))
}
