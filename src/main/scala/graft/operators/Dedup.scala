package graft.operators

import graft.Tables._
import graft.operators.TextOps.{normText, normWords}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * word-shingle Jaccard (exact inverted-index join), MinHash+LSH, SimHash.
  *
  * Scale design:
  *  - signature computation (MinHash / SimHash) is a pure per-row column
  *    expression — nested higher-order functions, no explode, no shuffle —
  *    so the expensive part is embarrassingly parallel at 100 TB.
  *  - candidate generation shuffles only small keys (band hashes / shingle
  *    strings), never full documents; pair verification joins signatures
  *    (fixed 64×8 bytes), not text.
  */
object Dedup {

  /** Distinct word n-gram shingles of the normalized text, as strings. */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      array_distinct(transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + lit(k + 1))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup: group documents by content fingerprint (md5 of the
    * normalized text). Emits one row per distinct content with the
    * representative (min doc_id) and the multiplicity — the "keep table"
    * a dedup pass would join back against. */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), md5(normText(col("text")).cast("binary")).as("content_fp"))
      .groupBy(col("content_fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact near-dup pairs by word-3-gram Jaccard ≥ 0.5, via an inverted
    * shingle index self-join (the oracle-checkable ground truth that the
    * MinHash variant approximates). Shuffles (doc_id, shingle) pairs — at
    * 100 TB you'd add a document-frequency cap on shingles to bound bucket
    * skew; the synthetic corpus has no hot shingles so the exact form is
    * used here. */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = documents(s, d)
      .select(col("doc_id"), shingles(normWords(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val counts = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast("double") /
      (col("ca.n") + col("cb.n") - col("inter")).cast("double")
    inter
      .join(broadcast(counts.as("ca")), col("doc_a") === col("ca.doc_id"))
      .join(broadcast(counts.as("cb")), col("doc_b") === col("cb.doc_id"))
      .filter(j >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(j, 3).as("jaccard"))
  }

  val MinHashPerms = 64
  val LshBands = 16 // 4 rows/band → LSH threshold ≈ (1/16)^(1/4) ≈ 0.5

  /** 64-perm MinHash signature as a per-row expression: perm p's hash of a
    * shingle is xxhash64("mh", p, shingle); the signature entry is the min
    * over the doc's shingles. Nested HOFs — zero shuffle. */
  def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(MinHashPerms - 1)),
      p => array_min(transform(sh, x => xxhash64(lit("mh"), p, x))))

  /** Per-band LSH keys: band b's key hashes signature rows 4b..4b+3. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(LshBands - 1)),
      b => xxhash64(lit("band"), b,
        element_at(sig, b * 4 + 1), element_at(sig, b * 4 + 2),
        element_at(sig, b * 4 + 3), element_at(sig, b * 4 + 4)))

  /** MinHash+LSH near-dup candidates with signature-estimated Jaccard.
    * Dataflow: map-side signatures → explode 16 small band keys → self-join
    * on (band, key) → estimate Jaccard from signature agreement → dedup
    * pairs. Only (doc_id, band key, signature) ever shuffles. */
  def qMinHashLsh(s: SparkSession, d: String): DataFrame = {
    val sigs = documents(s, d)
      .select(col("doc_id"), shingles(normWords(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSig(col("sh")).as("sig"))
    val buckets = sigs
      .select(col("doc_id"), col("sig"), posexplode(bandKeys(col("sig"))).as(Seq("band", "bkey")))
    val est = size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
      m => m)).cast("double") / lit(MinHashPerms.toDouble)
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .distinct()
  }

  /** 64-bit SimHash over the normalized token bag, as a single column
    * expression (nested aggregates; bit j votes +1/−1 by bit j of
    * xxhash64(token)). Emits the signature per doc — banding/hamming
    * joins compose on top exactly like [[qMinHashLsh]]. */
  val simhashExpr: Column = expr(
    """aggregate(
      |  sequence(0, 63), 0L,
      |  (acc, j) -> acc + if(
      |    aggregate(norm_words, 0,
      |      (c, w) -> c + if((shiftright(xxhash64(w), j) & 1L) = 1L, 1, -1)) > 0,
      |    shiftleft(1L, j), 0L))""".stripMargin)

  def qSimHash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("norm_words", normWords(col("text")))
      .select(col("doc_id"), simhashExpr.as("simhash"))

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit chunks
    * (hamming ≤ 3 ⇒ at least one chunk equal), join on chunks, verify with
    * bit_count(xor). */
  def qSimHashPairs(s: SparkSession, d: String): DataFrame = {
    val sigs = qSimHash(s, d)
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535L)"))
        .as(Seq("chunk", "ckey")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 6)
      .distinct()
  }
}
