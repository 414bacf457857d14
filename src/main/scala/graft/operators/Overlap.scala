package graft.operators

import graft.Tables._
import graft.functions.KMinValues
import graft.operators.TextOps.normWords
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-source corpus-overlap estimation — the "how much does crawl N
  * overlap crawl N−1 / how redundant are my sources" question a
  * training-data pipeline answers before blending sources (near-identical
  * sources waste mixture weight; unexpected overlap flags a scraping bug).
  *
  * Two forms, the established exact/sketch twin pattern (ann_brute vs
  * ann_lsh, q08 vs q09):
  *
  *  - [[qOverlapExact]] — oracle-checkable ground truth: per source pair,
  *    the distinct-3-gram-shingle intersection and Jaccard via an
  *    inverted-index self-join. The join is keyed by shingle and each
  *    shingle contributes at most C(sources, 2) pairs, so buckets are
  *    bounded by the SOURCE count (a handful), never by corpus size —
  *    but the shuffle still moves the full distinct-shingle table, which
  *    is corpus-sized.
  *  - [[qOverlapKmv]] — the 100 TB path: one [[KMinValues]] sketch per
  *    source (k×8 bytes of state regardless of corpus size, classic
  *    partial+final aggregation, no self-join anywhere), then pairwise
  *    estimates over the sketch table alone — sources² rows of k-length
  *    arrays. At a thousand sources that is still megabytes. Registered
  *    rows-only (a sketch estimate has no SQL oracle); OverlapSpec pins
  *    merge-invariance EXACTLY and error vs [[qOverlapExact]] within the
  *    1/√k band.
  */
object Overlap {

  /** Distinct (source, shingle) rows — [[Dedup.shingleTable]]'s
    * construction (posexplode + window lead, whole-stage codegen'd;
    * see that scaladoc for why not HOF lambdas) keyed by SOURCE: overlap
    * is a source-grain question, so the set union over a source's
    * documents happens in the same distinct that dedups within a doc. */
  def sourceShingleTable(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val nexts = (1 until n).map(k => lead(col("w"), k).over(w).as(s"w$k"))
    docs
      .select(col("doc_id"), col("source"), posexplode(normWords(col("text"))).as(Seq("pos", "w")))
      .select(col("source") +: col("doc_id") +: col("w") +: nexts: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("source"),
        concat_ws(" ", col("w") +: (1 until n).map(k => col(s"w$k")): _*).as("shingle"))
      .distinct()
  }

  def qOverlapExact(s: SparkSession, d: String): DataFrame =
    overlapExact(sourceShingleTable(documents(s, d)).persist())

  /** Source-grain distinct shingles DERIVED from an already-materialized
    * doc-grain [[Dedup.shingleTable]] plus a (doc_id, source) map — the
    * cluster-scale shape: the tokenize+lead shuffle is paid once by the
    * shared shingle table and overlap adds only a doc_id-keyed join (the
    * map is dimension-thin) and the source-grain distinct. The bench
    * threads its shared table here; the registered entries stay
    * self-contained. Output is identical to [[sourceShingleTable]]
    * because shingle construction is per-document either way. */
  def sourceShinglesFrom(docShingles: DataFrame, docSource: DataFrame): DataFrame =
    docShingles.join(docSource, "doc_id")
      .select(col("source"), col("shingle")).distinct()

  /** All unordered source pairs with distinct-shingle set sizes,
    * intersection size, and Jaccard. Pairs with an empty intersection are
    * kept (coalesce 0) so the output grain is exactly C(sources, 2). */
  def overlapExact(ex: DataFrame): DataFrame = {
    val counts = ex.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("i"))
    val pairs = counts.select(col("source").as("source_a"), col("n").as("n_a"))
      .crossJoin(counts.select(col("source").as("source_b"), col("n").as("n_b")))
      .filter(col("source_a") < col("source_b"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("i"), lit(0L)).as("n_common"),
        round(coalesce(col("i"), lit(0L)).cast("double")
          / (col("n_a") + col("n_b") - coalesce(col("i"), lit(0L))).cast("double"), 6)
          .as("jaccard"))
  }

  /** Frozen-artifact location for the per-source hashed-shingle table —
    * shared verbatim with the DuckDB twin (the annArtifactPath pattern):
    * the xxhash64 value per distinct (source, shingle) is the ONE
    * engine-specific piece of the KMV path; the oracle recomputes the
    * k-minimum selection, the pairwise union/intersection estimates and
    * the rounding algebra from the same frozen values. */
  def overlapArtifactPath(d: String): String =
    "/tmp/graft-overlap-hashes/" + new java.io.File(d).getName

  private def freeze(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Registered entry: hash table frozen to parquet, sketches + estimates
    * served from the loaded copy so both engines see identical hash
    * values (hash-green since r11; before that, rows-only). */
  def qOverlapKmv(s: SparkSession, d: String): DataFrame = {
    val hashed = sourceShingleTable(documents(s, d))
      .select(col("source"), xxhash64(col("shingle")).as("h"))
    overlapKmvFromHashes(freeze(hashed, overlapArtifactPath(d)))
  }

  /** Sketch-side result row. Estimates are doubles (rounded for output
    * stability); `est_jaccard` carries ~1/√k standard error. */
  private case class PairEst(source_a: String, source_b: String,
      est_a: Double, est_b: Double, est_common: Double, est_jaccard: Double)

  /** Per-source KMV sketches → pairwise overlap estimates. The corpus is
    * touched ONCE (sketch aggregation, map-side combinable); everything
    * pairwise runs over the sources-sized sketch table. */
  def overlapKmv(ex: DataFrame, k: Int = KMinValues.DefaultK): DataFrame =
    pairEstimates(sketchTable(ex, k), k)

  /** [[overlapKmv]] over a pre-hashed (source, h) table (the frozen
    * artifact the registered entry serves from). */
  def overlapKmvFromHashes(hashed: DataFrame, k: Int = KMinValues.DefaultK): DataFrame =
    pairEstimates(sketchFromHashes(hashed, k), k)

  /** (source, sk) — one k-bounded KMV sketch per source. */
  def sketchTable(ex: DataFrame, k: Int = KMinValues.DefaultK): DataFrame =
    sketchFromHashes(ex.select(col("source"), xxhash64(col("shingle")).as("h")), k)

  /** Sketch aggregation over an explicit (source, h) hash table. */
  def sketchFromHashes(hashed: DataFrame, k: Int = KMinValues.DefaultK): DataFrame =
    hashed.groupBy(col("source"))
      .agg(KMinValues.kmv(k)(col("h")).as("sk"))

  /** Pairwise estimates over a sketch table. The arithmetic is a typed
    * `map` rather than column expressions — the frame is sources²-sized
    * control-plane data, never corpus data. */
  def pairEstimates(sketches: DataFrame, k: Int = KMinValues.DefaultK): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val flip = (x: Long) => x ^ Long.MinValue
    sketches.as("a").join(sketches.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("a.sk").as("ska"),
        col("b.source").as("sb"), col("b.sk").as("skb"))
      .as[(String, Seq[Long], String, Seq[Long])]
      .map { case (sa, ska, sb, skb) =>
        val union = (ska ++ skb).distinct.sortBy(flip).take(k)
        val (inA, inB) = (ska.toSet, skb.toSet)
        val m = union.count(x => inA(x) && inB(x))
        val jac = if (union.isEmpty) 0.0 else m.toDouble / union.size
        val estU = KMinValues.estimate(union, k)
        PairEst(sa, sb,
          math.rint(KMinValues.estimate(ska, k)),
          math.rint(KMinValues.estimate(skb, k)),
          math.rint(jac * estU),
          math.rint(jac * 1e6) / 1e6)
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Streaming sketch maintenance (foreachBatch partial-materializing sink)
  // ---------------------------------------------------------------------

  /** foreachBatch sink: sketch THIS micro-batch's documents per source and
    * write the per-batch sketch partial (overwrite per batch id — a
    * retried micro-batch replaces its own partial, never double-counts:
    * the [[TextOps.bm25IndexSink]] idempotence contract). Per-batch state
    * is sources × k longs; history is never rescanned. */
  def sketchSink(statePath: String)(batch: DataFrame, id: Long): Unit =
    sketchTable(sourceShingleTable(batch))
      .write.mode("overwrite").parquet(s"$statePath/sk/batch=$id")

  /** Serve pairwise overlap estimates from a [[sketchSink]] state
    * directory. KMV composes EXACTLY under union — the k smallest of
    * (k smallest of A ∪ k smallest of B) are the k smallest of A ∪ B —
    * so re-aggregating the per-batch sketch values per source yields the
    * identical sketch (and identical estimates) to a direct whole-corpus
    * pass, provided no document spans batches (shingles are per-doc).
    * OverlapStreamSpec pins served == direct EXACTLY after every chunk,
    * not within a tolerance. */
  def overlapServeFromState(s: SparkSession, statePath: String,
      k: Int = KMinValues.DefaultK): DataFrame = {
    val merged = s.read.parquet(s"$statePath/sk").drop("batch")
      .select(col("source"), explode(col("sk")).as("h"))
      .groupBy(col("source"))
      .agg(KMinValues.kmv(k)(col("h")).as("sk"))
    pairEstimates(merged, k)
  }
}
