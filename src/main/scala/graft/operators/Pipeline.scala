package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation: the operators of this library
  * composed the way a corpus-curation pass actually runs them. One query,
  * oracle-checked, proving the pieces compose without driver round-trips:
  *
  *   1. exact dedup — keep only each content group's representative
  *      ([[Dedup.qDedupExact]] keep table, left-semi joined);
  *   2. per-document signals — language ID, quality score, token count
  *      (all pure codegen'd projections from [[TextOps]]);
  *   3. quality filter;
  *   4. DETERMINISTIC per-language downsampling: the first two hex chars
  *      of md5(text) are a uniform [0, 256) bucket that both engines
  *      compute identically, so `bucket < threshold` is an exact,
  *      reproducible, content-keyed Bernoulli sample — 'en' keeps 1/2
  *      ('80'/'100'), 'ru' keeps 3/4 ('c0'), other languages keep all
  *      (every hex bucket < 'zz'). Content-keyed sampling survives
  *      re-partitioning, re-runs, and scale-out unchanged — the property
  *      that makes a 100 TB curation run resumable.
  *
  * Scale shape: signals and sampling are per-row projections (no shuffle);
  * the dedup keep-table join is the one shuffle, on doc_id. At cluster
  * scale the keep table is the output of the dedup stage read back from
  * storage — the join shape is identical.
  */
object Pipeline {

  def qTrainingMix(s: SparkSession, d: String): DataFrame = {
    val keep = Dedup.qDedupExact(s, d).select(col("keep_id").as("doc_id"))
    val lang = TextOps.qLangId(s, d).select(col("doc_id"), col("pred_lang"))
    val qual = TextOps.qQualityScore(s, d).select(col("doc_id"), col("quality"))
    val toks = TextOps.qTokenCount(s, d).select(col("doc_id"), col("ws_tokens"))
    val threshold = when(col("pred_lang") === "en", lit("80"))
      .when(col("pred_lang") === "ru", lit("c0"))
      .otherwise(lit("zz"))
    documents(s, d).select(col("doc_id"), col("text"))
      .join(keep, Seq("doc_id"), "left_semi")
      .join(lang, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(toks, Seq("doc_id"))
      .filter(col("quality") >= 0.05)
      .withColumn("sample_bucket", substring(md5(col("text").cast("binary")), 1, 2))
      .filter(col("sample_bucket") < threshold)
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        col("ws_tokens"), col("sample_bucket"))
  }
}
