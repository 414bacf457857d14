package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Crash-recovery twin for the streamed gram-index state (r15, VERDICT
  * r14 task 4). SubstringStreamSpec pins served == direct per chunk on
  * the happy path; this suite kills the maintenance at the two foreachBatch
  * crash windows — the sink's batch=<id> overwrite convention must make
  * both safe, exactly as it does for sketchSink / bm25IndexSink:
  *  - crash MID-WRITE of an epoch partial: the dead attempt leaves
  *    half-content files, a stale _temporary dir, and stray debris in the
  *    batch dir; the engine never committed the offset, so the restart
  *    re-delivers the epoch and the overwrite must replace the debris;
  *  - crash AFTER the partial write but BEFORE the engine's offset
  *    commit: the re-delivered epoch rewrites identical content — the
  *    served index must not change (and for the refcounted sink, a
  *    replayed PURGE epoch must not decrement twice).
  * As in DedupChaosSpec, the driver loop below IS the redelivery
  * semantics: sink(chunk, id) in order, plant the dead attempt, then
  * re-deliver the same epoch id. */
class GramChaosSpec extends AnyFunSuite {

  val d = "/root/testdata/sf0.001"

  private def plantDebris(batchDir: java.io.File): Unit = {
    new java.io.File(batchDir, "_temporary/0").mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(batchDir, "part-99999-dead-attempt").toPath,
      "not parquet")
    ()
  }

  test("gram index: crash mid-write of an epoch partial (debris on disk), " +
    "replay overwrites — served index and downstream dedup == direct build") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val chunks = (0 until 3).map(i => docs.filter(_._1 % 3 == i))
    val donorText = chunks.head.head._2
    val probe = Seq(
      (900001L, "probe preamble words " + donorText + " probe epilogue words"),
      (900002L, "entirely unique probe content sharing nothing with anyone")
    ).toDF("doc_id", "text")

    val statePath = Files.createTempDirectory("graft-gramchaos").toString + "/idx"
    Dedup.gramIndexSink(statePath)(chunks(0).toDF("doc_id", "text"), 0L)

    // dead attempt at epoch 1: half the chunk's grams got written, plus
    // a stale _temporary dir and a non-parquet stray from the kill
    val batchDir = new java.io.File(s"$statePath/grams/batch=1")
    Dedup.gramIndexSink(statePath)(
      chunks(1).filter(_._1 % 2 == 0).toDF("doc_id", "text"), 1L)
    plantDebris(batchDir)
    assert(new java.io.File(batchDir, "part-99999-dead-attempt").exists(),
      "fixture sanity: debris must be on disk before the replay")

    // restart: offset log never recorded epoch 1 → re-delivered in full
    Dedup.gramIndexSink(statePath)(chunks(1).toDF("doc_id", "text"), 1L)
    Dedup.gramIndexSink(statePath)(chunks(2).toDF("doc_id", "text"), 2L)
    assert(!new java.io.File(batchDir, "part-99999-dead-attempt").exists(),
      "replay must overwrite the dead attempt's debris")

    val published = chunks.flatten
    val served = Dedup.gramIndexFromState(spark, statePath)
      .distinct().collect().map(_.getString(0)).toSet
    val direct = Dedup.substringGrams(published.toDF("doc_id", "text"))
      .select(col("g")).distinct().collect().map(_.getString(0)).toSet
    assert(served == direct,
      "post-crash served gram set != direct build\n" +
        s"served-only: ${(served -- direct).take(3)}\n" +
        s"direct-only: ${(direct -- served).take(3)}")

    def dedupSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val servedDedup = dedupSet(Dedup.substringDedupFromIndex(
      Dedup.gramIndexFromState(spark, statePath), probe))
    val directDedup = dedupSet(Dedup.substringDedupIncremental(
      published.toDF("doc_id", "text"), probe))
    assert(servedDedup == directDedup,
      "downstream dedup through the recovered index != direct incremental")
    assert(servedDedup.exists(r => r._1 == 900001L && r._3 > 0L),
      "copied run not excised after recovery — fixture broken")
  }

  test("gram index: re-delivery of a COMMITTED epoch (crash before the " +
    "offset commit) leaves the served index unchanged") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (c0, c1) = docs.splitAt(docs.size / 2)
    val statePath = Files.createTempDirectory("graft-gramidem").toString + "/idx"
    Dedup.gramIndexSink(statePath)(c0.toDF("doc_id", "text"), 0L)
    Dedup.gramIndexSink(statePath)(c1.toDF("doc_id", "text"), 1L)
    val before = Dedup.gramIndexFromState(spark, statePath).collect()
      .map(_.getString(0)).sorted.toSeq
    Dedup.gramIndexSink(statePath)(c1.toDF("doc_id", "text"), 1L) // replay
    val after = Dedup.gramIndexFromState(spark, statePath).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(after == before, "replaying a committed epoch changed the index")
  }

  test("refcounted gram index: purge-epoch crash debris + replay does not " +
    "double-decrement; victim still stops excising") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (c0, c1) = docs.splitAt(docs.size / 2)
    val victimText = (0 until 20).map(i => "victim" + i).mkString(" ")
    val victim = (800001L, victimText)
    val probe = Seq(
      (900001L, "probe preamble words " + victimText + " probe epilogue words")
    ).toDF("doc_id", "text")

    val statePath = Files.createTempDirectory("graft-refgramchaos").toString + "/idx"
    val pub = lit("publish")
    Dedup.refGramIndexSink(statePath)(
      (c0 :+ victim).toDF("doc_id", "text").withColumn("op", pub), 0L)
    Dedup.refGramIndexSink(statePath)(
      c1.toDF("doc_id", "text").withColumn("op", pub), 1L)

    // dead attempt at the purge epoch: the full partial was written but
    // the offset never committed (plus kill debris) — the replay must
    // OVERWRITE, i.e. purge exactly once
    val purgeBatch = Seq((victim._1, victim._2, "purge")).toDF("doc_id", "text", "op")
    Dedup.refGramIndexSink(statePath)(purgeBatch, 2L)
    plantDebris(new java.io.File(s"$statePath/grams/batch=2"))
    Dedup.refGramIndexSink(statePath)(purgeBatch, 2L) // re-delivery

    val served = Dedup.refGramIndexFromState(spark, statePath).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val rebuilt = Dedup.substringGrams((c0 ++ c1).toDF("doc_id", "text"))
      .select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(served == rebuilt,
      "post-replay refcounts != rebuild from live corpus (double decrement?)\n" +
        s"served-only: ${(served -- rebuilt).take(3)}\n" +
        s"rebuilt-only: ${(rebuilt -- served).take(3)}")
    val removed = Dedup.substringDedupFromIndex(
        Dedup.refGramIndexFromState(spark, statePath).select(col("g")), probe)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(removed(900001L) == 0L,
      "purged victim's grams still excise after the replayed purge epoch")
  }
}
