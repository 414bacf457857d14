package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Streaming twin for the REFCOUNTED (purge-aware) gram index (r15,
  * VERDICT r14 task 2): a stream of publish/purge document epochs drained
  * through [[Dedup.refGramIndexSink]] must serve, after EVERY epoch —
  * including the purge epoch — exactly the index rebuilt from the
  * documents live at that point, with no state rebuild and no history
  * rescan. The behavioral point of the purge: a purged document's grams
  * must STOP excising future text (the additive-only gramIndexSink's RTBF
  * gap), while grams still carried by live documents keep excising. A
  * replayed purge epoch must not decrement twice. */
class RefGramStreamSpec extends AnyFunSuite {

  test("publish/purge epochs: served == rebuilt-from-live after every " +
    "epoch; purged donor stops excising; purge replay is idempotent") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val chunk0 = docs.filter(_._1 % 2 == 0)
    val chunk1 = docs.filter(_._1 % 2 == 1)
    // synthetic victim: unique >= SubstringK-token payload, published in
    // epoch 0 and purged in epoch 2 — its grams exist in NO other doc, so
    // the excision flip is deterministic
    val victimText = (0 until 20).map(i => "victim" + i).mkString(" ")
    val victim = (800001L, victimText)
    // a live donor from chunk1 (stays published) for the counter-check
    val donorText = chunk1.filter(_._2.trim.split("\\s+").length >= 30).head._2
    val probe = Seq(
      (900001L, "probe preamble words " + victimText + " probe epilogue words"),
      (900002L, "probe preamble words " + donorText + " probe epilogue words"),
      (900003L, "entirely unique probe content sharing nothing with anyone")
    ).toDF("doc_id", "text")

    val epochs = Seq(
      (chunk0 :+ victim).map { case (id, t) => (id, t, "publish") },
      chunk1.map { case (id, t) => (id, t, "publish") },
      Seq((victim._1, victim._2, "purge")))
    // documents live after each epoch
    val liveAfter = Seq(chunk0 :+ victim, chunk0 ++ chunk1 :+ victim,
      chunk0 ++ chunk1)

    val statePath = Files.createTempDirectory("graft-refgramidx").toString + "/idx"
    val input = MemoryStream[(Long, String, String)]
    val query = input.toDF().toDF("doc_id", "text", "op").writeStream
      .outputMode("update")
      .queryName("refgramidx_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .foreachBatch(Dedup.refGramIndexSink(statePath) _)
      .start()

    def servedSet(): Set[(String, Long)] =
      Dedup.refGramIndexFromState(spark, statePath).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    def rebuiltSet(live: Seq[(Long, String)]): Set[(String, Long)] =
      Dedup.substringGrams(live.toDF("doc_id", "text"))
        .select(col("doc_id"), col("g")).distinct()
        .groupBy(col("g")).agg(count(lit(1)).as("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    def removedByProbe(): Map[Long, Long] =
      Dedup.substringDedupFromIndex(
          Dedup.refGramIndexFromState(spark, statePath).select(col("g")), probe)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    try {
      epochs.zip(liveAfter).zipWithIndex.foreach { case ((epoch, live), i) =>
        input.addData(epoch: _*)
        query.processAllAvailable()
        val served = servedSet()
        val rebuilt = rebuiltSet(live)
        assert(served == rebuilt,
          s"after epoch $i: served refcounts != rebuilt-from-live\n" +
            s"served-only: ${(served -- rebuilt).take(3)}\n" +
            s"rebuilt-only: ${(rebuilt -- served).take(3)}")
      }
      // the victim was purged: its copied run must no longer excise; the
      // live donor's run still must; the unique probe is untouched
      val removed = removedByProbe()
      assert(removed(900001L) == 0L,
        "purged victim's grams still excise the probe — deletion did not propagate")
      assert(removed(900002L) > 0L,
        "live donor's run must still excise (purge removed too much)")
      assert(removed(900003L) == 0L, "unique probe doc must stay intact")
      // before the purge the victim's run WAS excised (flip has teeth):
      // rebuild the pre-purge check from the first two partials alone
      val prePurge = spark.read
        .parquet(s"$statePath/grams/batch=0", s"$statePath/grams/batch=1")
        .groupBy(col("g")).agg(sum(col("delta")).as("cnt"))
        .filter(col("cnt") > 0).select(col("g"))
      val removedPre = Dedup.substringDedupFromIndex(prePurge, probe)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(removedPre(900001L) > 0L,
        "victim's run was never excised pre-purge — fixture broken")
      // replaying the purge epoch (a retry) must overwrite its partial,
      // not decrement a second time
      val before = servedSet()
      Dedup.refGramIndexSink(statePath)(
        epochs(2).toDF("doc_id", "text", "op"), 2L)
      assert(servedSet() == before, "purge replay decremented twice")
    } finally query.stop()
  }
}
