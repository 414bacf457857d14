package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Fault-tolerance parity (SURVEY §2.2 X1): the reference's HA chaos spec
  * kills the job mid-batch and requires the batch to still complete with
  * every record counted exactly once. The Spark analogue: stop the
  * streaming query mid-lifecycle and restart from the SAME checkpoint via
  * foreachBatch (the sink shape production uses — the memory sink does not
  * support recovery). State (the per-batch counts) must be restored so the
  * final `completed` notification carries the FULL count: the sink is
  * at-least-once, but state+offsets commit atomically, so counts never
  * double even when an in-flight micro-batch replays. */
class RecoverySpec extends AnyFunSuite {

  import BatchStatus._
  import StreamFixture._

  val Topic = "ingest.porcupine.data-int1.in"
  val BatchId = "ha-batch"

  def notif(status: String, expected: Option[Int] = None): BatchNotification =
    BatchNotification(BatchId, "HaBatch", status, "procedure",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic)

  def rec(key: Int): HriRecord =
    HriRecord(Seq(HriHeader("batchId", BatchId.getBytes(UTF_8))),
      key.toString.getBytes(UTF_8), s"body-$key".getBytes(UTF_8), Topic, 0, key.toLong)

  test("state survives a stop/restart from checkpoint: batch completes with the full count") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val ckpt = Files.createTempDirectory("graft-ha-ckpt").toString
    val input = MemoryStream[PipelineEvent]
    val tracker = new BatchTracker(PassthroughValidator, new MapBatchLookup(Seq.empty),
      "porcupine", 150L)
    val outputs = ValidationJob.pipeline(input.toDS(), tracker)
    val collected = new ConcurrentLinkedQueue[Output]()

    def start() = outputs.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .foreachBatch { (b: Dataset[Output], _: Long) =>
        b.collect().foreach(collected.add)
      }
      .start()

    def snapshot(): Seq[Output] = collected.asScala.toSeq

    // Phase 1: seed the batch and half the records, then kill the query.
    // (processAllAvailable never settles under ProcessingTimeTimeout —
    // the operator keeps scheduling batches for timers — so poll.)
    val q1 = start()
    input.addData(PipelineEvent.of(notif(Started), 0) +:
      (1 to 8).map(i => PipelineEvent.of(rec(i), i.toLong)): _*)
    await(() => snapshot())(r => valids(r).size >= 8)
    q1.stop() // "pod kill"

    // Phase 2: restart from the same checkpoint; counts must be restored —
    // 7 more records + sendCompleted(15) completes with recordCount 15.
    input.addData((9 to 15).map(i => PipelineEvent.of(rec(i), i.toLong)): _*)
    input.addData(PipelineEvent.of(notif(SendCompleted, Some(15)), 16))
    val q2 = start()
    val out = await(() => snapshot())(r => notifs(r).exists(_.status == Completed))
    try {
      val done = notifs(out).filter(_.status == Completed)
      assert(done.map(_.recordCount).distinct == Seq(Some(15)),
        s"restored state lost counts: $done")
      // At-least-once sink: an in-flight micro-batch may replay after the
      // restart, but the DEDUPED key set must be exactly 1..15 — state
      // itself never double-counts (recordCount above is the proof).
      val keys = valids(out).map(r => new String(r.key, UTF_8).toInt)
      assert(keys.toSet == (1 to 15).toSet, s"lost/foreign records: ${keys.sorted}")
      assert(notifs(out).count(_.status == Failed) == 0)
    } finally q2.stop()
  }
}
