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

  test("epoch commit log: a crash between sink write and checkpoint commit does not duplicate records") {
    // The Spark twin of the reference's HA no-dup bar
    // (flink_validation_passthrough_high_availability_spec.rb:101-133):
    // foreachBatch writes the sink, THEN the injected crash fires before
    // Spark can commit the epoch. On restart Spark replays the same epoch;
    // the EpochCommitLog must recognize it and skip, so every record key
    // lands in the sink EXACTLY once — counted, not just set-compared.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val ckpt = Files.createTempDirectory("graft-eo-ckpt").toString
    val commitDir = s"$ckpt/sink-commits"
    val input = MemoryStream[PipelineEvent]
    val tracker = new BatchTracker(PassthroughValidator, new MapBatchLookup(Seq.empty),
      "porcupine", 150L)
    val outputs = ValidationJob.pipeline(input.toDS(), tracker)
    val sink = new ConcurrentLinkedQueue[Output]()
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def start() = outputs.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .foreachBatch { (b: Dataset[Output], epochId: Long) =>
        if (epochId > ValidationJob.EpochCommitLog.lastCommitted(b.sparkSession, commitDir)) {
          val rows = b.collect()
          rows.foreach(sink.add)
          ValidationJob.EpochCommitLog.commit(b.sparkSession, commitDir, epochId)
          if (rows.nonEmpty && crashArmed.getAndSet(false))
            throw new RuntimeException("injected crash: sink written, epoch uncommitted")
        } else {
          b.foreach(_ => ()) // drain partitions on replay, write nothing
        }
      }
      .start()

    def sunkKeys(): Seq[Int] = sink.asScala.toSeq
      .filter(_.tag == Output.Valid).map(o => new String(o.record.get.key, UTF_8).toInt)

    // Epoch 1: records 1..8 flow, then the crash fires AFTER the sink write.
    val q1 = start()
    input.addData(PipelineEvent.of(notif(Started), 0) +:
      (1 to 8).map(i => PipelineEvent.of(rec(i), i.toLong)): _*)
    await(() => sink.asScala.toSeq)(_ => sunkKeys().size >= 8)
    crashArmed.set(true)
    input.addData((9 to 12).map(i => PipelineEvent.of(rec(i), i.toLong)): _*)
    await(() => sink.asScala.toSeq)(_ => sunkKeys().size >= 12) // the doomed epoch still wrote its rows
    // the query dies on the injected exception (poll until it's gone)
    val deadline = System.currentTimeMillis() + 30000
    while (q1.isActive && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(!q1.isActive, "injected crash must kill the query")

    // Restart: Spark replays the uncommitted epoch — the commit log must
    // swallow it. Then finish the batch.
    val q2 = start()
    input.addData((13 to 15).map(i => PipelineEvent.of(rec(i), i.toLong)): _*)
    input.addData(PipelineEvent.of(notif(SendCompleted, Some(15)), 16))
    try {
      val done = await(() => sink.asScala.toSeq)(r =>
        r.count(o => o.tag == Output.Notification &&
          o.notification.exists(_.status == Completed)) > 0)
      val keys = sunkKeys()
      assert(keys.sorted == (1 to 15).toList,
        s"duplicate or lost records after epoch replay: ${keys.sorted}")
      val completed = done.filter(o => o.tag == Output.Notification)
        .flatMap(_.notification).filter(_.status == Completed)
      assert(completed.map(_.recordCount).distinct == Seq(Some(15)))
    } finally q2.stop()
  }
}
