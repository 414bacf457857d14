package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline tests — the Spark twin of the reference's embedded
  * MiniCluster tests (PassthroughStreamingJobIntTest.java:61-108 happy path
  * and :110-155 zero-record batch), driven through MemoryStream with a
  * 100 ms completion delay. */
class ValidationJobSpec extends AnyFunSuite {

  import BatchStatus._
  import StreamFixture._

  val Topic = "ingest.porcupine.data-int1.in"
  val BatchId = "batch-42"

  def notif(status: String, expected: Option[Int] = None): BatchNotification =
    BatchNotification(BatchId, "TestBatchName", status, "procedure",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic, 5)

  def rec(key: String): HriRecord =
    HriRecord(
      Seq(HriHeader("batchId", BatchId.getBytes(UTF_8)),
        HriHeader("passThru", "PassThruHeaderValue".getBytes(UTF_8))),
      key.getBytes(UTF_8), "message body".getBytes(UTF_8), Topic, 1, 1234L)

  test("end-to-end happy path: started → 1 record → sendCompleted → completed after delay") {
    runPipeline(completionDelayMs = 100L) { (input, results) =>
      val t0 = System.currentTimeMillis()
      input.addData(
        PipelineEvent.of(notif(Started), 0),
        PipelineEvent.of(rec("hriRec01"), 1),
        PipelineEvent.of(notif(SendCompleted, Some(1)), 2))
      val out = await(results)(r => notifs(r).exists(_.status == Completed))
      val elapsed = System.currentTimeMillis() - t0

      // valid record fidelity: key, body, and full header set preserved
      val vs = valids(out)
      assert(vs.size == 1)
      assert(new String(vs.head.key, UTF_8) == "hriRec01")
      assert(new String(vs.head.value, UTF_8) == "message body")
      assert(vs.head.headers.map(h => h.key -> new String(h.value, UTF_8)) ==
        Seq("batchId" -> BatchId, "passThru" -> "PassThruHeaderValue"))

      // completed notification carries the counts
      val ns = notifs(out)
      assert(ns.map(_.status) == Seq(Completed))
      assert(ns.head.recordCount.contains(1))
      assert(ns.head.expectedRecordCount.contains(1))
      assert(ns.head.id == BatchId)

      // completion-delay lower bound (kafka_record_validator.rb:67-71)
      assert(elapsed >= 100L, s"completed after ${elapsed}ms < 100ms delay")

      assert(invalids(out).isEmpty)
    }
  }

  test("zero-record batch: sendCompleted with no records emits nothing (reference NoOp)") {
    runPipeline(completionDelayMs = 100L) { (input, results) =>
      input.addData(
        PipelineEvent.of(notif(Started), 0),
        PipelineEvent.of(notif(SendCompleted, Some(1)), 1))
      Thread.sleep(1000) // several delay windows + triggers
      val out = results()
      assert(valids(out).isEmpty)
      assert(invalids(out).isEmpty)
      assert(notifs(out).isEmpty) // countResultList.size() == 0 in the reference
    }
  }
}
