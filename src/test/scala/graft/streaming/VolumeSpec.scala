package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Volume soak: the reference's E2E budgets are trivial (15 records in
  * 60 s); this drives 50 000 records across 10 concurrent batches through
  * the full pipeline and requires exact counts. Evidence that per-key
  * serial state processing and the Append output path hold up at volume,
  * not just on toy scenarios. */
class VolumeSpec extends AnyFunSuite {

  import BatchStatus._
  import StreamFixture._

  val Topic = "ingest.porcupine.data-int1.in"

  def notif(b: String, status: String, expected: Option[Int] = None): BatchNotification =
    BatchNotification(b, b, status, "procedure",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic)

  test("hot batch: 30k records through ONE batchId — per-key serialization bound, exact count") {
    // SURVEY §7.4: per-key serial state processing bounds single-batch
    // throughput to ~one core. This soak pins the behavior (exact count,
    // completes) and records the measured single-key rate — the evidence
    // line for the documented salted two-level refinement trigger.
    runPipeline(completionDelayMs = 300L) { (input, results) =>
      val b = "hot-batch"
      val n = 30000
      val t0 = System.currentTimeMillis()
      input.addData(PipelineEvent.of(notif(b, Started), 0))
      (0 until 3).foreach { chunk =>
        input.addData((0 until n / 3).map { j =>
          val key = chunk * 10000 + j
          PipelineEvent.of(HriRecord(
            Seq(HriHeader("batchId", b.getBytes(UTF_8))),
            key.toString.getBytes(UTF_8),
            s"""{"n":$key}""".getBytes(UTF_8), Topic, 0, key.toLong), key.toLong + 10)
        }: _*)
      }
      input.addData(PipelineEvent.of(notif(b, SendCompleted, Some(n)), 1000000L))
      val out = await(results, timeoutMs = 120000)(
        r => notifs(r).exists(_.status == Completed))
      val secs = (System.currentTimeMillis() - t0) / 1000.0
      info(f"single-key throughput: ${n / secs}%.0f records/s ($secs%.1f s wall)")
      val done = notifs(out).filter(_.status == Completed)
      assert(done.map(_.recordCount) == Seq(Some(n)))
      assert(valids(out).size == n && invalids(out).isEmpty)
    }
  }

  test("50k records / 10 concurrent batches: exact counts, all completed") {
    runPipeline(completionDelayMs = 300L) { (input, results) =>
      val batches = (0 until 10).map(i => s"vol-batch-$i")
      val perBatch = 5000
      val t0 = System.currentTimeMillis()
      input.addData(batches.map(b => PipelineEvent.of(notif(b, Started), 0)): _*)
      // records arrive in 5 chunks, round-robin across batches
      (0 until 5).foreach { chunk =>
        val evs = (0 until perBatch / 5 * 10).map { j =>
          val b = batches(j % 10)
          val key = chunk * 10000 + j
          PipelineEvent.of(HriRecord(
            Seq(HriHeader("batchId", b.getBytes(UTF_8))),
            key.toString.getBytes(UTF_8),
            s"""{"n":$key}""".getBytes(UTF_8), Topic, 0, key.toLong), key.toLong + 10)
        }
        input.addData(evs: _*)
      }
      input.addData(batches.map(b =>
        PipelineEvent.of(notif(b, SendCompleted, Some(perBatch)), 1000000L)): _*)

      val out = await(results, timeoutMs = 120000)(
        r => notifs(r).count(_.status == Completed) == 10)
      val secs = (System.currentTimeMillis() - t0) / 1000.0
      info(f"50k records through the pipeline in $secs%.1f s (incl. 0.3 s completion delay)")

      val done = notifs(out).filter(_.status == Completed)
      assert(done.size == 10, s"completed: ${notifs(out).map(n => n.id -> n.status)}")
      assert(done.forall(_.recordCount.contains(perBatch)))
      assert(valids(out).size == 50000)
      assert(invalids(out).isEmpty)
      assert(secs < 90, s"volume run took $secs s") // generous bound vs 60 s reference budget
    }
  }
}
