package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The seven black-box scenarios of the reference's RSpec suite
  * (test/spec/flink_validation_passthrough_spec.rb), replayed end-to-end
  * over MemoryStream (no live Kafka in this environment, SURVEY §5.3).
  * Fixture shapes mirror test_data/mixed_records.txt: NDJSON bodies with
  * non-ASCII UTF-8, some with a deliberate "Bundul" typo — the passthrough
  * pipeline forwards ALL of them verbatim. */
class ScenarioSpec extends AnyFunSuite {

  import BatchStatus._
  import StreamFixture._

  val Topic = "ingest.porcupine.data-int1.in"

  /** NDJSON in the shape of mixed_records.txt (FIXTURES A.1) — including
    * the Cyrillic address line and, for odd keys, the "Bundul" typo. */
  def body(i: Int): String = {
    val resourceType = if (i % 2 == 1) "Bundul" else "Bundle"
    s"""{"resourceType":"$resourceType","type":"collection","entry":[{"resource":{"resourceType":"Practitioner","identifier":[{"value":"100027$i"}],"name":[{"given":["Dr. Test $i, MD"]}],"address":[{"line":["БВГДЖЗИЙЛ"],"postalCode":"8033"}]}}]}"""
  }

  def notif(batch: String, status: String, expected: Option[Int] = None): BatchNotification =
    BatchNotification(batch, s"valid-batch-БВГДЖЗИЙЛ-$batch", status,
      "hri-flink-validation-passthrough-batch-あいうえおか",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic,
      invalidThreshold = -1, metadata = Some("""{"test":"ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ"}"""))

  def rec(key: Int, batch: String): HriRecord =
    HriRecord(
      Seq(HriHeader("batchId", batch.getBytes(UTF_8)),
        HriHeader("testUtf8あいうえおか", "あいうえおか".getBytes(UTF_8))),
      key.toString.getBytes(UTF_8), body(key).getBytes(UTF_8), Topic, 0, key.toLong)

  test("scenario 1: all records pass through with same key, headers, and body — no validation") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val b = "spec-batch-1"
      val evs = PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 15).map(i => PipelineEvent.of(rec(i, b), i.toLong)) :+
        PipelineEvent.of(notif(b, SendCompleted, Some(15)), 16)
      input.addData(evs: _*)
      val out = await(results)(r => notifs(r).exists(_.status == Completed))

      val vs = valids(out)
      assert(vs.map(r => new String(r.key, UTF_8)).sorted == (1 to 15).map(_.toString).sorted)
      vs.foreach { r =>
        val k = new String(r.key, UTF_8).toInt
        assert(new String(r.value, UTF_8) == body(k)) // body verbatim, typo included
        assert(r.headers.map(h => h.key -> new String(h.value, UTF_8)).toSet ==
          Set("batchId" -> b, "testUtf8あいうえおか" -> "あいうえおか")) // no extra headers
      }
      val done = notifs(out).filter(_.status == Completed)
      assert(done.map(_.recordCount) == Seq(Some(15)))
      assert(done.head.name == s"valid-batch-БВГДЖЗИЙЛ-$b") // batch fields echoed
      assert(done.head.metadata.contains("""{"test":"ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ"}"""))
      assert(invalids(out).isEmpty)
    }
  }

  test("scenario 2: two interleaved batches complete independently with correct counts") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val (b1, b2) = ("spec-batch-2a", "spec-batch-2b")
      val evs =
        Seq(PipelineEvent.of(notif(b1, Started), 0), PipelineEvent.of(notif(b2, Started), 1)) ++
          (1 to 15).flatMap(i => Seq(
            PipelineEvent.of(rec(i, b1), 2L * i),
            PipelineEvent.of(rec(i, b2), 2L * i + 1))) ++
          Seq(PipelineEvent.of(notif(b1, SendCompleted, Some(15)), 100),
            PipelineEvent.of(notif(b2, SendCompleted, Some(15)), 101))
      input.addData(evs: _*)
      val out = await(results)(r => notifs(r).count(_.status == Completed) == 2)
      val done = notifs(out).filter(_.status == Completed)
      assert(done.map(_.id).sorted == Seq(b1, b2))
      assert(done.forall(_.recordCount.contains(15)))
      // each output record kept its own batch's header
      val byBatch = valids(out).groupBy(_.batchId.get)
      assert(byBatch.keySet == Set(b1, b2) && byBatch.values.forall(_.size == 15))
    }
  }

  test("parallelism (X2): 20 interleaved batches process concurrently across partitions, all isolated") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val batches = (1 to 20).map(i => s"px-batch-$i")
      var seq = 0L
      def next = { seq += 1; seq }
      val evs = batches.map(b => PipelineEvent.of(notif(b, Started), next)) ++
        (1 to 20).flatMap(k => batches.map(b => PipelineEvent.of(rec(k, b), next))) ++
        batches.map(b => PipelineEvent.of(notif(b, SendCompleted, Some(20)), next))
      input.addData(evs: _*)
      val out = await(results)(r => notifs(r).count(_.status == Completed) == 20)
      val done = notifs(out).filter(_.status == Completed)
      assert(done.map(_.id).sorted == batches.sorted)
      assert(done.forall(_.recordCount.contains(20)), s"counts leaked across keys: ${done.map(n => n.id -> n.recordCount)}")
      assert(valids(out).size == 400)
      assert(valids(out).groupBy(_.batchId.get).forall(_._2.size == 20))
    }
  }

  test("scenario 3: terminate mid-batch stops forwarding to the out topic") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val b = "spec-batch-3"
      input.addData(PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 10).map(i => PipelineEvent.of(rec(i, b), i.toLong)): _*)
      await(results)(r => valids(r).size == 10)
      input.addData(PipelineEvent.of(notif(b, Terminated), 11) +:
        (11 to 15).map(i => PipelineEvent.of(rec(i, b), i.toLong + 1)): _*)
      val out = await(results)(r => invalids(r).size == 5)
      assert(valids(out).size == 10) // exactly the pre-terminate records
      assert(notifs(out).isEmpty)    // job emits nothing; statuses end at terminated
    }
  }

  test("scenario 4: records with an unknown batchId go to invalid with the exact message") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      input.addData((1 to 15).map(i => PipelineEvent.of(rec(i, "rspecUnknownBatch"), i.toLong)): _*)
      val out = await(results)(r => invalids(r).size == 15)
      assert(valids(out).isEmpty)
      invalids(out).foreach { r =>
        assert(new String(r.value, UTF_8) == """{"failure":"Bad Message - Unknown batchId"}""")
        assert(r.batchId.contains("rspecUnknownBatch")) // headers preserved
      }
    }
  }

  test("scenario 5: overcount before sendCompleted → all records forward, then failed") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val b = "spec-batch-5"
      val evs = PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 15).map(i => PipelineEvent.of(rec(i, b), i.toLong)) :+
        PipelineEvent.of(notif(b, SendCompleted, Some(5)), 16)
      input.addData(evs: _*)
      val out = await(results)(r => notifs(r).exists(_.status == Failed))
      assert(valids(out).size == 15) // spec.rb:292-318: the out topic still gets 15
      assert(notifs(out).map(_.status) == Seq(Failed))
    }
  }

  test("scenario 6: overcount after sendCompleted within the window → forwarded AND failed") {
    runPipeline(completionDelayMs = 5000L) { (input, results) =>
      val b = "spec-batch-6"
      val evs = PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 15).map(i => PipelineEvent.of(rec(i, b), i.toLong)) :+
        PipelineEvent.of(notif(b, SendCompleted, Some(15)), 16)
      input.addData(evs: _*)
      await(results)(r => valids(r).size == 15)
      input.addData(PipelineEvent.of(rec(16, b), 17))
      val out = await(results)(r => notifs(r).exists(_.status == Failed))
      assert(valids(out).size == 16) // spec.rb:320-356: 16 records on out
      assert(notifs(out).map(_.status) == Seq(Failed))
    }
  }

  test("undercount at timeout: fewer records than expected when the delay expires → failed (documented choice)") {
    // The one edge the reference's specs never exercise (SURVEY §2.3 cl. 8):
    // sendCompleted(expected=5) but only 3 records ever arrive. This
    // pipeline emits `failed` with the actual recordCount when the
    // completion delay expires — pinned here so the decision is held by a
    // test, not a comment.
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val b = "spec-batch-undercount"
      val evs = PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 3).map(i => PipelineEvent.of(rec(i, b), i.toLong)) :+
        PipelineEvent.of(notif(b, SendCompleted, Some(5)), 4)
      input.addData(evs: _*)
      val out = await(results)(r => notifs(r).exists(_.status == Failed))
      assert(valids(out).size == 3) // the records that did arrive still forwarded
      val failed = notifs(out).filter(_.status == Failed)
      assert(failed.map(_.recordCount) == Seq(Some(3)))
      assert(failed.head.expectedRecordCount.contains(5))
    }
  }

  test("scenario 7: records after completed go to invalid; batch stays completed") {
    runPipeline(completionDelayMs = 200L) { (input, results) =>
      val b = "spec-batch-7"
      val evs = PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 15).map(i => PipelineEvent.of(rec(i, b), i.toLong)) :+
        PipelineEvent.of(notif(b, SendCompleted, Some(15)), 16)
      input.addData(evs: _*)
      val afterComplete = await(results)(r => notifs(r).exists(_.status == Completed))
      assert(notifs(afterComplete).map(_.status) == Seq(Completed))

      input.addData((16 to 30).map(i => PipelineEvent.of(rec(i, b), i.toLong + 1)): _*)
      val out = await(results)(r => invalids(r).size == 15)
      assert(valids(out).size == 15)                      // no new out records
      assert(notifs(out).map(_.status) == Seq(Completed)) // no failed — stays completed
    }
  }
}
