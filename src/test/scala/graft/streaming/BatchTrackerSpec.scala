package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the §2.3 state machine, one per clause, run against
  * Spark's TestGroupState (no streaming query needed). Scenario evidence is
  * cited in BatchTracker's scaladoc. */
class BatchTrackerSpec extends AnyFunSuite {

  import BatchStatus._

  val Topic = "ingest.porcupine.data-int1.in"
  val BatchId = "batch-42"

  def notif(status: String, expected: Option[Int] = None, threshold: Int = -1): BatchNotification =
    BatchNotification(BatchId, "TestBatchName", status, "procedure",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic, threshold,
      None, Some("""{"test":"meta"}"""))

  def rec(key: String = "hriRec01", batch: String = BatchId): HriRecord =
    HriRecord(Seq(HriHeader("batchId", batch.getBytes(UTF_8))),
      key.getBytes(UTF_8), "message body".getBytes(UTF_8), Topic, 1, 1234L)

  val rejectAll: Validator = new Validator {
    def isValid(r: HriRecord) = (false, Some("bad record"))
  }

  def tracker(
      validator: Validator = PassthroughValidator,
      known: Seq[BatchNotification] = Seq(notif(Started)),
      delayMs: Long = 100L): BatchTracker =
    new BatchTracker(validator, new MapBatchLookup(known), "porcupine", delayMs)

  def freshState(p: Option[BatchProgress] = None, timedOut: Boolean = false): TestGroupState[BatchProgress] =
    TestGroupState.create[BatchProgress](
      p.map(Optional.of[BatchProgress]).getOrElse(Optional.empty[BatchProgress]()),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty[Long](), timedOut)

  def run(t: BatchTracker, state: TestGroupState[BatchProgress], evs: PipelineEvent*): Seq[Output] =
    t.trackBatch(BatchId, evs.iterator, state).toSeq

  def failureMessage(o: Output): String = {
    val v = new String(o.record.get.value, UTF_8)
    val m = """\{"failure":"(.+)"\}""".r
    v match { case m(msg) => msg; case other => fail(s"not a failure body: $other") }
  }

  test("clause 1: started notification seeds state, emits nothing") {
    val st = freshState()
    val out = run(tracker(), st, PipelineEvent.of(notif(Started), 0))
    assert(out.isEmpty)
    assert(st.get.status == Started)
    assert(st.get.validCount == 0)
  }

  test("clause 2: record for unknown batch → invalid with exact message, no state") {
    val st = freshState()
    val out = run(tracker(known = Seq.empty), st, PipelineEvent.of(rec(), 0))
    assert(out.map(_.tag) == Seq(Output.Invalid))
    assert(failureMessage(out.head) == "Bad Message - Unknown batchId")
    assert(!st.exists) // each unknown record re-looks-up
    val hdrs = out.head.record.get.headers
    assert(hdrs.exists(h => h.key == "batchId" && new String(h.value, UTF_8) == BatchId))
  }

  test("clause 2: state-miss with successful lookup seeds state and processes the record") {
    val st = freshState()
    val out = run(tracker(), st, PipelineEvent.of(rec(), 0))
    assert(out.map(_.tag) == Seq(Output.Valid))
    assert(st.get.status == Started)
    assert(st.get.validCount == 1)
  }

  test("clause 3: valid records forward unchanged and count; key/body/headers preserved") {
    val st = freshState()
    val out = run(tracker(), st,
      PipelineEvent.of(notif(Started), 0),
      PipelineEvent.of(rec("k1"), 1), PipelineEvent.of(rec("k2"), 2))
    assert(out.map(_.tag) == Seq(Output.Valid, Output.Valid))
    assert(new String(out.head.record.get.key, UTF_8) == "k1")
    assert(new String(out.head.record.get.value, UTF_8) == "message body")
    assert(st.get.validCount == 2)
  }

  test("clause 3: invalid records wrap {failure: msg}, count separately") {
    val st = freshState()
    val out = run(tracker(validator = rejectAll), st,
      PipelineEvent.of(notif(Started), 0), PipelineEvent.of(rec(), 1))
    assert(out.map(_.tag) == Seq(Output.Invalid))
    assert(failureMessage(out.head) == "bad record")
    assert(st.get.invalidCount == 1 && st.get.validCount == 0)
  }

  test("O9: invalid count exceeding threshold fails the batch once") {
    val st = freshState()
    val evs = PipelineEvent.of(notif(Started, threshold = 2), 0) +:
      (1 to 4).map(i => PipelineEvent.of(rec(s"k$i"), i.toLong))
    val out = run(tracker(validator = rejectAll,
      known = Seq(notif(Started, threshold = 2))), st, evs: _*)
    val notifs = out.filter(_.tag == Output.Notification)
    assert(notifs.map(_.notification.get.status) == Seq(Failed))
    assert(out.count(_.tag == Output.Invalid) == 4)
    assert(st.get.status == Failed)
  }

  test("O9: threshold -1 disables the invalid check") {
    val st = freshState()
    val evs = PipelineEvent.of(notif(Started), 0) +:
      (1 to 10).map(i => PipelineEvent.of(rec(s"k$i"), i.toLong))
    val out = run(tracker(validator = rejectAll), st, evs: _*)
    assert(out.count(_.tag == Output.Notification) == 0)
  }

  test("clause 4/9: terminate stops forwarding; later records go to invalid") {
    val st = freshState()
    val out = run(tracker(), st,
      PipelineEvent.of(notif(Started), 0),
      PipelineEvent.of(rec("k1"), 1),
      PipelineEvent.of(notif(Terminated), 2),
      PipelineEvent.of(rec("k2"), 3))
    assert(out.map(_.tag) == Seq(Output.Valid, Output.Invalid))
    assert(st.get.status == Terminated)
  }

  test("clause 5: record after completed → invalid, batch stays completed") {
    val completed = BatchProgress(notif(Completed, Some(1)), Completed, 1, 0, Some(1),
      failedEmitted = false, completedEmitted = true)
    val st = freshState(Some(completed))
    val out = run(tracker(), st, PipelineEvent.of(rec("late"), 0))
    assert(out.map(_.tag) == Seq(Output.Invalid))
    assert(st.get.status == Completed) // does NOT flip to failed
    assert(out.count(_.tag == Output.Notification) == 0)
  }

  test("clause 6: overcount before sendCompleted — all records forward, failed at sendCompleted") {
    val st = freshState()
    val evs = PipelineEvent.of(notif(Started), 0) +:
      (1 to 15).map(i => PipelineEvent.of(rec(s"k$i"), i.toLong)) :+
      PipelineEvent.of(notif(SendCompleted, Some(5)), 16)
    val out = run(tracker(), st, evs: _*)
    assert(out.count(_.tag == Output.Valid) == 15) // spec.rb:292-318: 15 on out
    val notifs = out.filter(_.tag == Output.Notification)
    assert(notifs.map(_.notification.get.status) == Seq(Failed))
  }

  test("clause 7: overcount after sendCompleted — record forwards AND batch fails") {
    val st = freshState()
    val out = run(tracker(), st,
      PipelineEvent.of(notif(Started), 0),
      PipelineEvent.of(rec("k1"), 1),
      PipelineEvent.of(notif(SendCompleted, Some(1)), 2),
      PipelineEvent.of(rec("k2"), 3))
    assert(out.count(_.tag == Output.Valid) == 2) // spec.rb:320-356: 16 of 16 on out
    assert(out.filter(_.tag == Output.Notification).map(_.notification.get.status) == Seq(Failed))
  }

  test("clause 6/8: sendCompleted with exact count arms the timer, no immediate completed") {
    val st = freshState()
    val out = run(tracker(), st,
      PipelineEvent.of(notif(Started), 0),
      PipelineEvent.of(rec("k1"), 1),
      PipelineEvent.of(notif(SendCompleted, Some(1)), 2))
    assert(out.count(_.tag == Output.Notification) == 0) // completed only after delay
    assert(st.getTimeoutTimestampMs.isPresent) // timer armed
  }

  test("clause 8: timeout with count == expected emits completed with recordCount") {
    val p = BatchProgress(notif(SendCompleted, Some(2)), SendCompleted, 2, 0, Some(2),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p), timedOut = true)
    val out = run(tracker(), st)
    val n = out.filter(_.tag == Output.Notification).map(_.notification.get)
    assert(n.map(_.status) == Seq(Completed))
    assert(n.head.recordCount.contains(2))
    assert(n.head.expectedRecordCount.contains(2))
    assert(n.head.name == "TestBatchName") // batch fields echo back
    assert(n.head.metadata.contains("""{"test":"meta"}"""))
    assert(st.get.status == Completed)
  }

  test("clause 8: timeout with zero records emits nothing (reference NoOp)") {
    val p = BatchProgress(notif(SendCompleted, Some(1)), SendCompleted, 0, 0, Some(1),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p), timedOut = true)
    val out = run(tracker(), st)
    assert(out.isEmpty) // PassthroughStreamingJobIntTest noSentRecordsTest
  }

  test("clause 8: timeout undercount (0 < count < expected) fails — documented choice") {
    val p = BatchProgress(notif(SendCompleted, Some(5)), SendCompleted, 3, 0, Some(5),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p), timedOut = true)
    val out = run(tracker(), st)
    assert(out.filter(_.tag == Output.Notification).map(_.notification.get.status) == Seq(Failed))
  }

  test("out-of-order control plane: sendCompleted before started still completes correctly") {
    val st = freshState()
    val out = run(tracker(), st,
      PipelineEvent.of(notif(SendCompleted, Some(2)), 0), // arrives first (mgmt race)
      PipelineEvent.of(rec("k1"), 1),
      PipelineEvent.of(rec("k2"), 2))
    assert(out.map(_.tag) == Seq(Output.Valid, Output.Valid))
    assert(st.get.status == SendCompleted && st.get.validCount == 2)
    assert(st.getTimeoutTimestampMs.isPresent) // timer armed at seeding
  }

  test("duplicate started notifications (mgmt retry) are idempotent — counts survive") {
    val st = freshState()
    val out = run(tracker(), st,
      PipelineEvent.of(notif(Started), 0),
      PipelineEvent.of(rec("k1"), 1), PipelineEvent.of(rec("k2"), 2),
      PipelineEvent.of(notif(Started), 3), // retry
      PipelineEvent.of(rec("k3"), 4),
      PipelineEvent.of(notif(SendCompleted, Some(3)), 5))
    assert(out.count(_.tag == Output.Valid) == 3)
    assert(out.count(_.tag == Output.Notification) == 0) // no spurious failed
    assert(st.get.validCount == 3 && st.get.status == SendCompleted)
  }

  test("events are processed in seq order even if the iterator is shuffled") {
    val st = freshState()
    val out = run(tracker(known = Seq.empty), st,
      PipelineEvent.of(rec("k1"), 1),          // arrives 'first' but seq 1
      PipelineEvent.of(notif(Started), 0))     // seq 0 → must seed first
    assert(out.map(_.tag) == Seq(Output.Valid))
  }

  // ---- timer re-arm discipline (Spark clears the stored timeout on every
  // invocation for a key, so the tracker must re-arm at invocation end) ----

  test("timer re-arm: a record arriving while sendCompleted re-arms the completion timer") {
    val p = BatchProgress(notif(SendCompleted, Some(2)), SendCompleted, 1, 0, Some(2),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p)) // fresh invocation: Spark has cleared the timer
    val out = run(tracker(), st, PipelineEvent.of(rec("straggler"), 0))
    assert(out.map(_.tag) == Seq(Output.Valid)) // within window: still forwards
    assert(out.count(_.tag == Output.Notification) == 0) // count == expected, not over
    assert(st.get.validCount == 2 && st.get.status == SendCompleted)
    assert(st.getTimeoutTimestampMs.isPresent, "completion timer must be re-armed")
  }

  test("monotonic: duplicate started after sendCompleted is ignored and timer survives") {
    val p = BatchProgress(notif(SendCompleted, Some(2)), SendCompleted, 1, 0, Some(2),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p))
    val out = run(tracker(), st, PipelineEvent.of(notif(Started), 0)) // mgmt retry, late
    assert(out.isEmpty)
    assert(st.get.status == SendCompleted, "status must not regress to started")
    assert(st.get.expectedRecordCount.contains(2))
    assert(st.getTimeoutTimestampMs.isPresent, "completion timer must be re-armed")
  }

  test("monotonic: sendCompleted echo after completed is ignored (no second completion cycle)") {
    val done = BatchProgress(notif(Completed, Some(1)), Completed, 1, 0, Some(1),
      failedEmitted = false, completedEmitted = true)
    val st = freshState(Some(done))
    val out = run(tracker(), st, PipelineEvent.of(notif(SendCompleted, Some(1)), 0))
    assert(out.isEmpty)
    assert(st.get.status == Completed)
  }

  test("monotonic: started after failed is ignored") {
    val p = BatchProgress(notif(Failed, Some(1)), Failed, 2, 0, Some(1),
      failedEmitted = true, completedEmitted = false)
    val st = freshState(Some(p))
    run(tracker(), st, PipelineEvent.of(notif(Started), 0))
    assert(st.get.status == Failed)
  }

  // ---- state eviction (terminal TTL tombstones) ----

  test("eviction: terminal state arms a TTL tombstone at invocation end") {
    val completed = BatchProgress(notif(Completed, Some(1)), Completed, 1, 0, Some(1),
      failedEmitted = false, completedEmitted = true)
    val st = freshState(Some(completed))
    run(tracker(), st, PipelineEvent.of(rec("late"), 0))
    assert(st.getTimeoutTimestampMs.isPresent, "terminal state must carry a TTL")
  }

  test("eviction: TTL expiry on a terminal state removes it") {
    val completed = BatchProgress(notif(Completed, Some(1)), Completed, 1, 0, Some(1),
      failedEmitted = false, completedEmitted = true)
    val st = freshState(Some(completed), timedOut = true)
    val out = run(tracker(), st)
    assert(out.isEmpty)
    assert(!st.exists, "terminal state must be evicted at TTL expiry")
  }

  test("eviction: clause-8 completed arms the TTL in the same timeout invocation") {
    val p = BatchProgress(notif(SendCompleted, Some(2)), SendCompleted, 2, 0, Some(2),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p), timedOut = true)
    run(tracker(), st)
    assert(st.get.status == Completed)
    assert(st.getTimeoutTimestampMs.isPresent, "completed state must carry a TTL")
  }

  test("eviction: zero-record NoOp timeout evicts state immediately") {
    val p = BatchProgress(notif(SendCompleted, Some(1)), SendCompleted, 0, 0, Some(1),
      failedEmitted = false, completedEmitted = false)
    val st = freshState(Some(p), timedOut = true)
    val out = run(tracker(), st)
    assert(out.isEmpty)
    assert(!st.exists, "zero-record batch state must be evicted, not parked")
  }

  test("eviction: late record after eviction re-seeds via lookup and routes invalid (clause 5 preserved)") {
    // Production path: the Management API still knows the batch as completed.
    val st = freshState() // state was evicted
    val out = run(tracker(known = Seq(notif(Completed, Some(1)))), st,
      PipelineEvent.of(rec("late"), 0))
    assert(out.map(_.tag) == Seq(Output.Invalid))
    assert(failureMessage(out.head) == "Record received after batch completed")
    assert(st.get.status == Completed, "re-seeded terminal state")
    assert(st.getTimeoutTimestampMs.isPresent, "re-seeded terminal state carries a TTL again")
  }

  test("eviction: terminal notification echo with no state does not resurrect state") {
    val st = freshState()
    val out = run(tracker(), st, PipelineEvent.of(notif(Completed, Some(1)), 0))
    assert(out.isEmpty)
    assert(!st.exists, "completed echo after eviction must not re-seed state")
  }

  test("multi-batch isolation: tracker state is per-key (two states never mix)") {
    val t = tracker()
    val stA = freshState()
    val stB = freshState()
    val outA = t.trackBatch(BatchId, Iterator(
      PipelineEvent.of(notif(Started), 0), PipelineEvent.of(rec("a1"), 1)), stA).toSeq
    val outB = t.trackBatch("other-batch", Iterator(
      PipelineEvent.of(rec("b1", "other-batch"), 0)), stB).toSeq
    assert(outA.map(_.tag) == Seq(Output.Valid))
    assert(outB.map(_.tag) == Seq(Output.Invalid)) // other-batch unknown → 404
    assert(stA.get.validCount == 1 && !stB.exists)
  }
}
