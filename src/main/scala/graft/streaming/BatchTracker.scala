package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import scala.collection.mutable.ArrayBuffer
import scala.util.{Failure, Success}

/** The one stateful core of the pipeline (SURVEY §2.3): every operator
  * O2–O9 of the reference dataflow composes into this single
  * `flatMapGroupsWithState` function, keyed by batchId, with a
  * processing-time timeout for the completion delay.
  *
  * Behavioral contract, clause by clause (evidence: the reference's
  * end-to-end specs, cited per clause below — file
  * test/spec/flink_validation_passthrough_spec.rb unless noted):
  *
  *  1. started notification seeds state (spec.rb:131).
  *  2. record with no state → BatchLookup; 404 ⇒ invalid with EXACTLY
  *     `Bad Message - Unknown batchId` and NO state seeded — each unknown
  *     record re-looks-up (spec.rb:264-290, kafka_record_validator.rb:106-111);
  *     Success ⇒ seed state from the returned notification, then process.
  *  3. record while `started` → Validator; valid ⇒ out + count; invalid ⇒
  *     wrapped to invalid + invalid count + threshold check (spec.rb:99-132).
  *     Records forward even past expectedRecordCount — the overcount check
  *     only runs at/after sendCompleted (spec.rb:292-318 shows 15 records on
  *     the out topic with expected=5, then `failed` at sendCompleted).
  *  4. record while `terminated` → routed to invalid, never to out
  *     (terminate stops forwarding, spec.rb:229-262; the invalid routing for
  *     post-terminate arrivals is inferred — unobserved in the reference).
  *  5. record while `completed` → invalid; batch STAYS completed
  *     (spec.rb:358-402, mgmt status still `completed` at :399-401).
  *  6. sendCompleted → record expectedRecordCount + start the completion
  *     delay timer; if already overcounted ⇒ `failed` immediately
  *     (spec.rb:292-318).
  *  7. record after sendCompleted, within the delay window → still
  *     validated and forwarded (spec.rb:320-356 sees 16 records on out),
  *     and if the count now exceeds expected ⇒ `failed` (same spec).
  *  8. timeout fires: count == expected ⇒ emit `completed` with recordCount
  *     (kafka_record_validator.rb:51-54, delay lower bound :67-71);
  *     count == 0 ⇒ emit NOTHING (reference NoOp,
  *     PassthroughStreamingJobIntTest.java:110-155);
  *     0 < count < expected ⇒ emit `failed` — the only unobserved edge in
  *     the reference (SURVEY §2.3 cl. 8); chosen and documented here.
  *  9. terminated notification → mark state; no further out deliveries
  *     (spec.rb:261: statuses end `started, terminated`).
  *
  * Invalid-threshold (O9): `invalidThreshold >= 0 && invalidCount >
  * threshold ⇒ failed` (field carried per PassthroughJobTestHelper.java:72,
  * −1 disables per kafka_notification_builder.rb:14).
  *
  * Scale notes: state is O(1) per batch (a notification + counters); the
  * record path never leaves the executors; `BatchLookup` fires once per
  * unknown batch, not per record (unknown-batch floods are the one
  * per-record case — acceptable: they are a client error). Per-key serial
  * processing bounds single-batch throughput; SURVEY §7.4 documents the
  * salted two-level refinement if one batch must exceed a core.
  */
class BatchTracker(
    validator: Validator,
    lookup: BatchLookup,
    tenantId: String,
    completionDelayMs: Long)
    extends Serializable {

  import BatchStatus._

  val UnknownBatchMessage = "Bad Message - Unknown batchId"
  val CompletedBatchMessage = "Record received after batch completed"
  val TerminatedBatchMessage = "Record received after batch terminated"
  val FailedBatchMessage = "Record received after batch failed"

  /** The flatMapGroupsWithState function. Events are re-sorted by `seq`
    * inside a trigger so cross-source arrival races cannot reorder a
    * notification behind the records that followed it. */
  def trackBatch(
      batchId: String,
      events: Iterator[PipelineEvent],
      state: GroupState[BatchProgress]): Iterator[Output] = {
    val out = ArrayBuffer.empty[Output]

    if (state.hasTimedOut) {
      onTimeout(state, out) // clause 8; Spark guarantees `events` is empty
    } else {
      events.toSeq.sortBy(_.seq).foreach { ev =>
        (ev.notification, ev.record) match {
          case (Some(n), _) => onNotification(n, state, out)
          case (_, Some(r)) => onRecord(r, batchId, state, out)
          case _            => ()
        }
      }
    }
    out.iterator
  }

  private def onTimeout(state: GroupState[BatchProgress], out: ArrayBuffer[Output]): Unit = {
    val p = state.get
    if (p.status == SendCompleted && !p.failedEmitted) {
      val expected = p.expectedRecordCount.getOrElse(0)
      if (p.validCount == expected) {
        val done = p.notification.copy(
          status = Completed,
          expectedRecordCount = p.expectedRecordCount,
          recordCount = Some(p.validCount.toInt))
        out += Output.notification(done)
        state.update(p.copy(status = Completed, notification = done, completedEmitted = true))
      } else if (p.validCount == 0) {
        // Reference NoOp: a batch that saw no records emits no count
        // notification at all (PassthroughStreamingJobIntTest noSentRecords).
        ()
      } else {
        emitFailed(p, state, out) // undercount: documented choice (cl. 8)
      }
    }
  }

  private def onNotification(
      n: BatchNotification,
      state: GroupState[BatchProgress],
      out: ArrayBuffer[Output]): Unit = {
    val p0 = state.getOption.getOrElse(
      BatchProgress(n, n.status, 0L, 0L, n.expectedRecordCount,
        failedEmitted = false, completedEmitted = false))
    n.status match {
      case Started =>
        state.update(p0.copy(notification = n, status = Started))
      case SendCompleted =>
        val expected = n.expectedRecordCount.orElse(p0.expectedRecordCount)
        val p = p0.copy(notification = n, status = SendCompleted, expectedRecordCount = expected)
        state.update(p)
        if (expected.exists(e => p.validCount > e)) {
          emitFailed(p, state, out) // clause 6: already overcounted
        } else {
          state.setTimeoutDuration(completionDelayMs) // clause 8 arm
        }
      case Terminated =>
        state.update(p0.copy(notification = n, status = Terminated)) // clause 9
      case other => // completed/failed echoes from the control topic
        state.update(p0.copy(notification = n, status = other))
    }
  }

  private def onRecord(
      r: HriRecord,
      batchId: String,
      state: GroupState[BatchProgress],
      out: ArrayBuffer[Output]): Unit = {
    if (!state.exists) {
      lookup.getBatchId(tenantId, batchId) match { // clause 2
        case Failure(_) =>
          out += Output.invalid(r.asInvalid(UnknownBatchMessage))
          return
        case Success(n) =>
          state.update(BatchProgress(n, n.status, 0L, 0L, n.expectedRecordCount,
            failedEmitted = false, completedEmitted = false))
          if (n.status == SendCompleted) state.setTimeoutDuration(completionDelayMs)
      }
    }
    val p = state.get
    p.status match {
      case Completed =>
        out += Output.invalid(r.asInvalid(CompletedBatchMessage)) // clause 5
      case Terminated =>
        out += Output.invalid(r.asInvalid(TerminatedBatchMessage)) // clause 4
      case Failed =>
        out += Output.invalid(r.asInvalid(FailedBatchMessage))
      case _ => // started or sendCompleted: clauses 3 and 7
        validator.isValid(r) match {
          case (true, _) =>
            val p1 = p.copy(validCount = p.validCount + 1)
            state.update(p1)
            out += Output.valid(r)
            if (p1.status == SendCompleted &&
                p1.expectedRecordCount.exists(e => p1.validCount > e)) {
              emitFailed(p1, state, out) // clause 7 (record still forwarded)
            }
          case (false, msg) =>
            val p1 = p.copy(invalidCount = p.invalidCount + 1)
            state.update(p1)
            out += Output.invalid(r.asInvalid(msg.getOrElse("Invalid record")))
            if (p1.notification.invalidThreshold >= 0 &&
                p1.invalidCount > p1.notification.invalidThreshold) {
              emitFailed(p1, state, out) // O9
            }
        }
    }
  }

  private def emitFailed(
      p: BatchProgress,
      state: GroupState[BatchProgress],
      out: ArrayBuffer[Output]): Unit =
    if (!p.failedEmitted) {
      val failed = p.notification.copy(
        status = Failed,
        expectedRecordCount = p.expectedRecordCount,
        recordCount = Some(p.validCount.toInt))
      out += Output.notification(failed)
      state.update(p.copy(status = Failed, notification = failed, failedEmitted = true))
    }
}
