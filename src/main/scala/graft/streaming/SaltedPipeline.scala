package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer
import scala.util.{Failure, Success}

/** Salted two-level refinement of the validation pipeline (SURVEY §7.4).
  *
  * The single-level [[ValidationJob.pipeline]] funnels EVERY record of a
  * batch — payload included — through one `groupByKey(batchId)` key, so
  * one hot batch is bounded by one core's validate+wrap+serialize rate no
  * matter how many executors exist. This refinement splits the work:
  *
  *  - '''Salt stage (A)''', keyed by `(batchId, seq % salts)`: owns the
  *    PAYLOAD path — validation, invalid-wrapping, routing by batch
  *    status. Notifications are replicated to all salts (control traffic
  *    is tiny); records hash to one salt each, so a hot batch spreads
  *    over `salts` parallel tasks.
  *  - '''Lifecycle stage (B)''': the UNCHANGED [[BatchTracker]] state
  *    machine, fed payload-free record STUBS (batchId, seq, and a
  *    pre-computed validator verdict byte) with record emissions
  *    suppressed. Counting, the completion-delay timer, overcount /
  *    undercount / threshold decisions, and notification emission all
  *    behave exactly as the single-level pipeline — same code — but the
  *    hot-key shuffle now moves ~20-byte stubs instead of payloads.
  *
  * Semantic delta (documented, inherent to decentralized routing): statuses
  * that stage B itself DECIDES (`completed` at the timer, `failed` on
  * overcount/threshold) reach stage A one notification-echo hop later —
  * the production topology already re-reads the job's own notification
  * topic ([[ValidationJob.startKafka]] subscribes to `.notification`), so
  * a record arriving after `completed` is still routed to invalid with the
  * exact clause-5 message once the echo lands (SaltedPipelineSpec proves
  * it with a feedback harness). Within the trigger that trips a threshold,
  * stage A keeps forwarding records it already routed — the single-level
  * path wraps same-trigger post-trip records as FailedBatchMessage; the
  * salted path forwards them until the echo. Statuses carried by REAL
  * notifications (`started`, `sendCompleted`, `terminated`) replicate to
  * the salts in the same trigger, so scenarios 1-6 are bit-identical.
  *
  * When to use which: the flag (`salts > 1`) buys hot-batch parallelism
  * at the cost of the stub leg (validation runs twice — once in the salt
  * stage for routing, once statelessly for the stub verdict), the tiny
  * extra shuffle, and the echo-lag above. The same-JVM A/B probe
  * (SaltedPipelineSpec "A/B probe": VolumeSpec hot-batch shape, 30k
  * records, ONE batchId, local[4], min of 3 alternating runs) measured:
  *
  *  - PassthroughValidator: single-level 2.6 s / salted(8) 3.3 s — with
  *    trivial per-record work the extra stage can only lose; DON'T enable.
  *  - heavy validator (~200 µs/record, stand-in for real schema checks):
  *    single-level 8.6 s / salted(8) 7.0 s — crossover on only 4 cores
  *    even paying validation 2×; the single-level path spends ~6.3 s
  *    validating on ONE core while salted spreads it.
  *
  * The structural point at 100 TB: single-level hot-batch throughput is
  * bounded by one core's validate+wrap+serialize rate regardless of
  * cluster size; salted is bounded by `salts` cores (stage B's serial
  * work drops to counter increments on ~20-byte stubs). Run the probe
  * against the deployment's real validator before enabling.
  */
object SaltedPipeline {

  /** Stage-A event: one record routed to its salt, or a notification
    * replicated to every salt. */
  case class SaltedEvent(
      batchId: String,
      salt: Int,
      seq: Long,
      record: Option[HriRecord],
      notification: Option[BatchNotification])

  /** Verdict byte carried by a stage-B stub in place of the payload. */
  private val ValidByte: Array[Byte] = Array(1.toByte)
  private val InvalidByte: Array[Byte] = Array(0.toByte)

  /** Stage-B validator: reads the verdict byte the stateless pre-pass
    * stamped into the stub. The message is irrelevant — stage B never
    * emits record outputs. */
  object StubValidator extends Validator {
    def isValid(r: HriRecord): (Boolean, Option[String]) =
      (r.value.nonEmpty && r.value(0) == 1.toByte, None)
  }

  /** The salt-stage router: monotonic status tracking per (batchId, salt)
    * plus the per-record routing clauses of [[BatchTracker.onRecord]] —
    * but no counting, no lifecycle decisions, no notification emission.
    * Terminal state carries the same TTL tombstone discipline as the
    * lifecycle stage so salt-state is O(active batches × salts). */
  class SaltRouter(
      validator: Validator,
      lookup: BatchLookup,
      tenantId: String,
      terminalTtlMs: Long)
      extends Serializable {

    import BatchStatus._

    private def rank(status: String): Int = status match {
      case Started       => 0
      case SendCompleted => 1
      case _             => 2
    }

    def route(
        key: (String, Int),
        events: Iterator[SaltedEvent],
        state: GroupState[BatchProgress]): Iterator[Output] = {
      val out = ArrayBuffer.empty[Output]
      if (state.hasTimedOut) {
        state.remove() // terminal tombstone expired
      } else {
        events.toSeq.sortBy(ev => (ev.seq, ev.record.isDefined)).foreach { ev =>
          ev.notification.foreach { n =>
            // Echoes of B-decided terminal statuses land here too — that is
            // the design: the salt learns `completed`/`failed` via the loop.
            state.getOption match {
              case None =>
                state.update(BatchProgress(n, n.status, 0L, 0L,
                  n.expectedRecordCount, failedEmitted = false, completedEmitted = false))
              case Some(p) if rank(n.status) >= rank(p.status) =>
                state.update(p.copy(notification = n, status = n.status))
              case _ => () // monotonic: ignore regressions
            }
          }
          ev.record.foreach { r => onRecord(r, key._1, state, out) }
        }
        if (state.exists && rank(state.get.status) == 2)
          state.setTimeoutDuration(terminalTtlMs)
      }
      out.iterator
    }

    private def onRecord(
        r: HriRecord,
        batchId: String,
        state: GroupState[BatchProgress],
        out: ArrayBuffer[Output]): Unit = {
      if (!state.exists) {
        lookup.getBatchId(tenantId, batchId) match {
          case Failure(_) =>
            out += Output.invalid(r.asInvalid(BatchTracker.UnknownBatchMessage))
            return
          case Success(n) =>
            state.update(BatchProgress(n, n.status, 0L, 0L, n.expectedRecordCount,
              failedEmitted = false, completedEmitted = false))
        }
      }
      state.get.status match {
        case Completed  => out += Output.invalid(r.asInvalid(BatchTracker.CompletedBatchMessage))
        case Terminated => out += Output.invalid(r.asInvalid(BatchTracker.TerminatedBatchMessage))
        case Failed     => out += Output.invalid(r.asInvalid(BatchTracker.FailedBatchMessage))
        case _ =>
          validator.isValid(r) match {
            case (true, _)    => out += Output.valid(r)
            case (false, msg) => out += Output.invalid(r.asInvalid(msg.getOrElse("Invalid record")))
          }
      }
    }
  }

  /** Assemble the two-level pipeline. `salts` ≥ 1; with salts = 1 the
    * shape is the two-stage one but with no spread (useful only for
    * testing the topology itself). Both stages read the SOURCE stream —
    * re-scanning a micro-batch twice is stateless and cheap; what is NOT
    * duplicated is state or payload shuffling. */
  def pipeline(
      events: Dataset[PipelineEvent],
      validator: Validator,
      lookup: BatchLookup,
      tenantId: String,
      completionDelayMs: Long,
      salts: Int,
      terminalTtlMs: Long = -1L,
      startedTtlMs: Long = -1L,
      /** The stub pre-pass (stateless validate + payload drop) runs at the
        * SOURCE's parallelism. When the input topic has fewer partitions
        * than available cores, Some(n) round-robins the record stream over
        * n partitions first — one extra payload shuffle leg, N→N (never a
        * single-key funnel), worth it only when the source under-splits.
        * None (default) trusts source partitioning — right for production
        * Kafka with a well-partitioned topic. */
      stubParallelism: Option[Int] = None): Dataset[Output] = {
    import events.sparkSession.implicits._
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val ttl = if (terminalTtlMs >= 0) terminalTtlMs else 2 * completionDelayMs

    // Stage A: payload routing, spread over salts.
    val router = new SaltRouter(validator, lookup, tenantId, ttl)
    val aOut = events
      .flatMap { ev =>
        ev.record match {
          case Some(_) =>
            Iterator.single(SaltedEvent(ev.batchId,
              java.lang.Math.floorMod(ev.seq, salts.toLong).toInt, ev.seq,
              ev.record, None))
          case None =>
            (0 until salts).iterator.map(s =>
              SaltedEvent(ev.batchId, s, ev.seq, None, ev.notification))
        }
      }
      .groupByKey(e => (e.batchId, e.salt))
      .flatMapGroupsWithState[BatchProgress, Output](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(router.route)

    // Stage B: the unchanged lifecycle state machine over stubs — the
    // validator runs ONCE per record, statelessly, before the shuffle; the
    // stub carries only identity + verdict.
    val stubIn = stubParallelism.fold(events)(n => events.repartition(n))
    val stubs = stubIn.map { ev =>
      ev.record match {
        case Some(r) =>
          val verdict = if (validator.isValid(r)._1) ValidByte else InvalidByte
          ev.copy(record = Some(HriRecord(Seq.empty, Array.emptyByteArray,
            verdict, r.topic, r.partition, r.offset)))
        case None => ev
      }
    }
    val tracker = new BatchTracker(StubValidator, lookup, tenantId,
      completionDelayMs, terminalTtlMs, startedTtlMs, emitRecordOutputs = false)
    val bOut = ValidationJob.pipeline(stubs, tracker)

    aOut.union(bOut)
  }
}
