package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** End-to-end proof of the salted two-level pipeline (SURVEY §7.4) and its
  * equivalence with the single-level path on the reference scenarios. The
  * harness mirrors the PRODUCTION topology: notification outputs are fed
  * back into the input stream (startKafka subscribes to the same
  * `.notification` topic it writes), which is how the salt stage learns
  * the statuses that the lifecycle stage decides (`completed`, `failed`).
  */
class SaltedPipelineSpec extends AnyFunSuite {

  import BatchStatus._
  import StreamFixture.{await, spark, valids, invalids, notifs}

  val Topic = "ingest.porcupine.data-int1.in"

  def notif(b: String, status: String, expected: Option[Int] = None,
      threshold: Int = -1): BatchNotification =
    BatchNotification(b, b, status, "procedure",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic,
      invalidThreshold = threshold)

  def rec(key: Int, b: String): HriRecord =
    HriRecord(Seq(HriHeader("batchId", b.getBytes(UTF_8))),
      key.toString.getBytes(UTF_8), s"body-$key".getBytes(UTF_8), Topic, 0, key.toLong)

  /** Salted-pipeline runner with the production notification echo: every
    * emitted notification is re-injected into the input, exactly as the
    * real job reads back its own `.notification` topic. */
  def runSalted(
      completionDelayMs: Long,
      salts: Int,
      validator: Validator = PassthroughValidator,
      lookup: BatchLookup = new MapBatchLookup(Seq.empty),
      echo: Boolean = true,
      stubParallelism: Option[Int] = None,
      terminalTtlMs: Long = -1L)(
      script: (MemoryStream[PipelineEvent], () => Seq[Output]) => Unit): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[PipelineEvent]
    val outputs = SaltedPipeline.pipeline(input.toDS(), validator, lookup,
      "porcupine", completionDelayMs, salts, terminalTtlMs = terminalTtlMs,
      stubParallelism = stubParallelism)
    val collected = new ConcurrentLinkedQueue[Output]()
    val echoSeq = new AtomicLong(1000000000L) // far above any test seq
    val query = outputs.writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-salt-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .foreachBatch { (b: Dataset[Output], _: Long) =>
        val rows = b.collect()
        rows.foreach(collected.add)
        if (echo) {
          val echoes = rows.filter(_.tag == Output.Notification).flatMap(_.notification)
            .map(n => PipelineEvent.of(n, echoSeq.getAndIncrement()))
          if (echoes.nonEmpty) input.addData(echoes.toIndexedSeq: _*)
        }
        ()
      }
      .start()
    try script(input, () => collected.asScala.toSeq)
    finally query.stop()
  }

  test("happy path matches the single-level pipeline: payloads intact, exact count, one completed") {
    runSalted(completionDelayMs = 150L, salts = 4) { (input, results) =>
      val b = "salted-happy"
      input.addData(PipelineEvent.of(notif(b, Started), 0) +:
        (1 to 15).map(i => PipelineEvent.of(rec(i, b), i.toLong)): _*)
      input.addData(PipelineEvent.of(notif(b, SendCompleted, Some(15)), 16))
      val out = await(results)(r => notifs(r).exists(_.status == Completed))
      val vs = valids(out)
      assert(vs.map(r => new String(r.key, UTF_8).toInt).sorted == (1 to 15).toList)
      // payload and headers ride the salt stage untouched
      assert(vs.forall(r => new String(r.value, UTF_8) ==
        s"body-${new String(r.key, UTF_8)}"))
      assert(vs.forall(_.headers.exists(h => h.key == "batchId" &&
        new String(h.value, UTF_8) == b)))
      assert(invalids(out).isEmpty)
      val done = notifs(out).filter(_.status == Completed)
      assert(done.map(_.recordCount) == Seq(Some(15)), s"lifecycle: ${notifs(out)}")
    }
  }

  test("terminate replicates to salts in-trigger: records after terminated route to invalid") {
    runSalted(completionDelayMs = 150L, salts = 4, terminalTtlMs = 30000L) { (input, results) =>
      val b = "salted-term"
      input.addData(
        PipelineEvent.of(notif(b, Started), 0),
        PipelineEvent.of(rec(1, b), 1),
        PipelineEvent.of(rec(2, b), 2))
      await(results)(r => valids(r).size == 2)
      input.addData(PipelineEvent.of(notif(b, Terminated), 3))
      await(results)(_ => true); Thread.sleep(800) // let the notification land (generous: box swings under co-tenant load)
      input.addData(PipelineEvent.of(rec(3, b), 4))
      val out = await(results)(r => invalids(r).nonEmpty)
      assert(valids(out).size == 2)
      assert(invalids(out).map(r => new String(r.value, UTF_8)) ==
        Seq("""{"failure":"Record received after batch terminated"}"""))
    }
  }

  test("echo loop: a record after the B-decided `completed` routes to invalid with the clause-5 message") {
    // terminalTtlMs pinned high: the clause-5 window would otherwise close
    // 2x100ms after the echo lands, an inherent race under co-tenant load
    // (r10 flake); TTL eviction itself is EvictionSpec's subject.
    runSalted(completionDelayMs = 100L, salts = 4, terminalTtlMs = 30000L) { (input, results) =>
      val b = "salted-late"
      input.addData(
        PipelineEvent.of(notif(b, Started), 0),
        PipelineEvent.of(rec(1, b), 1),
        PipelineEvent.of(notif(b, SendCompleted, Some(1)), 2))
      await(results)(r => notifs(r).exists(_.status == Completed))
      Thread.sleep(1200) // let the completed echo replicate to the salts (generous: a 300ms window flaked under co-tenant load, r10)
      input.addData(PipelineEvent.of(rec(99, b), 10))
      val out = await(results)(r => invalids(r).nonEmpty)
      assert(invalids(out).map(r => new String(r.value, UTF_8)) ==
        Seq("""{"failure":"Record received after batch completed"}"""))
      assert(notifs(out).map(_.status).distinct == Seq(Completed), "batch stays completed")
    }
  }

  test("invalid records: salt stage wraps with the validator message, lifecycle stage trips the threshold") {
    val oddInvalid = new Validator {
      def isValid(r: HriRecord): (Boolean, Option[String]) =
        if (new String(r.key, UTF_8).toInt % 2 == 1) (false, Some("odd key rejected"))
        else (true, None)
    }
    runSalted(completionDelayMs = 150L, salts = 4, validator = oddInvalid) { (input, results) =>
      val b = "salted-threshold"
      input.addData(PipelineEvent.of(notif(b, Started, threshold = 2), 0) +:
        (1 to 6).map(i => PipelineEvent.of(rec(i, b), i.toLong)): _*)
      val out = await(results)(r => notifs(r).exists(_.status == Failed))
      assert(valids(out).map(r => new String(r.key, UTF_8).toInt).sorted == Seq(2, 4, 6))
      assert(invalids(out).map(r => new String(r.value, UTF_8)).distinct ==
        Seq("""{"failure":"odd key rejected"}"""))
      assert(invalids(out).size == 3)
      // threshold 2, third invalid trips it — decided by the stub counts
      assert(notifs(out).count(_.status == Failed) == 1)
    }
  }

  test("unknown batch: every salt routes to invalid with the exact message; no lifecycle emission") {
    runSalted(completionDelayMs = 150L, salts = 4) { (input, results) =>
      input.addData((1 to 4).map(i => PipelineEvent.of(rec(i, "ghost"), i.toLong)): _*)
      val out = await(results)(r => invalids(r).size == 4)
      assert(invalids(out).size == 4)
      assert(invalids(out).map(r => new String(r.value, UTF_8)).distinct ==
        Seq("""{"failure":"Bad Message - Unknown batchId"}"""))
      assert(valids(out).isEmpty && notifs(out).isEmpty)
    }
  }

  test("A/B probe: hot-batch wall clock, single-level vs salted (numbers for the §7.4 scaladoc)") {
    // Same-JVM alternating probe on the VolumeSpec hot-batch shape, run
    // with BOTH a trivial and a deliberately expensive validator: the
    // salted refinement exists for the case where per-record work is real
    // (schema checks, JSON parse) — with PassthroughValidator the extra
    // stage can only lose. Records evidence (info), not a pass/fail bound.
    val n = 30000
    val heavyValidator = new Validator {
      // ~deterministic CPU burn standing in for schema validation
      def isValid(r: HriRecord): (Boolean, Option[String]) = {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        var h = r.value
        var i = 0
        while (i < 3000) { h = md.digest(h); i += 1 }
        (h(0) >= -128, None) // always true, but data-dependent (no DCE)
      }
    }
    def drive(salted: Boolean, validator: Validator): Double = {
      val t0 = System.currentTimeMillis()
      val run: (Long, (MemoryStream[PipelineEvent], () => Seq[Output]) => Unit) => Unit =
        if (salted) (d, f) => runSalted(d, salts = 8, validator = validator, echo = false,
          stubParallelism = Some(4))(f) // MemoryStream under-splits (1 block/trigger)
        else (d, f) => StreamFixture.runPipeline(d, validator = validator)(f)
      run(300L, { (input, results) =>
        val b = s"probe-${if (salted) "salted" else "single"}-${System.nanoTime()}"
        input.addData(PipelineEvent.of(notif(b, Started), 0))
        (0 until 3).foreach { chunk =>
          input.addData((0 until n / 3).map { j =>
            val key = chunk * 10000 + j
            PipelineEvent.of(rec(key, b), key.toLong + 10)
          }: _*)
        }
        input.addData(PipelineEvent.of(notif(b, SendCompleted, Some(n)), 1000000L))
        val out = await(results, timeoutMs = 120000)(r => notifs(r).exists(_.status == Completed))
        assert(notifs(out).filter(_.status == Completed).map(_.recordCount) == Seq(Some(n)))
        assert(valids(out).size == n)
      })
      (System.currentTimeMillis() - t0) / 1000.0
    }
    for ((vName, v) <- Seq("passthrough" -> (PassthroughValidator: Validator),
        "heavy" -> (heavyValidator: Validator))) {
      val times = (1 to 3).flatMap(_ =>
        Seq("single" -> drive(false, v), "salted" -> drive(true, v)))
      val best = times.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      info(f"$vName validator, $n records, min of 3: " +
        f"single=${best("single")}%.1f s salted(8)=${best("salted")}%.1f s")
    }
  }
}
