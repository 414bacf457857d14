package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.collection.mutable

/** Forked-JVM chaos twin of the reference's HA nightly
  * (test/nightly/flink_validation_passthrough_high_availability_spec.rb:101-181,
  * which SIGKILLs taskmanager/jobmanager pods mid-batch and requires the
  * batch to still complete with every record delivered exactly once).
  *
  * RecoverySpec injects crashes in-process; this main exists so HaKillSpec
  * can run the REAL job in a SEPARATE JVM and `kill -9` it mid-epoch —
  * the one fault class (lost page cache, torn checkpoint fsync, no
  * shutdown hooks) in-process injection cannot reproduce. The job is the
  * production pipeline verbatim — [[ValidationJob.pipeline]] +
  * [[ValidationJob.writeOutputs]] with the EpochCommitLog step markers —
  * over a FILE source (the sandbox has no Kafka broker) and a file-backed
  * [[ValidationJob.TxOutputSink]].
  *
  * The file sink's transactional visibility: each step's rows land via
  * temp-write + ATOMIC rename to a name DETERMINISTIC in (epoch, step) —
  * the file-system analogue of the Kafka transactional marker: a replayed
  * step re-renames onto its own name (same replayed content), so a crash
  * anywhere around the commit point can never produce a second copy. The
  * step marker still commits with the transaction (`commit(marker)`), so
  * a replay normally SKIPS finished steps; the deterministic name closes
  * the residual window where the crash lands between rename and marker.
  *
  * Args: inputDir ckptDir commitDir outDir preCommitSleepMs
  *  - inputDir: JSON-lines files, schema {kind, key, seq, expected};
  *    kind ∈ started | record | sendCompleted. New files may arrive while
  *    the job runs (maxFilesPerTrigger=1 → one file per epoch).
  *  - preCommitSleepMs: dwell between the last sink step and the epoch
  *    commit — widens the mid-epoch window HaKillSpec aims its kill at.
  * Exits 0 once a `completed` notification is visible in the sink, after
  * writing `outDir/DONE`; exits 2 on timeout. */
object HaChaosJob {

  val Topic = "ingest.porcupine.data-int1.in"
  val BatchId = "ha-kill-batch"

  private def notif(status: String, expected: Option[Int]): BatchNotification =
    BatchNotification(BatchId, "HaKillBatch", status, "procedure",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", expected, Topic)

  private def rec(key: Int): HriRecord =
    HriRecord(Seq(HriHeader("batchId", BatchId.getBytes(UTF_8))),
      key.toString.getBytes(UTF_8), s"body-$key".getBytes(UTF_8), Topic, 0, key.toLong)

  /** File-backed transactional sink — see class scaladoc for the
    * determinism-based atomicity argument. */
  private[streaming] final class FileTxSink(outDir: String)
      extends ValidationJob.TxOutputSink {
    def begin(epochId: Long, step: String): ValidationJob.SinkTransaction =
      new ValidationJob.SinkTransaction {
        private val staged = mutable.Buffer.empty[(String, Seq[String])]
        def send(df: DataFrame, topic: String): Unit =
          staged += topic -> df
            .select(col("key").cast("string"), col("value").cast("string"))
            .collect().map(r => r.getString(0) + "\t" + r.getString(1)).toSeq
        def commit(marker: () => Unit): Unit = {
          staged.foreach { case (topic, rows) =>
            val dir = Paths.get(outDir, topic)
            Files.createDirectories(dir)
            val tmp = dir.resolve(s"epoch-$epochId-$step.tmp")
            Files.write(tmp, rows.mkString("\n").getBytes(UTF_8))
            Files.move(tmp, dir.resolve(s"epoch-$epochId-$step"),
              StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
          }
          marker()
        }
        def abort(): Unit = staged.clear()
      }
  }

  /** Read every committed line of one topic dir (ignores .tmp stragglers). */
  def topicLines(outDir: String, topic: String): Seq[String] = {
    val dir = Paths.get(outDir, topic)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val files = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala.toSeq
          .filterNot(_.getFileName.toString.endsWith(".tmp"))
          .sortBy(_.getFileName.toString)
          .flatMap(p => new String(Files.readAllBytes(p), UTF_8)
            .split("\n").toSeq.filter(_.nonEmpty))
      } finally files.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(inputDir, ckpt, commitDir, outDir, sleepMsStr) = args.take(5)
    val sleepMs = sleepMsStr.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ha-chaos")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val topics = Topics(Topic)
    val tracker = new BatchTracker(PassthroughValidator,
      new MapBatchLookup(Seq.empty), topics.tenant, 150L)
    val events = spark.readStream
      .schema("kind STRING, key INT, seq LONG, expected INT")
      .option("maxFilesPerTrigger", 1)
      .json(inputDir)
      .as[(String, Int, Long, Int)]
      .map {
        case ("started", _, seq, _) => PipelineEvent.of(notif(BatchStatus.Started, None), seq)
        case ("sendCompleted", _, seq, expected) =>
          PipelineEvent.of(notif(BatchStatus.SendCompleted, Some(expected)), seq)
        case ("record", key, seq, _) => PipelineEvent.of(rec(key), seq)
        case (kind, _, _, _) => sys.error(s"unknown input kind $kind")
      }

    val sink = new FileTxSink(outDir)
    val query = ValidationJob.pipeline(events, tracker).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Output], epochId: Long) =>
        if (epochId > ValidationJob.EpochCommitLog.lastCommitted(b.sparkSession, commitDir)) {
          ValidationJob.writeOutputs(b, topics, sink, None, epochId, commitDir)
          // dwell INSIDE the epoch (steps written, epoch uncommitted) —
          // the window the reference's pod kill usually lands in
          if (sleepMs > 0 && !b.isEmpty) Thread.sleep(sleepMs)
          ValidationJob.EpochCommitLog.commit(b.sparkSession, commitDir, epochId)
        } else b.foreach(_ => ()) // replayed whole epoch: drain, write nothing
      }
      .start()

    // Run until the completed notification is visible in the sink.
    val deadline = System.currentTimeMillis() + 180000L
    var done = false
    while (!done && System.currentTimeMillis() < deadline && query.isActive) {
      done = topicLines(outDir, topics.notification)
        .exists(_.contains("\"status\":\"completed\""))
      if (!done) Thread.sleep(100)
    }
    query.stop()
    spark.stop()
    if (done) {
      Files.write(Paths.get(outDir, "DONE"), "ok".getBytes(UTF_8))
      sys.exit(0)
    } else sys.exit(2)
  }
}
