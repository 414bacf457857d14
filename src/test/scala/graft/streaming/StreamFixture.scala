package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Shared local SparkSession + MemoryStream pipeline runner for the
  * end-to-end streaming suites (the Spark analogue of the reference's
  * MiniCluster + canned source functions + list sinks, SURVEY §3.3). */
object StreamFixture {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.parquet TIMESTAMP(NANOS)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      // No silent interpreted fallback ANYWHERE in the suite (VERDICT r16
      // task 2, extended r17): CodegenPinSpec pins the registered
      // catalogue in a strict child session, but the r16 defect
      // (Overlap.PairEst) first surfaced on a spec-only SERVE path — so
      // the shared fixture session is strict too, and every streaming
      // sink / serve-from-state / chaos suite fails loudly if encoder or
      // whole-stage codegen stops compiling. Production keeps Spark's
      // default fallback behavior; strictness is a test-only tripwire.
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Runs the full pipeline (MemoryStream → flatMapGroupsWithState →
    * memory sink) and hands the script the input stream plus a results
    * reader. The query is stopped afterwards. */
  def runPipeline(
      completionDelayMs: Long,
      lookup: BatchLookup = new MapBatchLookup(Seq.empty),
      validator: Validator = PassthroughValidator,
      tenant: String = "porcupine")(
      script: (MemoryStream[PipelineEvent], () => Seq[Output]) => Unit): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[PipelineEvent]
    val tracker = new BatchTracker(validator, lookup, tenant, completionDelayMs)
    val outputs = ValidationJob.pipeline(input.toDS(), tracker)
    val name = "results_" + UUID.randomUUID().toString.replace("-", "")
    val query = outputs.writeStream
      .outputMode("append")
      .queryName(name)
      .format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    def results(): Seq[Output] = s.table(name).as[Output].collect().toSeq
    try script(input, () => results())
    finally query.stop()
  }

  /** Polls the results until `pred` holds or the deadline passes; returns
    * the final snapshot either way (callers assert on it). */
  def await(results: () => Seq[Output], timeoutMs: Long = 30000)(
      pred: Seq[Output] => Boolean): Seq[Output] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var r = results()
    while (!pred(r) && System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      r = results()
    }
    r
  }

  def valids(o: Seq[Output]): Seq[HriRecord] = o.filter(_.tag == Output.Valid).flatMap(_.record)
  def invalids(o: Seq[Output]): Seq[HriRecord] = o.filter(_.tag == Output.Invalid).flatMap(_.record)
  def notifs(o: Seq[Output]): Seq[BatchNotification] =
    o.filter(_.tag == Output.Notification).flatMap(_.notification)
}
