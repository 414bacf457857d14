package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFixture.spark

/** Live-broker integration twin of the reference's happy-path RSpec
  * scenario (producer → notification + records → validated out topic +
  * lifecycle notifications, flink_validation_passthrough_spec.rb:99-150)
  * — r10 VERDICT task 8: the ONE seam the offline suites cannot reach is
  * [[ValidationJob.startKafka]] against a real broker (this sandbox has
  * no spark-sql-kafka jar and zero egress), so this suite
  *
  *  - runs ONLY when the Kafka connector is on the classpath AND a
  *    broker is named in `GRAFT_KAFKA_BROKERS` (e.g. `localhost:9092`);
  *  - CANCELS cleanly (ScalaTest `assume`) otherwise, keeping the
  *    offline build green;
  *  - uses exclusively Spark's `format("kafka")` batch reader/writer for
  *    produce/consume (format strings resolve at RUNTIME), so it
  *    compiles with zero Kafka imports on the offline classpath.
  *
  * A networked build gains live-broker coverage by exporting the env
  * var — no code changes: `GRAFT_KAFKA_BROKERS=localhost:9092 sbt
  * "testOnly graft.streaming.KafkaLiveSpec"`. The broker must allow
  * topic auto-creation (or pre-create the four `ingest.kl.<suffix>.*`
  * topics printed at the start of the run).
  */
class KafkaLiveSpec extends AnyFunSuite {

  private val brokersEnv = sys.env.get("GRAFT_KAFKA_BROKERS").filter(_.nonEmpty)

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Batch-produce (key, value[, headers]) rows to a topic. */
  private def produce(brokers: String, topic: String,
      rows: Seq[(Array[Byte], Array[Byte], Seq[HriHeader])]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("key", "value", "hs")
      .select(col("key"), col("value"),
        col("hs").cast("array<struct<key:string,value:binary>>").as("headers"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("includeHeaders", "true")
      .save()
  }

  /** Batch-read every record currently on a topic. */
  private def drain(brokers: String, topic: String): Seq[(String, Array[Byte])] =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("value")))
      .toSeq

  test("happy path against a real broker: Started + records + sendCompleted " +
    "→ validated out topic + completed notification") {
    assume(connectorPresent,
      "spark-sql-kafka connector not on classpath — offline build, suite cancels")
    assume(brokersEnv.isDefined,
      "GRAFT_KAFKA_BROKERS not set — no broker to test against, suite cancels")
    val brokers = brokersEnv.get

    // unique topic family per run (auto-created by the broker)
    val suffix = s"live${System.currentTimeMillis()}"
    val topics = Topics(s"ingest.kl.$suffix.in")
    info(s"topics: ${topics.in} ${topics.out} ${topics.invalid} ${topics.notification}")
    val batchId = s"kl-$suffix"

    def notifJson(status: String, expected: Option[Int]): Array[Byte] =
      NotificationJson.render(BatchNotification(batchId, "KlBatch", status,
        "procedure", "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z",
        expected, topics.in)).getBytes(UTF_8)

    val ckpt = Files.createTempDirectory("graft-kafka-live").toString
    val query = ValidationJob.startKafka(spark, topics, Seq(brokers), None,
      PassthroughValidator, new MapBatchLookup(Seq.empty),
      completionDelayMs = 2000L, mgmt = None, checkpointLocation = ckpt)
    try {
      // let the sources initialize at startingOffsets=latest before producing
      Thread.sleep(5000)

      produce(brokers, topics.notification,
        Seq((batchId.getBytes(UTF_8), notifJson(BatchStatus.Started, None), Seq.empty)))
      val hdr = Seq(HriHeader("batchId", batchId.getBytes(UTF_8)))
      produce(brokers, topics.in, (1 to 10).map(i =>
        (i.toString.getBytes(UTF_8), s"body-$i".getBytes(UTF_8), hdr)))
      produce(brokers, topics.notification,
        Seq((batchId.getBytes(UTF_8), notifJson(BatchStatus.SendCompleted, Some(10)), Seq.empty)))

      def pollUntil(what: String)(cond: => Boolean): Unit = {
        val limit = System.currentTimeMillis() + 120000
        while (!cond && System.currentTimeMillis() < limit) Thread.sleep(1000)
        assert(cond, s"$what not reached within 120s")
      }

      // every record forwarded to .out exactly once, none invalid
      pollUntil("10 records on out")(drain(brokers, topics.out).size >= 10)
      val outKeys = drain(brokers, topics.out).map(_._1.toInt).sorted
      assert(outKeys == (1 to 10).toList, s"out topic keys: $outKeys")
      assert(drain(brokers, topics.invalid).isEmpty, "invalid topic must stay empty")

      // lifecycle completes with the full count once the delay fires
      pollUntil("completed notification") {
        drain(brokers, topics.notification).exists { case (_, v) =>
          val n = NotificationJson.parse(v)
          n.status == BatchStatus.Completed && n.recordCount.contains(10)
        }
      }
    } finally query.stop()
  }
}
