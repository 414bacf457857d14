package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** S1/S2 source-mapping tests: `ValidationJob.recordEvents` /
  * `notificationEvents` transform the Kafka source's fixed schema
  * (FIXTURES A.2: key/value binary, headers array<struct<key,value>>,
  * topic/partition/offset) into PipelineEvents. Exercised on batch
  * DataFrames with the exact Kafka shape — no broker needed; the streaming
  * path applies the identical transform. */
class KafkaShapeSpec extends AnyFunSuite {

  import StreamFixture.spark

  test("recordEvents maps the Kafka record envelope to HriRecord events") {
    import spark.implicits._
    val df = Seq(
      (Seq(HriHeader("batchId", "b-9".getBytes(UTF_8)),
        HriHeader("testUtf8あいうえおか", "あいうえおか".getBytes(UTF_8))),
        "k1".getBytes(UTF_8), "payload".getBytes(UTF_8),
        "ingest.t.s.in", 3, 42L, new java.sql.Timestamp(1586314943000L)))
      .toDF("headers", "key", "value", "topic", "partition", "offset", "timestamp")
    val evs = ValidationJob.recordEvents(df).collect()
    assert(evs.length == 1)
    val e = evs.head
    assert(e.batchId == "b-9")      // grouping key = batchId header
    assert(e.seq == 1586314943000L) // seq = log timestamp millis (cross-topic comparable)
    val r = e.record.get
    assert(new String(r.key, UTF_8) == "k1")
    assert(new String(r.value, UTF_8) == "payload")
    assert(r.topic == "ingest.t.s.in" && r.partition == 3 && r.offset == 42L)
    assert(r.headers.map(h => h.key -> new String(h.value, UTF_8)) ==
      Seq("batchId" -> "b-9", "testUtf8あいうえおか" -> "あいうえおか"))
  }

  test("recordEvents: record with no batchId header groups under the empty key (→ 404 path)") {
    import spark.implicits._
    val df = Seq((Seq.empty[HriHeader], "k".getBytes(UTF_8), "v".getBytes(UTF_8), "t", 0, 7L,
        new java.sql.Timestamp(1586314943000L)))
      .toDF("headers", "key", "value", "topic", "partition", "offset", "timestamp")
    val evs = ValidationJob.recordEvents(df).collect()
    assert(evs.head.batchId == "")
  }

  test("notificationEvents parses the wire JSON into BatchNotification events") {
    import spark.implicits._
    val wire =
      """{"id":"b-9","name":"n","topic":"ingest.t.s.in","dataType":"claims",
        |"status":"sendCompleted","startDate":"2020-04-08T03:02:23Z",
        |"endDate":"2020-04-11T16:02:44Z","expectedRecordCount":15,
        |"invalidThreshold":5,"metadata":{"a":1}}""".stripMargin
    val df = Seq((wire.getBytes(UTF_8), new java.sql.Timestamp(1586314900123L)))
      .toDF("value", "timestamp")
    val evs = ValidationJob.notificationEvents(df).collect()
    assert(evs.length == 1)
    val n = evs.head.notification.get
    assert(evs.head.batchId == "b-9" && evs.head.seq == 1586314900123L)
    assert(n.status == BatchStatus.SendCompleted)
    assert(n.expectedRecordCount.contains(15) && n.invalidThreshold == 5)
    assert(n.metadata.contains("""{"a":1}"""))
  }

  test("validator contract twin (PassthroughValidatorTest): any record is valid, no message") {
    val recs = Seq(
      HriRecord(Seq(HriHeader("batchId", "b".getBytes(UTF_8))), null,
        """{"resourceType":"Bundul"}""".getBytes(UTF_8), "t", 0, 0L), // typo'd body
      HriRecord(Seq.empty, "k".getBytes(UTF_8),
        "БВГДЖЗИЙЛ-あいうえおか".getBytes(UTF_8), "t", 1, 1L),        // non-ASCII
      HriRecord(Seq.empty, null, Array[Byte](), "t", 0, 2L))           // empty body
    recs.foreach { r =>
      assert(PassthroughValidator.isValid(r) == (true, None)) // never inspects payload
    }
  }
}
