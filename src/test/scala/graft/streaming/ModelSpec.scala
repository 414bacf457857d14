package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model round-trip invariants: notification JSON codec fidelity (incl.
  * nested metadata, reference FIXTURES A.3) and invalid-record wrapping
  * (reference kafka_record_validator.rb:106-111), plus UTF-8 header
  * fidelity properties (spec.rb:119-120 uses key `testUtf8あいうえおか`). */
class ModelSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  val full = BatchNotification(
    id = "batch-42", name = "TestBatchName-БВГДЖЗИЙЛ", status = "sendCompleted",
    dataType = "hri-flink-validation-passthrough-batch-あいうえおか",
    startDate = "2020-04-08T03:02:23Z", endDate = "2020-04-11T16:02:44Z",
    expectedRecordCount = Some(15), topic = "ingest.test.stream.in",
    invalidThreshold = 5, recordCount = Some(15),
    metadata = Some("""{"test":"ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ","nested":{"a":[1,2,3]}}"""))

  test("notification JSON round-trips every field, metadata verbatim") {
    val json = NotificationJson.render(full)
    val back = NotificationJson.parse(json.getBytes(UTF_8))
    assert(back == full)
  }

  test("notification JSON omits absent optional fields, defaults threshold to -1") {
    val minimal = BatchNotification("b1", "n", "started", "dt",
      "2020-04-08T03:02:23Z", "2020-04-11T16:02:44Z", None, "t.in")
    val json = NotificationJson.render(minimal)
    assert(!json.contains("expectedRecordCount") && !json.contains("recordCount"))
    val back = NotificationJson.parse(json.getBytes(UTF_8))
    assert(back == minimal && back.invalidThreshold == -1)
  }

  test("wire-shape notification (reference FIXTURES A.3) parses") {
    val wire =
      """{"id":"b-1","name":"n","topic":"ingest.t.s.in","dataType":"claims",
        |"status":"started","startDate":"2020-04-08T03:02:23Z",
        |"endDate":"2020-04-11T16:02:44Z","expectedRecordCount":15,
        |"recordCount":15,"invalidThreshold":-1,"metadata":{"test":"x"}}""".stripMargin
    val n = NotificationJson.parse(wire.getBytes(UTF_8))
    assert(n.id == "b-1" && n.status == "started" &&
      n.expectedRecordCount.contains(15) && n.metadata.contains("""{"test":"x"}"""))
  }

  test("asInvalid wraps body as {failure: msg} and preserves headers/key/topic") {
    val r = HriRecord(
      Seq(HriHeader("batchId", "b".getBytes(UTF_8)),
        HriHeader("testUtf8あいうえおか", "あいうえおか".getBytes(UTF_8))),
      "k1".getBytes(UTF_8), "orig".getBytes(UTF_8), "ingest.t.s.in", 3, 42L)
    val inv = r.asInvalid("Bad Message - Unknown batchId")
    assert(new String(inv.value, UTF_8) == """{"failure":"Bad Message - Unknown batchId"}""")
    assert(inv.headers == r.headers && inv.key.sameElements(r.key))
    assert(inv.topic == r.topic && inv.partition == 3 && inv.offset == 42L)
  }

  test("property: headers round-trip byte-for-byte through asInvalid, dup keys kept") {
    val genHeader = for {
      k <- Gen.alphaStr.suchThat(_.nonEmpty)
      v <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    } yield HriHeader(k, v)
    check(Prop.forAll(Gen.listOf(genHeader)) { hs =>
      val r = HriRecord(hs, null, "x".getBytes(UTF_8), "t", 0, 0L)
      val inv = r.asInvalid("m")
      inv.headers.size == hs.size &&
        inv.headers.zip(hs).forall { case (a, b) => a.key == b.key && a.value.sameElements(b.value) }
    })
  }

  val genTricky: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '\r', 'あ', 'Б', '᛫', ' ')))
    .map(_.mkString)

  test("property: notification JSON round-trips arbitrary unicode/escape-heavy field content") {
    check(Prop.forAll(genTricky, genTricky, Gen.option(Gen.choose(0, 1000000))) {
      (name, dt, exp) =>
        val n = BatchNotification("id", name, "started", dt,
          "2020-01-01T00:00:00Z", "2020-01-02T00:00:00Z", exp, "ingest.t.s.in")
        NotificationJson.parse(NotificationJson.render(n).getBytes(UTF_8)) == n
    })
  }

  test("property: asInvalid messages with quotes/newlines stay parseable JSON with the exact text") {
    check(Prop.forAll(genTricky) { msg =>
      val r = HriRecord(Seq.empty, null, "x".getBytes(UTF_8), "t", 0, 0L)
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.asInvalid(msg).value)
      node.path("failure").asText == msg
    })
  }

  test("batchId helper reads the UTF-8 batchId header; None when absent") {
    val r = HriRecord(Seq(HriHeader("batchId", "batch-42".getBytes(UTF_8))),
      null, Array[Byte](), "t", 0, 0L)
    assert(r.batchId.contains("batch-42"))
    assert(HriRecord(Seq.empty, null, Array[Byte](), "t", 0, 0L).batchId.isEmpty)
  }

  test("headerValue finds an arbitrary header by key and returns None when absent") {
    val r = HriRecord(Seq(
      HriHeader("originator", "mgmt-api".getBytes(UTF_8)),
      HriHeader("batchId", "b1".getBytes(UTF_8))),
      null, Array[Byte](), "t", 0, 0L)
    assert(r.headerValue("originator").map(new String(_, UTF_8)).contains("mgmt-api"))
    assert(r.headerValue("nope").isEmpty)
  }

  test("Topics.validate enforces the reference's ingest.*.in input-topic contract") {
    assert(Topics.validate("ingest.tenant.stream.in").isRight)
    val noPrefix = Topics.validate("tenant.stream.in")
    assert(noPrefix.isLeft && noPrefix.swap.exists(_.contains("""must start with "ingest."""")))
    val noSuffix = Topics.validate("ingest.tenant.stream.out")
    assert(noSuffix.isLeft && noSuffix.swap.exists(_.contains("""must end with ".in"""")))
  }
}
