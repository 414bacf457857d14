package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** CLI/topic validation parity — the matrix of
  * PassthroughStreamingJobTest.java:38-121 (every missing-arg case, the
  * standalone-XOR-mgmt group, and both bad-topic-name aborts). */
class CliSpec extends AnyFunSuite {

  val good = Array("-b", "broker1:9093,broker2:9093", "-p", "pw",
    "-i", "ingest.tenant.stream.in", "--standalone")

  test("valid standalone args parse; brokers comma-split; delay defaults to 300000") {
    val c = Main.parse(good).toOption.get
    assert(c.brokers == Seq("broker1:9093", "broker2:9093"))
    assert(c.input == "ingest.tenant.stream.in")
    assert(c.batchCompletionDelayMs == 300000L)
    assert(c.standalone)
  }

  test("valid mgmt-mode args parse with all five options") {
    val c = Main.parse(Array("-b", "b:9093", "-i", "ingest.t.s.in",
      "-m", "https://mgmt", "-c", "id", "-s", "secret", "-a", "aud", "-o", "https://oauth",
      "-d", "5000")).toOption.get
    assert(!c.standalone && c.mgmtUrl.contains("https://mgmt"))
    assert(c.batchCompletionDelayMs == 5000L)
  }

  test("missing --brokers rejected") {
    assert(Main.parse(Array("-i", "ingest.t.s.in", "--standalone"))
      .left.exists(_.contains("--brokers")))
  }

  test("missing --input rejected") {
    assert(Main.parse(Array("-b", "b:9093", "--standalone"))
      .left.exists(_.contains("--input")))
  }

  test("neither --standalone nor mgmt group rejected") {
    assert(Main.parse(Array("-b", "b:9093", "-i", "ingest.t.s.in")).isLeft)
  }

  test("--standalone plus mgmt options rejected (exclusive group)") {
    assert(Main.parse(Array("-b", "b:9093", "-i", "ingest.t.s.in",
      "--standalone", "-m", "https://mgmt")).isLeft)
  }

  test("partial mgmt group rejected (all five required together)") {
    assert(Main.parse(Array("-b", "b:9093", "-i", "ingest.t.s.in",
      "-m", "https://mgmt", "-c", "id")).isLeft)
  }

  test("topic must start with ingest.") {
    assert(Main.parse(Array("-b", "b:9093", "-i", "bad.t.s.in", "--standalone"))
      .left.exists(_.contains("must start with 'ingest.'")))
  }

  test("topic must end with .in") {
    assert(Main.parse(Array("-b", "b:9093", "-i", "ingest.t.s.out", "--standalone"))
      .left.exists(_.contains("must end with '.in'")))
  }

  test("unknown option rejected") {
    assert(Main.parse(good :+ "--bogus").left.exists(_.contains("Unknown option")))
  }

  test("topic derivation: .in → .out/.invalid/.notification, tenant, consumer group") {
    val t = Topics("ingest.porcupine.data-int1.in")
    assert(t.out == "ingest.porcupine.data-int1.out")
    assert(t.invalid == "ingest.porcupine.data-int1.invalid")
    assert(t.notification == "ingest.porcupine.data-int1.notification")
    assert(t.tenant == "porcupine")
    assert(t.consumerGroup ==
      "hri-validation-ingest.porcupine.data-int1.in-ingest.porcupine.data-int1.out")
  }
}
