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

  // reference matrix (PassthroughStreamingJobTest.java:64-94): every
  // missing mgmt option is named individually
  val mgmtAll = Map("-m" -> "https://mgmt", "-c" -> "id", "-s" -> "sec",
    "-a" -> "aud", "-o" -> "https://oauth")
  val expectedName = Map(
    "-m" -> "--mgmt-url=<mgmtUrl>", "-c" -> "--client-id=<mgmtClientId>",
    "-s" -> "--client-secret=<mgmtClientSecret>", "-a" -> "--audience=<mgmtAudience>",
    "-o" -> "--oauth-url=<oauthServiceBaseUrl>")
  mgmtAll.keys.foreach { missing =>
    test(s"missing mgmt option $missing is named in the error") {
      val args = Array("-b", "b:9093", "-i", "ingest.t.s.in") ++
        (mgmtAll - missing).flatMap { case (k, v) => Seq(k, v) }
      val e = Main.parse(args).left.toOption.get
      assert(e.contains("Missing required option") && e.contains(expectedName(missing)))
    }
  }

  test("picocli-style --flag=value syntax accepted (the form the reference tests use)") {
    val c = Main.parse(Array("--brokers=b1:9093,b2:9093",
      "--input=ingest.t.s.in", "--standalone")).toOption.get
    assert(c.brokers == Seq("b1:9093", "b2:9093") && c.input == "ingest.t.s.in")
  }

  test("bare non-flag token → Unmatched argument (invalid password parity)") {
    val e = Main.parse(Array("-b", "b:9093", "-i", "ingest.t.s.in",
      "3737464=FakePassword", "--standalone")).left.toOption.get
    assert(e.contains("Unmatched argument at index") && e.contains("3737464=FakePassword"))
  }

  test("topic must start with ingest. (reference message shape)") {
    val e = Main.parse(Array("-b", "b:9093",
      "--input=ingest-monkey22-noPeriodSeparators", "--standalone")).left.toOption.get
    assert(e.contains("The Input Topic Name ingest-monkey22-noPeriodSeparators is invalid"))
    assert(e.contains("""It must start with "ingest.""""))
  }

  test("topic must end with .in (reference message shape)") {
    val e = Main.parse(Array("-b", "b:9093",
      "--input=ingest.monkey22-no-in-suffix", "--standalone")).left.toOption.get
    assert(e.contains("The Input Topic Name ingest.monkey22-no-in-suffix is invalid"))
    assert(e.contains("""It must end with ".in""""))
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
