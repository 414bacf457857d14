package graft.streaming

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.util.{Failure, Success}

/** Real-HTTP tests for the production Management-API surfaces — O6
  * (HttpBatchLookup, reference getBatchId contract
  * MapBatchLookupJava.java:23-45) and K4 (HttpMgmtClient status PUT) — run
  * against a loopback com.sun.net.httpserver server, so the OAuth flow,
  * headers, response mapping, and error paths are exercised end-to-end
  * without any egress. */
class MgmtHttpSpec extends AnyFunSuite with BeforeAndAfterAll {

  val Topic = "ingest.porcupine.data-int1.in"
  val KnownBatch = "batch-42"

  def notifJson(id: String, status: String): String =
    s"""{"id":"$id","name":"TestBatchName","status":"$status","dataType":"procedure",
       |"startDate":"2020-04-08T03:02:23Z","endDate":"2020-04-11T16:02:44Z",
       |"expectedRecordCount":5,"topic":"$Topic","invalidThreshold":-1,
       |"metadata":{"compression":"gzip"}}""".stripMargin

  private var server: HttpServer = _
  private var base: String = _
  val tokenCalls = new AtomicInteger(0)
  val authHeaders = new ConcurrentLinkedQueue[String]()
  val putBodies = new ConcurrentLinkedQueue[(String, String)]() // (path, body)

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os: OutputStream = x.getResponseBody
      os.write(bytes); os.close()
    } else x.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/oauth/token", (x: HttpExchange) => {
      tokenCalls.incrementAndGet()
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      if (body.contains("client_id=good-client") && body.contains("grant_type=client_credentials"))
        respond(x, 200, """{"access_token":"tok-abc","expires_in":3600,"token_type":"Bearer"}""")
      else respond(x, 401, """{"error":"access_denied"}""")
    })
    server.createContext("/mgmt/tenants/", (x: HttpExchange) => {
      authHeaders.add(Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      val path = x.getRequestURI.getPath // /mgmt/tenants/<t>/batches/<id>[/status]
      val parts = path.split('/').drop(2) // tenants, <t>, batches, <id>[, status]
      (x.getRequestMethod, parts) match {
        case ("PUT", Array("tenants", _, "batches", _, "status")) =>
          putBodies.add((path, new String(x.getRequestBody.readAllBytes(), UTF_8)))
          respond(x, 200, "")
        case ("GET", Array("tenants", "porcupine", "batches", KnownBatch)) =>
          respond(x, 200, notifJson(KnownBatch, BatchStatus.Completed))
        case ("GET", Array("tenants", _, "batches", "boom")) =>
          respond(x, 500, """{"error":"internal"}""")
        case ("GET", _) =>
          respond(x, 404, """{"errorEventId":"x","errorDescription":"batch not found"}""")
        case _ =>
          respond(x, 405, "")
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  def lookup(clientId: String = "good-client"): HttpBatchLookup =
    new HttpBatchLookup(s"$base/mgmt", clientId, "secret", "hri-aud", s"$base/oauth")

  test("O6: 200 maps to Success with the parsed notification") {
    lookup().getBatchId("porcupine", KnownBatch) match {
      case Success(n) =>
        assert(n.id == KnownBatch && n.status == BatchStatus.Completed)
        assert(n.expectedRecordCount.contains(5))
        assert(n.metadata.contains("""{"compression":"gzip"}"""))
      case Failure(e) => fail(s"expected success: $e")
    }
  }

  test("O6: 404 maps to Failure(404) — the unknown-batch invalid path") {
    lookup().getBatchId("porcupine", "no-such-batch") match {
      case Failure(e: BatchLookupException) => assert(e.statusCode == 404)
      case other                            => fail(s"expected 404 failure: $other")
    }
  }

  test("O6: 5xx maps to Failure(status) — record conservatively invalid-routed") {
    lookup().getBatchId("porcupine", "boom") match {
      case Failure(e: BatchLookupException) => assert(e.statusCode == 500)
      case other                            => fail(s"expected 500 failure: $other")
    }
  }

  test("O6: OAuth failure surfaces as Failure, and the bearer token is attached + cached") {
    lookup(clientId = "bad-client").getBatchId("porcupine", KnownBatch) match {
      case Failure(e: BatchLookupException) => assert(e.statusCode == 401)
      case other                            => fail(s"expected 401 failure: $other")
    }
    val l = lookup()
    val before = tokenCalls.get()
    l.getBatchId("porcupine", KnownBatch)
    l.getBatchId("porcupine", "no-such-batch")
    l.getBatchId("porcupine", KnownBatch)
    assert(tokenCalls.get() == before + 1, "token must be fetched once and cached")
    assert(authHeaders.toArray.takeRight(3).forall(_ == "Bearer tok-abc"))
  }

  test("K4: putStatus PUTs the notification JSON with the bearer token") {
    val client = new HttpMgmtClient(s"$base/mgmt", "good-client", "secret", "hri-aud", s"$base/oauth")
    val json = notifJson(KnownBatch, BatchStatus.Completed)
    assert(client.putStatus("porcupine", KnownBatch, json).isSuccess)
    val (path, body) = putBodies.peek()
    assert(path == s"/mgmt/tenants/porcupine/batches/$KnownBatch/status")
    assert(body == json)
  }

  test("K4: non-2xx PUT maps to Failure") {
    val client = new HttpMgmtClient(s"$base/mgmt", "bad-client", "secret", "hri-aud", s"$base/oauth")
    assert(client.putStatus("porcupine", KnownBatch, "{}").isFailure)
  }

  test("O6 end-to-end: state-miss in the tracker resolves through real HTTP and processes the record") {
    // The production wiring: a record for an evicted/unseen batch triggers
    // the mgmt lookup; here the API answers `completed`, so the record is
    // invalid-routed with the exact clause-5 message and state re-seeds.
    val tracker = new BatchTracker(PassthroughValidator, lookup(), "porcupine", 100L)
    val st = org.apache.spark.sql.streaming.TestGroupState.create[BatchProgress](
      org.apache.spark.api.java.Optional.empty[BatchProgress](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val rec = HriRecord(Seq(HriHeader("batchId", KnownBatch.getBytes(UTF_8))),
      "k1".getBytes(UTF_8), "body".getBytes(UTF_8), Topic, 0, 1L)
    val out = tracker.trackBatch(KnownBatch,
      Iterator(PipelineEvent.of(rec, 0)), st).toSeq
    assert(out.map(_.tag) == Seq(Output.Invalid))
    assert(new String(out.head.record.get.value, UTF_8) ==
      """{"failure":"Record received after batch completed"}""")
    assert(st.get.status == BatchStatus.Completed)
  }

  test("Main wiring: production config gets the HTTP lookup, standalone the empty map") {
    val prod = Main.parse(Array("-b", "k:9093", "-i", Topic,
      "-m", s"$base/mgmt", "-c", "good-client", "-s", "secret",
      "-a", "hri-aud", "-o", s"$base/oauth")).toOption.get
    assert(Main.lookupFor(prod).isInstanceOf[HttpBatchLookup])
    val standalone = Main.parse(Array("-b", "k:9093", "-i", Topic, "--standalone")).toOption.get
    assert(Main.lookupFor(standalone).isInstanceOf[MapBatchLookup])
  }
}
