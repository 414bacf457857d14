package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import scala.util.Try

/** OAuth client-credentials token flow shared by the Management-API
  * writeback (K4) and the production batch lookup (O6) — the reference
  * passes the same clientId/clientSecret/audience/oauthBaseUrl 4-tuple to
  * both paths (PassthroughStreamingJob.java:71-86,114-117). Tokens are
  * cached until shortly before expiry: both callers are per-batch (state
  * transitions / state misses), so the token endpoint sees O(batches/hour)
  * requests, but there is no reason to pay even that per call. */
private[streaming] class OAuthTokenSource(
    clientId: String,
    clientSecret: String,
    audience: String,
    oauthBaseUrl: String)
    extends Serializable {

  @transient private lazy val http =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  // (token, epochMillis deadline); refreshed 60 s before expiry
  @transient private var cached: (String, Long) = ("", 0L)

  def token(): String = synchronized {
    val now = System.currentTimeMillis()
    if (cached == null || cached._2 <= now) {
      val body =
        s"grant_type=client_credentials&client_id=$clientId&client_secret=$clientSecret&audience=$audience"
      val req = HttpRequest.newBuilder(URI.create(s"$oauthBaseUrl/token"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
        .build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new BatchLookupException(
          s"OAuth token request failed: ${resp.statusCode()}", resp.statusCode())
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(resp.body())
      val expiresInSec = node.path("expires_in").asLong(0L)
      cached = (node.path("access_token").asText(),
        now + math.max(0L, expiresInSec * 1000 - 60000))
    }
    cached._1
  }

  private[streaming] def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())
}

/** Management-API writeback (SURVEY §2.2 K4): in production mode the job
  * PUTs batch status transitions to the HRI Management API using OAuth
  * client-credentials (reference PassthroughStreamingJob.java:71-86,114-117).
  * Standalone mode skips it entirely (:107-110). Injectable for tests. */
trait MgmtClient extends Serializable {
  /** Idempotent status writeback; at-least-once acceptable because keyed
    * state makes transitions deterministic (SURVEY §4). */
  def putStatus(tenantId: String, batchId: String, notificationJson: String): Try[Unit]
}

/** Records calls; the test double for job specs. */
class RecordingMgmtClient extends MgmtClient {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
  override def putStatus(tenantId: String, batchId: String, notificationJson: String): Try[Unit] =
    Try(calls.add((tenantId, batchId, notificationJson)))
}

/** HTTP implementation: OAuth client-credentials token, then
  * PUT {mgmtUrl}/tenants/{tenant}/batches/{batchId}/status. Exercised
  * against a loopback HTTP server in MgmtHttpSpec (no egress in the dev
  * sandbox). */
class HttpMgmtClient(
    mgmtUrl: String,
    clientId: String,
    clientSecret: String,
    audience: String,
    oauthBaseUrl: String)
    extends MgmtClient {

  private val oauth = new OAuthTokenSource(clientId, clientSecret, audience, oauthBaseUrl)

  override def putStatus(tenantId: String, batchId: String, notificationJson: String): Try[Unit] = Try {
    val req = HttpRequest.newBuilder(
        URI.create(s"$mgmtUrl/tenants/$tenantId/batches/$batchId/status"))
      .header("Authorization", s"Bearer ${oauth.token()}")
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(notificationJson, UTF_8))
      .build()
    val resp = oauth.send(req)
    if (resp.statusCode() >= 300)
      throw new BatchLookupException(s"Status PUT failed: ${resp.statusCode()}", resp.statusCode())
  }
}

/** Production BatchLookup (SURVEY §2.2 O6): on a state miss the tracker
  * asks the Management API for the batch —
  * GET {mgmtUrl}/tenants/{tenant}/batches/{batchId} with the same OAuth
  * flow as the writeback (reference PassthroughStreamingJob.java:114-117
  * wires mgmt credentials into the job precisely so pipeline-core's
  * getBatchId can do this; interface contract MapBatchLookupJava.java:23-45).
  *
  * Response mapping, pinned by MgmtHttpSpec against a loopback server:
  * 200 ⇒ Success(parsed BatchNotification); 404 ⇒ Failure(404) — the
  * tracker routes the record to invalid with the exact unknown-batch
  * message; other non-2xx ⇒ Failure(status) — also invalid-routed (the
  * conservative choice: a record is never forwarded while the batch is
  * unverifiable). Called once per UNKNOWN batch, not per record, so QPS
  * against the API stays negligible at any scale. */
class HttpBatchLookup(
    mgmtUrl: String,
    clientId: String,
    clientSecret: String,
    audience: String,
    oauthBaseUrl: String)
    extends BatchLookup {

  private val oauth = new OAuthTokenSource(clientId, clientSecret, audience, oauthBaseUrl)

  override def getBatchId(tenantId: String, batchId: String): Try[BatchNotification] = Try {
    val req = HttpRequest.newBuilder(
        URI.create(s"$mgmtUrl/tenants/$tenantId/batches/$batchId"))
      .header("Authorization", s"Bearer ${oauth.token()}")
      .GET()
      .build()
    val resp = oauth.send(req)
    if (resp.statusCode() != 200)
      throw new BatchLookupException(s"Batch GET failed: ${resp.statusCode()}", resp.statusCode())
    NotificationJson.parse(resp.body().getBytes(UTF_8))
  }
}
