package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import scala.util.Try

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
  * PUT {mgmtUrl}/tenants/{tenant}/batches/{batchId}/status. Only reachable
  * in production deployments (no egress in the dev sandbox); the shape is
  * unit-tested via [[RecordingMgmtClient]]. */
class HttpMgmtClient(
    mgmtUrl: String,
    clientId: String,
    clientSecret: String,
    audience: String,
    oauthBaseUrl: String)
    extends MgmtClient {

  @transient private lazy val http =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private def fetchToken(): String = {
    val body =
      s"grant_type=client_credentials&client_id=$clientId&client_secret=$clientSecret&audience=$audience"
    val req = HttpRequest.newBuilder(URI.create(s"$oauthBaseUrl/token"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new BatchLookupException(s"OAuth token request failed: ${resp.statusCode()}", resp.statusCode())
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(resp.body())
    node.path("access_token").asText()
  }

  override def putStatus(tenantId: String, batchId: String, notificationJson: String): Try[Unit] = Try {
    val token = fetchToken()
    val req = HttpRequest.newBuilder(
        URI.create(s"$mgmtUrl/tenants/$tenantId/batches/$batchId/status"))
      .header("Authorization", s"Bearer $token")
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(notificationJson, UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300)
      throw new BatchLookupException(s"Status PUT failed: ${resp.statusCode()}", resp.statusCode())
  }
}
