package graft.streaming

import scala.util.{Failure, Success, Try}

/** External batch-metadata lookup, called ONLY on a state miss — per batch,
  * not per record, so the external QPS stays negligible at any scale
  * (SURVEY §2.2 O6). Parity with the reference BatchLookup interface:
  * `getBatchId(tenantId, batchId): Try[BatchNotification]`. */
trait BatchLookup extends Serializable {
  def getBatchId(tenantId: String, batchId: String): Try[BatchNotification]
}

/** 404-style failure carrying an HTTP-ish status code (parity with the
  * reference's RequestException used by MapBatchLookupJava.java:41-43). */
class BatchLookupException(message: String, val statusCode: Int)
    extends RuntimeException(message)

/** In-memory test double — parity with MapBatchLookupJava.java:23-45:
  * keyed by batchId only, unknown id ⇒ Failure(404 Not found). */
class MapBatchLookup(notifications: Seq[BatchNotification]) extends BatchLookup {
  private val byId: Map[String, BatchNotification] =
    notifications.map(n => n.id -> n).toMap

  override def getBatchId(tenantId: String, batchId: String): Try[BatchNotification] =
    byId.get(batchId) match {
      case Some(n) => Success(n)
      case None    => Failure(new BatchLookupException("Not found", 404))
    }
}
