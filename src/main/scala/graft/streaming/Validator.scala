package graft.streaming

/** Pluggable per-record validation hook (SURVEY §2.2 O1) — parity with the
  * reference's Validator interface as used by PassthroughValidator.java:18-25:
  * returns (isValid, errorMessage); the message is only meaningful when the
  * record is invalid. */
trait Validator extends Serializable {
  def isValid(record: HriRecord): (Boolean, Option[String])
}

/** Passthrough: never inspects the payload, everything is valid
  * (reference PassthroughValidator.java:20-24). */
object PassthroughValidator extends Validator {
  override def isValid(record: HriRecord): (Boolean, Option[String]) = (true, None)
}
