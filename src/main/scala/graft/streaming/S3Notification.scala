package graft.streaming

import graft.core._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Content-store abstraction standing in for the reference's S3 re-read at
  * ingest time (`record.py:95-122` `list_from_url`): resolve a url to its
  * embedded metadata document plus object stats. */
trait ContentStore extends Serializable {
  /** @return (metadata, size bytes, create_time ms)
    * @throws NoSuchDatalakeFile if the url does not resolve */
  def fetch(url: String): (Metadata, Long, Long)
}

/** One parsed S3 event (`s3_notification.py:38-85`). `bucketName` /
  * `keyName` are null when the event carried no such field. */
final case class S3Event(
    eventName: String,
    eventVersion: String,
    bucketName: String,
    keyName: String) {
  /** KeyError parity (`s3_notification.py:74-79`): a missing
    * s3.bucket.name / s3.object.key surfaces HERE — lazily, where the
    * reference first dereferences it, so an unsupported event with no
    * s3 block still fails as the SAFE UnsupportedS3Event — and as
    * NoSuchElementException, which is NOT in the safe set: the
    * message must redeliver for investigation, never be deleted as
    * handled with an empty-url error report (a silent default of ""
    * here turned malformed events into NoSuchDatalakeFile, which IS
    * safe — permanent, unrecoverable discard). */
  def s3Url: String = {
    if (bucketName == null) throw new NoSuchElementException(
      s"event $eventName has no s3.bucket.name")
    if (keyName == null) throw new NoSuchElementException(
      s"event $eventName has no s3.object.key")
    s"s3://$bucketName/$keyName"
  }
}

/** SNS-envelope S3 notification (`s3_notification.py:22-35`): the `Message`
  * field is embedded JSON carrying either `Records[]` or an
  * `Event: s3:TestEvent` no-op marker. */
final case class S3Notification(events: Seq[S3Event])

object S3Notification {

  /** Event names that carry records (`s3_notification.py:40-44`). */
  val EventsWithRecords = Set(
    "ObjectCreated:Put",
    "ObjectCreated:Copy",
    "ObjectCreated:CompleteMultipartUpload")

  def parse(notificationJson: String): S3Notification = {
    val envelope =
      try JsonMethods.parse(notificationJson)
      catch {
        case _: Exception =>
          throw new InvalidS3Notification(s"not valid json: $notificationJson")
      }
    val message = envelope \ "Message" match {
      case JString(m) => m
      case _ => throw new InvalidS3Notification("null")
    }
    val parsed =
      try JsonMethods.parse(message)
      catch {
        case _: Exception =>
          throw new InvalidS3Notification(s"Message is not valid json")
      }
    parsed \ "Event" match {
      case JString("s3:TestEvent") => S3Notification(Nil)
      case _ =>
        val records = parsed \ "Records" match {
          case JArray(rs) => rs
          case _ => throw new InvalidS3Notification("Message has no Records")
        }
        S3Notification(records.map(parseEvent))
    }
  }

  private def parseEvent(j: JValue): S3Event = {
    def compact(v: JValue) = JsonMethods.compact(JsonMethods.render(v))
    val version = j \ "eventVersion" match {
      case JString(v) => v
      case _ =>
        throw new InvalidS3Event(s"No eventVersion: ${compact(j)}")
    }
    if (!version.startsWith("2."))
      throw new InvalidS3Event(s"Unsupported event version: ${compact(j)}")
    val name = j \ "eventName" match {
      case JString(n) => n
      case _ => throw new InvalidS3Event(s"No eventName: ${compact(j)}")
    }
    val bucket = j \ "s3" \ "bucket" \ "name" match {
      case JString(b) => b
      case _ => null
    }
    val key = j \ "s3" \ "object" \ "key" match {
      case JString(k) => k
      case _ => null
    }
    S3Event(name, version, bucket, key)
  }
}
