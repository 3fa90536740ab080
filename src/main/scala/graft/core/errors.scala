package graft.core

/** Error ADT mirroring the reference's exception surface.
  *
  * Reference: client/datalake/common/errors.py and the exceptions raised in
  * client/datalake/common/metadata.py:101-169, record.py:171-182,
  * ingester/datalake_ingester/ingester.py:16-25.
  */
sealed abstract class DatalakeError(msg: String) extends Exception(msg)

/** Invalid metadata document (missing/bad fields). metadata.py:101-169 */
final class InvalidDatalakeMetadata(msg: String) extends DatalakeError(msg)

/** version != 0. metadata.py:117-122 */
final class UnsupportedDatalakeMetadataVersion(msg: String)
    extends DatalakeError(msg)

/** Interval spans more than MAXIMUM_BUCKET_SPAN buckets. record.py:171-182 */
final class UnsupportedTimeRange(msg: String) extends DatalakeError(msg)

/** S3 notification malformed / unsupported event version.
  * ingester/datalake_ingester/s3_notification.py:22-61 */
final class InsufficientConfiguration(msg: String) extends DatalakeError(msg)
final class UnsupportedS3Event(msg: String) extends DatalakeError(msg)
final class InvalidS3Notification(msg: String) extends DatalakeError(msg)
final class InvalidS3Event(msg: String) extends DatalakeError(msg)

/** File referenced by an event does not exist in the content store.
  * client/datalake/common/record.py:95-122 */
final class NoSuchDatalakeFile(msg: String) extends DatalakeError(msg)

/** Translator expression / application errors. translator.py:24-99 */
final class TranslatorError(msg: String) extends DatalakeError(msg)

/** HTTP archive API returned an error response.
  * client/datalake/common/errors.py (DatalakeHttpError),
  * client/datalake/archive.py:175-185 (_check_http_response). */
final class DatalakeHttpError(msg: String) extends DatalakeError(msg)

/** Fetch url outside the configured storage/http bases, or an unusable
  * filename template. client/datalake/archive.py:82-91,418-423 */
final class InvalidDatalakePath(msg: String) extends DatalakeError(msg)

/** Query-parameter validation errors with the reference API's error codes.
  * api/datalake_api/v0.py:153-191; tested api/tests/test_bad_queries.py.
  */
final case class QueryValidationError(code: String, message: String)
    extends DatalakeError(s"$code: $message")

object QueryValidationError {
  val NoArgs = "NoArgs"
  val NoWhat = "NoWhat"
  val NoWorkInterval = "NoWorkInterval"
  val InvalidWorkInterval = "InvalidWorkInterval"
  val InvalidTime = "InvalidTime"
  val InvalidCursor = "InvalidCursor"
  val NoSuchFile = "NoSuchFile"
  val InvalidLookback = "InvalidLookback"
}
