package graft.core

import java.nio.charset.StandardCharsets
import java.util.Base64
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pagination cursor: base64(JSON) with `=` padding stripped for URLs.
  *
  * Semantics from `api/datalake_api/querier.py:54-143`: a cursor carries the
  * resume position (`current_time_bucket` for time queries, `last_evaluated`
  * for work-id queries — here a plain resume key) and `last_id` for
  * cross-page dedup. Resume is always key-based, never offset-based, so
  * pagination is stable under concurrent ingest.
  */
final case class Cursor(
    currentTimeBucket: Option[Long],
    lastEvaluated: Option[String],
    lastId: Option[String]) {

  if (currentTimeBucket.isEmpty && lastEvaluated.isEmpty)
    throw QueryValidationError(
      QueryValidationError.InvalidCursor, "cursor missing required fields")

  def serialized: String = {
    val fields = List(
      currentTimeBucket.map(b => "current_time_bucket" -> JLong(b)),
      lastEvaluated.map(k => "last_evaluated" -> JString(k)),
      lastId.map(i => "last_id" -> JString(i))).flatten
    val json = JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
    // UTF_8, matching fromSerialized's decoder: json4s renders non-ASCII
    // chars raw (unlike Python's ensure_ascii \u-escapes), so an ASCII
    // encode would mangle a non-ASCII resume key to '?' and the next
    // page would resume from the wrong position
    Base64.getEncoder.encodeToString(json.getBytes(StandardCharsets.UTF_8))
      .replaceAll("=+$", "")
  }
}

object Cursor {

  def fromSerialized(serialized: String): Cursor = {
    try {
      val padded = serialized + "=" * ((4 - serialized.length % 4) % 4)
      val json = new String(Base64.getDecoder.decode(padded),
        StandardCharsets.UTF_8)
      JsonMethods.parse(json) match {
        case JObject(kvs) =>
          val m = kvs.toMap
          def str(k: String): Option[String] = m.get(k).collect {
            case JString(s) => s
          }
          def num(k: String): Option[Long] = m.get(k).collect {
            case JInt(i) => i.toLong
            case JLong(l) => l
            case JDouble(d) => d.toLong
            case JDecimal(d) => d.toLong
          }
          Cursor(num("current_time_bucket"), str("last_evaluated"),
            str("last_id"))
        case _ => throw new IllegalArgumentException("not an object")
      }
    } catch {
      case e: QueryValidationError => throw e
      case _: Exception =>
        throw QueryValidationError(QueryValidationError.InvalidCursor,
          s"Failed to decode cursor $serialized")
    }
  }
}
