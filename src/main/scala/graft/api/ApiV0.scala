package graft.api

import graft.core.{Cursor, Metadata, QueryValidationError}
import graft.query.{QueryPage, UnpackedRecord}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parsed/validated `/v0/archive/files/` query
  * (`api/datalake_api/v0.py:153-191`). */
final case class FilesQuery(
    what: String,
    where: Option[String],
    workId: Option[String],
    start: Option[Long],
    end: Option[Long],
    cursor: Option[Cursor])

/** The reference API's parameter-validation and response-decoration layer,
  * HTTP-framework-free: validation raises `QueryValidationError` with the
  * reference's exact error codes (tested in
  * `api/tests/test_bad_queries.py:32-135`), responses are json4s values.
  */
object ApiV0 {

  import QueryValidationError._

  /** `_validate_files_params` (`v0.py:153-177`): the full 400 matrix. */
  def validateFilesParams(params: Map[String, String]): FilesQuery = {
    if (params.isEmpty)
      throw QueryValidationError(NoArgs, "Please provide minimal query arguments")
    if (!params.contains("what"))
      throw QueryValidationError(NoWhat, "You must provide the `what` paramater")
    val hasWork = params.contains("work_id")
    val hasStart = params.contains("start")
    val hasEnd = params.contains("end")
    if (!hasWork && !hasStart && !hasEnd)
      throw QueryValidationError(NoWorkInterval,
        "You must provide either work_id or start/end")
    if (hasWork && (hasStart || hasEnd))
      throw QueryValidationError(InvalidWorkInterval,
        "You must provide only work_id or start/end. Not both.")
    if (hasStart != hasEnd)
      throw QueryValidationError(InvalidWorkInterval,
        "start and end must always be provided together.")
    def toMs(key: String): Option[Long] = params.get(key).map { v =>
      try Metadata.normalizeDate(v)
      catch {
        case _: Exception => throw QueryValidationError(InvalidTime,
          s"$key must be milliseconds since the epoch.")
      }
    }
    val start = toMs("start")
    val end = toMs("end")
    for (s <- start; e <- end)
      if (s > e)
        throw QueryValidationError(InvalidWorkInterval, "start must be before end")
    val cursor = params.get("cursor").map(Cursor.fromSerialized)
    FilesQuery(params("what"), params.get("where"), params.get("work_id"),
      start, end, cursor)
  }

  /** `_validate_lookback` (`v0.py:528-540`). */
  def validateLookback(lookback: String): Int =
    try lookback.toInt
    catch {
      case _: NumberFormatException =>
        throw QueryValidationError(InvalidLookback,
          s"lookback must be an integer not $lookback")
    }

  /** `unix_ms_to_utc_iso` (`v0.py:35-44`): ms precision, Z suffix. */
  def unixMsToUtcIso(unixMs: Long): String = Metadata.toIso8601(unixMs)

  /** Record → response JSON with `http_url` and `start_iso`/`end_iso`
    * decoration (`v0.py:47-63,394-407`); `end` forced present. */
  def recordJson(r: UnpackedRecord, baseUrl: String): JObject = {
    val m = r.metadata
    JObject(List(
      "url" -> JString(r.url),
      "http_url" ->
        JString(s"$baseUrl/v0/archive/files/${m.id}/data"),
      "metadata" -> metadataJson(graft.store.RecordRow.toMeta(m))) ++
      r.createTime.map(ct => "create_time" -> JLong(ct): JField).toList ++
      r.size.map(sz => "size" -> JLong(sz): JField).toList)
  }

  /** Metadata document decorated with `start_iso`/`end_iso`
    * (`add_utc_metadata`, `v0.py:47-63`) — also the body of the
    * `/files/<id>/metadata` route (`v0.py:498-527`). */
  def metadataJson(m: Metadata): JObject = {
    // decorate Metadata.toJValue rather than re-listing its nine fields:
    // a field added there must show up here without a second edit
    val base = m.toJValue match {
      case JObject(fields) => fields
      case other => throw new IllegalStateException(
        s"Metadata.toJValue must render an object, got $other")
    }
    JObject(base ++ List(
      "start_iso" -> JString(unixMsToUtcIso(m.start)),
      "end_iso" -> m.end.map(e => JString(unixMsToUtcIso(e)))
        .getOrElse(JNull)))
  }

  /** `{records, next}` page envelope (`v0.py:410-419`): `next` is the
    * request url with the serialized cursor swapped in. */
  def filesResponse(
      page: QueryPage,
      baseUrl: String,
      params: Map[String, String]): JObject = {
    val next = page.cursor.map { c =>
      val args = (params + ("cursor" -> c.serialized)).toSeq.sortBy(_._1)
        .map { case (k, v) =>
          java.net.URLEncoder.encode(k, "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }.mkString("&")
      JString(s"$baseUrl/v0/archive/files/?$args"): JValue
    }.getOrElse(JNull)
    JObject(
      "records" -> JArray(page.records.map(recordJson(_, baseUrl)).toList),
      "next" -> next)
  }

  /** 4xx error body (`v0.py:136-140`). */
  def errorJson(e: QueryValidationError): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "message" -> JString(e.message), "code" -> JString(e.code))))

  /** Latest-miss 404 message (`v0.py:456-465`). */
  def noSuchLatest(what: String, where: String, lookback: Int): QueryValidationError =
    QueryValidationError(NoSuchFile,
      s"""No "$what" files found in last $lookback days from "$where"""")

  /** `_get_filename_from_template` (`archive.py:379-403`): `{field}`
    * templating over metadata plus start_iso/end_iso; unknown variables are
    * user errors; None template ⇒ `{id}`. */
  def filenameFromTemplate(template: Option[String], m: Metadata): String = {
    val vars: Map[String, String] = Map(
      "version" -> m.version.toString,
      "start" -> m.start.toString,
      "end" -> m.end.map(_.toString).getOrElse("None"),
      "where" -> m.where,
      "what" -> m.what,
      "work_id" -> m.workId.getOrElse("None"),
      "path" -> m.path,
      "id" -> m.id,
      "hash" -> m.hash,
      "start_iso" -> isoNoZone(m.start),
      "end_iso" -> m.end.map(isoNoZone).getOrElse("None"))
    val t = template.getOrElse("{id}")
    val out = new StringBuilder
    var i = 0
    // str.format's brace grammar: '{{'/'}}' are literal braces, a lone
    // '}' is a ValueError ("Single '}' ...") mapped to InvalidDatalakePath
    // (archive.py:393-394) — passing it through silently would write a
    // file the reference refuses to write
    while (i < t.length) {
      t.charAt(i) match {
        case '{' if i + 1 < t.length && t.charAt(i + 1) == '{' =>
          out += '{'; i += 2
        case '{' =>
          val close = t.indexOf('}', i)
          if (close < 0)
            throw QueryValidationError("InvalidDatalakePath",
              "Single '{' encountered in format string")
          val name = t.substring(i + 1, close)
          out ++= vars.getOrElse(name,
            throw QueryValidationError("InvalidDatalakePath",
              s""""'$name'" does not appear to be a supported template variable."""))
          i = close + 1
        case '}' if i + 1 < t.length && t.charAt(i + 1) == '}' =>
          out += '}'; i += 2
        case '}' =>
          throw QueryValidationError("InvalidDatalakePath",
            "Single '}' encountered in format string")
        case c => out += c; i += 1
      }
    }
    out.result()
  }

  /** `_ms_to_iso` (`archive.py:397-403`): ms precision, no zone suffix. */
  private def isoNoZone(ms: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))
}

/** Content-type / encoding sniffing for the fetch path
  * (`api/datalake_api/fetcher.py:20-67`): mimetype by path extension with
  * trailing-checksum strip, gzip magic on the first KB. */
object ContentSniffer {

  val HeaderBytes = 1024

  private val TrailingChecksum = "(.+)-[0-9a-f]{32,40}?$".r
  private val GzipMagic: Array[Byte] =
    Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte)

  private val MimeTypes = Map(
    ".txt" -> "text/plain", ".log" -> "text/plain",
    ".json" -> "application/json", ".xml" -> "application/xml",
    ".csv" -> "text/csv", ".html" -> "text/html",
    ".gz" -> "application/gzip", ".zip" -> "application/zip",
    ".pdf" -> "application/pdf")

  def adjustedPath(path: String): String = path match {
    case TrailingChecksum(p) => p
    case _ => path
  }

  def contentType(path: String): Option[String] = {
    val p = adjustedPath(path)
    val dot = p.lastIndexOf('.')
    if (dot < 0) None else MimeTypes.get(p.substring(dot).toLowerCase)
  }

  def contentEncoding(header: Array[Byte]): Option[String] =
    if (header.length >= 3 && header.take(3).sameElements(GzipMagic))
      Some("gzip")
    else None
}
