package graft.api

import graft.core.{DatalakeHttpError, InvalidDatalakePath, Metadata}
import graft.sources.StreamingFile
import java.io.{ByteArrayInputStream, InputStream, OutputStream}
import java.net.{HttpURLConnection, URL, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal injectable HTTP session — the reference lets deployments swap
  * the transport (retry/auth-decorated `requests.Session` subclasses) via
  * `DATALAKE_SESSION_CLASS` (`client/datalake/archive.py:471-487`). The
  * Scala counterpart is this single-method trait: implement `get`, name
  * the class in the `graft.session.class` system property or the
  * `GRAFT_SESSION_CLASS` environment variable (any class with a no-arg
  * constructor), or pass an instance to [[ArchiveClient]] directly.
  */
trait HttpSession {
  def get(url: String): HttpSession.Response
}

object HttpSession {

  /** Seconds-valued env override (the reference's float convention, e.g.
    * `3.05`) converted to ms; the default when absent, unparsable, or
    * non-positive — a 0 would mean INFINITE to HttpURLConnection (the
    * opposite of requests' fail-immediately) and a negative value makes
    * setConnectTimeout throw, so neither is honored. */
  private[api] def envTimeoutMs(name: String, defaultMs: Int): Int =
    sys.env.get(name).flatMap(_.toDoubleOption)
      .map(_ * 1000)
      .filter(ms => ms >= 1 && ms <= Int.MaxValue.toDouble)
      .map(_.toInt)
      .getOrElse(defaultMs)

  /** One HTTP response: status, body stream, and the headers the fetch
    * path cares about. `body` must be fully read or closed by the caller.
    */
  final case class Response(
      status: Int,
      body: InputStream,
      contentType: Option[String] = None,
      contentLength: Option[Long] = None) {
    def bodyBytes(): Array[Byte] =
      try body.readAllBytes()
      finally body.close()
    def bodyString(): String =
      new String(bodyBytes(), StandardCharsets.UTF_8)
  }

  /** Default JDK `HttpURLConnection` session with the reference's timeout
    * contract (`archive.py:51-77`): 3.05 s connect, 31 s read, each
    * overridable through the same environment variables the reference
    * honors (`DATALAKE_CONNECT_TIMEOUT_S` / `DATALAKE_READ_TIMEOUT_S`,
    * in seconds). */
  final class Default(
      connectTimeoutMs: Int = HttpSession.envTimeoutMs(
        "DATALAKE_CONNECT_TIMEOUT_S", 3050),
      readTimeoutMs: Int = HttpSession.envTimeoutMs(
        "DATALAKE_READ_TIMEOUT_S", 31000)) extends HttpSession {
    def get(url: String): Response = {
      val conn = new URL(url).openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("GET")
      val status = conn.getResponseCode
      val stream = Option(
        if (status >= 400) conn.getErrorStream else conn.getInputStream)
        .getOrElse(new ByteArrayInputStream(Array.emptyByteArray))
      Response(status, stream,
        Option(conn.getContentType),
        Some(conn.getContentLengthLong).filter(_ >= 0))
    }
  }

  /** Resolve the session: injected class if configured, else [[Default]]
    * (`archive.py:471-487`). */
  def fromEnv(): HttpSession =
    sys.props.get("graft.session.class")
      .orElse(sys.env.get("GRAFT_SESSION_CLASS")) match {
      case Some(className) =>
        Class.forName(className).getDeclaredConstructor()
          .newInstance().asInstanceOf[HttpSession]
      case None => new Default()
    }
}

/** One listed archive record: the storage url, the HTTP content url, and
  * the validated metadata (`archive.py:133-140` record shape). */
final case class ListedRecord(
    url: String,
    httpUrl: Option[String],
    metadata: Metadata,
    createTime: Option[Long],
    size: Option[Long]) {

  /** Render back to the wire shape (`cli.py:229-239` json format). */
  def toJValue: JObject = JObject(List(
    "url" -> JString(url): JField) ++
    httpUrl.map(u => "http_url" -> JString(u): JField).toList ++
    List("metadata" -> (ApiV0.metadataJson(metadata): JValue): JField) ++
    createTime.map(ct => "create_time" -> JLong(ct): JField).toList ++
    size.map(sz => "size" -> JLong(sz): JField).toList)
}

/** Client-side HTTP archive library — the Scala counterpart of the
  * reference's `Archive` HTTP surface (`client/datalake/archive.py`):
  *
  *   - [[list]]: cursor-following record iterator over
  *     `/v0/archive/files/` (`archive.py:115-157` — the `next` url is
  *     followed transparently, so callers see one lazy stream of records)
  *   - [[latest]]: `/v0/archive/latest/<what>/<where>` (`archive.py:159-167`)
  *   - [[fetch]] / [[fetchStreaming]]: content + metadata by url, the
  *     metadata read from the `/data` → `/metadata` sibling route
  *     (`archive.py:293-315`)
  *   - [[fetchToFilename]]: templated download (`archive.py:317-352`)
  *   - [[cat]]: relay content to an output stream (the CLI `cat` verb,
  *     `client/datalake/scripts/cli.py:290-302`)
  *
  * Error mapping follows `_check_http_response` (`archive.py:175-185`):
  * 400/404 bodies are `{message, code}` → `DatalakeHttpError("message
  * (code)")`; any other non-200 is a generic `DatalakeHttpError`.
  *
  * The transport is the injectable [[HttpSession]]; pass one explicitly or
  * configure `GRAFT_SESSION_CLASS` (the reference's
  * `DATALAKE_SESSION_CLASS` hook).
  */
final class ArchiveClient(
    httpUrl0: String,
    session0: Option[HttpSession] = None) {

  val httpUrl: String = httpUrl0.stripSuffix("/")

  private lazy val session: HttpSession =
    session0.getOrElse(HttpSession.fromEnv())

  // ---- list / latest ----

  /** Lazily iterate every record matching the query, following `next`
    * cursors across pages (`archive.py:141-157`). `start`/`end` accept
    * the polymorphic date forms of `Metadata.normalizeDate`.
    *
    * Parity note: the value is normalized HERE and again by the server
    * (`v0.py:146-147`) — exactly as the reference client does
    * (`archive.py:142-143`). The s/ms heuristic makes the second pass a
    * no-op for any epoch-ms value ≥ 1e11 (post-March-1973); a
    * pre-1973 window double-converts in BOTH systems — a shared,
    * documented reference quirk, kept for wire-level parity. */
  def list(
      what: String,
      start: Option[Any] = None,
      end: Option[Any] = None,
      where: Option[String] = None,
      workId: Option[String] = None,
      cursor: Option[String] = None): Iterator[ListedRecord] = {
    val params = Seq(
      "what" -> Some(what),
      "start" -> start.map(s => Metadata.normalizeDate(s).toString),
      "end" -> end.map(e => Metadata.normalizeDate(e).toString),
      "where" -> where,
      "work_id" -> workId,
      "cursor" -> cursor,
    ).collect { case (k, Some(v)) => k -> v }
    val first = s"$httpUrl/v0/archive/files/?" + params.map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")

    new Iterator[ListedRecord] {
      private var nextUrl: Option[String] = Some(first)
      private var page: List[ListedRecord] = Nil

      private def advance(): Unit =
        while (page.isEmpty && nextUrl.isDefined) {
          val j = getJson(nextUrl.get)
          page = (j \ "records") match {
            case JArray(rs) => rs.map(parseRecord)
            case _ => Nil
          }
          nextUrl = (j \ "next") match {
            case JString(u) => Some(u)
            case _ => None
          }
        }

      def hasNext: Boolean = { advance(); page.nonEmpty }
      def next(): ListedRecord = {
        advance()
        val r = page.head; page = page.tail; r
      }
    }
  }

  /** `/v0/archive/` status document (`v0.py:110-133`): the base url
    * clients push content to, when the deployment exposes one. */
  def storageUrl(): Option[String] =
    (getJson(s"$httpUrl/v0/archive/") \ "storage_url") match {
      case JString(s) => Some(s)
      case _ => None
    }

  /** Most-recent record for (what, where) within the lookback window
    * (`archive.py:159-167`); `DatalakeHttpError` on a 404 miss. */
  def latest(
      what: String,
      where: String,
      lookback: Option[Int] = None): ListedRecord = {
    val qs = lookback.map(l => s"?lookback=$l").getOrElse("")
    parseRecord(getJson(s"$httpUrl/v0/archive/latest/$what/$where$qs"))
  }

  // ---- fetch ----

  /** Fetch a file's content and metadata, fully materialized
    * (`archive.py:264-279,293-302`). */
  def fetch(url: String): (Metadata, Array[Byte]) = {
    val m = metadataForUrl(url)
    (m, checked(session.get(url)).bodyBytes())
  }

  /** Fetch as a chunked [[StreamingFile]] — content is never materialized
    * whole (`archive.py:293-300` StreamingHTTPFile path). */
  def fetchStreaming(url: String, chunkBytes: Int = 64 * 1024): (Metadata, StreamingFile) = {
    val m = metadataForUrl(url)
    (m, StreamingFile.fromInputStream(
      checked(session.get(url)).body, chunkBytes))
  }

  /** Metadata for a `/data` url via its `/metadata` sibling
    * (`archive.py:309-315`). */
  def metadataForUrl(url: String): Metadata = {
    validateFetchUrl(url)
    // trusted decode: the server already validated and normalized. This
    // DELIBERATELY diverges from the reference fetch path, which wraps
    // the response in File(fd, **m) -> Metadata() and thereby re-runs
    // the s/ms normalize_date heuristic (archive.py:293-300) — re-scaling
    // epoch-ms values below 1e11 (pre-1973) a second time. Only the
    // reference's raw-dict _get_metadata_from_http_url uses trust-as-is.
    Metadata.fromValidatedJValue(getJson(url.stripSuffix("/data") + "/metadata"))
  }

  /** Download to a templated filename (`archive.py:317-352`); returns the
    * filename written. Template variables are the metadata fields plus
    * `start_iso`/`end_iso`; `None` ⇒ `{id}`. */
  def fetchToFilename(
      url: String,
      filenameTemplate: Option[String] = None): String = {
    val m = metadataForUrl(url)
    val fname = ApiV0.filenameFromTemplate(filenameTemplate, m)
    // open the data stream BEFORE touching the target: a failed GET must
    // not leave a truncated/empty file at the templated path
    val in = checked(session.get(url)).body
    try {
      Option(Paths.get(fname).getParent).foreach(Files.createDirectories(_))
      Files.copy(in, Paths.get(fname),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally in.close()
    fname
  }

  /** Relay a file's content to `out` without materializing it
    * (`cli.py:290-302`). Returns the byte count. */
  def cat(url: String, out: OutputStream): Long = {
    validateFetchUrl(url)
    streamTo(url, out, closeOut = false)
  }

  // ---- internals ----

  private def streamTo(
      url: String, out: OutputStream, closeOut: Boolean): Long = {
    val in = checked(session.get(url)).body
    try {
      val total = in.transferTo(out)
      out.flush()
      total
    } finally {
      in.close()
      if (closeOut) out.close()
    }
  }

  /** `_validate_fetch_url` (`archive.py:281-282,418-423`): only urls under
    * the configured base, pointing at a `/data` object. The base check is
    * separator-aware — `http://host:8080.evil.example/...` must not pass
    * for base `http://host:8080`. */
  private def validateFetchUrl(url: String): Unit = {
    if (!url.startsWith(httpUrl + "/"))
      throw new InvalidDatalakePath(
        s"url $url does not start with the configured base $httpUrl.")
    if (!url.endsWith("/data"))
      throw new InvalidDatalakePath(s"$url is not a valid datalake url")
  }

  /** `_check_http_response` (`archive.py:175-185`). A 400/404 whose body
    * is not the API's `{message, code}` JSON (a proxy error page, an
    * empty body) still surfaces as `DatalakeHttpError`, never as a JSON
    * parse failure. */
  private def checked(r: HttpSession.Response): HttpSession.Response =
    r.status match {
      case 200 => r
      case 400 | 404 =>
        val body = r.bodyString()
        val parsed =
          try {
            val j = JsonMethods.parse(body)
            (j \ "message", j \ "code") match {
              case (JString(m), JString(c)) => Some(s"$m ($c)")
              case _ => None
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        throw new DatalakeHttpError(parsed.getOrElse(
          s"Datalake HTTP API failed: $body (${r.status})"))
      case other =>
        throw new DatalakeHttpError(
          s"Datalake HTTP API failed: ${r.bodyString()} ($other)")
    }

  private def getJson(url: String): JValue =
    JsonMethods.parse(checked(session.get(url)).bodyString())

  private def parseRecord(j: JValue): ListedRecord = {
    def longOpt(v: JValue): Option[Long] = v match {
      case JInt(i) => Some(i.toLong)
      case JLong(l) => Some(l)
      case _ => None
    }
    ListedRecord(
      url = (j \ "url") match { case JString(s) => s; case _ => "" },
      httpUrl = (j \ "http_url") match {
        case JString(s) => Some(s); case _ => None
      },
      metadata = Metadata.fromValidatedJValue(j \ "metadata"),
      createTime = longOpt(j \ "create_time"),
      size = longOpt(j \ "size"))
  }
}
