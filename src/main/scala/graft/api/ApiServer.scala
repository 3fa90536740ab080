package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.QueryValidationError
import graft.query.ArchiveQuerier
import graft.sources.LocalContentStore
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.json4s.jackson.JsonMethods

/** Minimal HTTP front-end over [[ArchiveQuerier]] reproducing the
  * reference API routes (`api/datalake_api/v0.py`):
  *
  *   - `GET /v0/archive/files/?what=…&start=…&end=…|work_id=…[&where=…][&cursor=…]`
  *   - `GET /v0/archive/latest/<what>/<where>[?lookback=…]`
  *   - `GET /v0/archive/files/<id>/data` (content relay when a content
  *     store is attached, with sniffed Content-Type/Encoding)
  *   - `GET /v0/archive/files/<id>/metadata` (decorated metadata document)
  *
  * Errors use the reference's `{message, code}` body with 400/404 codes.
  * Built on the JDK's HttpServer — the query engine stays the Spark
  * layer; this is just the wire adapter.
  */
final class ApiServer(
    querier: ArchiveQuerier,
    contentStore: Option[LocalContentStore] = None,
    port: Int = 0) {

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/v0/archive/", handle _)
    // a real executor, not setExecutor(null): the null executor runs
    // every handler on the single dispatcher thread, so one multi-GB
    // /data relay (or one slow page query) head-of-line blocks every
    // other request for the full transfer. Daemon threads — the server
    // must never pin the JVM open.
    pool = java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-api-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdown()
  }

  def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      val params = parseQuery(Option(ex.getRequestURI.getRawQuery))
      path match {
        // archive status (`v0.py:110-133`): the base url clients push to
        case "/v0/archive/" => send(ex, 200,
          JsonMethods.compact(JsonMethods.render(org.json4s.JObject(
            "storage_url" -> contentStore.map(cs =>
              org.json4s.JString(cs.storageUrl): org.json4s.JValue
            ).getOrElse(org.json4s.JNull)))))
        case "/v0/archive/files/" => filesGet(ex, params)
        case LatestPath(what, where) => latestGet(ex, what, where, params)
        case DataPath(fileId) => dataGet(ex, fileId)
        case MetadataPath(fileId) => metadataGet(ex, fileId)
        case _ => sendError(ex, 404,
          QueryValidationError("NoSuchEndpoint", s"unknown path $path"))
      }
    } catch {
      case e: QueryValidationError =>
        sendError(ex, if (e.code == "NoSuchFile") 404 else 400, e)
      case e: Exception =>
        send(ex, 500, s"""{"message":"${e.getClass.getSimpleName}","code":"InternalError"}""")
    } finally ex.close()

  private val LatestPath = "/v0/archive/latest/([^/]+)/([^/]+)".r
  private val DataPath = "/v0/archive/files/([^/]+)/data".r
  private val MetadataPath = "/v0/archive/files/([^/]+)/metadata".r

  private def filesGet(ex: HttpExchange, params: Map[String, String]): Unit = {
    val q = ApiV0.validateFilesParams(params)
    val page = q.workId match {
      case Some(w) => querier.queryByWorkId(w, q.what, q.where, q.cursor)
      case None => querier.queryByTime(q.start.get, q.end.get, q.what,
        q.where, q.cursor)
    }
    send(ex, 200, JsonMethods.compact(JsonMethods.render(
      ApiV0.filesResponse(page, baseUrl, params))))
  }

  private def latestGet(ex: HttpExchange, what: String, where: String,
      params: Map[String, String]): Unit = {
    val lookback = params.get("lookback")
      .map(ApiV0.validateLookback)
      .getOrElse(ArchiveQuerier.DefaultLookbackDays)
    querier.queryLatest(what, where, lookback) match {
      case Some(r) => send(ex, 200,
        JsonMethods.compact(JsonMethods.render(ApiV0.recordJson(r, baseUrl))))
      case None => throw ApiV0.noSuchLatest(what, where, lookback)
    }
  }

  private def dataGet(ex: HttpExchange, fileId: String): Unit =
    contentStore match {
      case None => sendError(ex, 404, QueryValidationError(
        "NoSuchFile", "no content store attached"))
      case Some(cs) =>
        val url = cs.urlFor(fileId)
        val (meta, size, _) =
          try cs.fetch(url)
          catch {
            case _: graft.core.NoSuchDatalakeFile =>
              throw QueryValidationError("NoSuchFile", s"no such file: $fileId")
          }
        // stream with a fixed buffer — only the sniff header is held in
        // memory, so multi-GB objects relay without buffering
        val in = cs.open(url)
        try {
          val header = in.readNBytes(ContentSniffer.HeaderBytes)
          val headers = ex.getResponseHeaders
          headers.set("Content-Type",
            ContentSniffer.contentType(meta.path).getOrElse("text/plain"))
          ContentSniffer.contentEncoding(header)
            .foreach(headers.set("Content-Encoding", _))
          ex.sendResponseHeaders(200, size)
          val out = ex.getResponseBody
          out.write(header)
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) out.write(buf, 0, n)
            n = in.read(buf)
          }
        } finally in.close()
    }

  /** `/files/<id>/metadata` (`v0.py:498-527`): the metadata document
    * decorated with `start_iso`/`end_iso`. */
  private def metadataGet(ex: HttpExchange, fileId: String): Unit =
    contentStore match {
      case None => sendError(ex, 404, QueryValidationError(
        "NoSuchFile", "no content store attached"))
      case Some(cs) =>
        val meta =
          try cs.fetch(cs.urlFor(fileId))._1
          catch {
            case _: graft.core.NoSuchDatalakeFile =>
              throw QueryValidationError("NoSuchFile", s"no such file: $fileId")
          }
        send(ex, 200, JsonMethods.compact(JsonMethods.render(
          ApiV0.metadataJson(meta))))
    }

  private def sendError(ex: HttpExchange, status: Int,
      e: QueryValidationError): Unit =
    send(ex, status, ApiV0.errorJson(e))

  private def send(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.filter(_.nonEmpty).map(_.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) if k.nonEmpty =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)
}
