package graft.api

import graft.SparkSuite
import graft.core.{Cursor, DatalakeRecord, Metadata}
import graft.query.ArchiveQuerier
import graft.store.RecordStore
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's dual-driver pattern
  * (api/tests/test_archive_querier.py:30-157): every scenario runs against
  * BOTH the in-process querier and the HTTP API, asserting identical
  * results and the HTTP error contract.
  */
class DualDriverSpec extends SparkSuite {

  val day: Long = DatalakeRecord.TimeBucketSizeMs
  val t0: Long = 9000L * day

  /** A queried page reduced to comparable form. */
  case class Page(ids: Seq[String], hasNext: Boolean, nextCursor: Option[String])

  trait Driver {
    def byTime(start: Long, end: Long, what: String,
        cursor: Option[String] = None): Page
    def byWorkId(workId: String, what: String): Page
    def latestId(what: String, where: String): Option[String]
  }

  lazy val (querier, httpBase, server) = {
    val store = new RecordStore(spark, tmpDir("dual") + "/records")
    val metas = (1 to 25).map { i =>
      Metadata(0, t0 + i, Some(t0 + i + 50), "srv" + (i % 2), "dual",
        if (i % 2 == 0) Some("w-1") else None, "/var/log/d.log",
        f"$i%032x", "h")
    }
    store.append(metas.flatMap(m =>
      DatalakeRecord.listFromMetadata(m, s"file:///c/${m.id}", 1000L + m.start, 10L)))
    val q = new ArchiveQuerier(store, pageSize = 10)
    val srv = new ApiServer(q)
    val port = srv.start()
    (q, s"http://127.0.0.1:$port", srv)
  }

  object DirectDriver extends Driver {
    def byTime(start: Long, end: Long, what: String, cursor: Option[String]) = {
      val page = querier.queryByTime(start, end, what,
        cursor = cursor.map(Cursor.fromSerialized))
      Page(page.records.map(_.metadata.id), page.cursor.isDefined,
        page.cursor.map(_.serialized))
    }
    def byWorkId(workId: String, what: String) = {
      val page = querier.queryByWorkId(workId, what)
      Page(page.records.map(_.metadata.id), page.cursor.isDefined,
        page.cursor.map(_.serialized))
    }
    def latestId(what: String, where: String) =
      querier.queryLatest(what, where).map(_.metadata.id)
  }

  object HttpDriver extends Driver {
    private val client = HttpClient.newHttpClient()

    def get(url: String): (Int, JValue) = {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), JsonMethods.parse(resp.body()))
    }

    private def toPage(j: JValue): Page = {
      val ids = (j \ "records").asInstanceOf[JArray].arr
        .map(r => (r \ "metadata" \ "id").asInstanceOf[JString].s)
      val next = j \ "next" match {
        case JString(u) =>
          Some(u.split("cursor=")(1).split("&")(0))
        case _ => None
      }
      Page(ids, next.isDefined, next)
    }

    def byTime(start: Long, end: Long, what: String, cursor: Option[String]) = {
      val cur = cursor.map(c => s"&cursor=$c").getOrElse("")
      val (code, j) = get(
        s"$httpBase/v0/archive/files/?what=$what&start=$start&end=$end$cur")
      assert(code === 200, JsonMethods.compact(JsonMethods.render(j)))
      toPage(j)
    }
    def byWorkId(workId: String, what: String) = {
      val (code, j) = get(
        s"$httpBase/v0/archive/files/?what=$what&work_id=$workId")
      assert(code === 200)
      toPage(j)
    }
    def latestId(what: String, where: String) = {
      val (code, j) = get(s"$httpBase/v0/archive/latest/$what/$where")
      if (code == 404) None
      else Some((j \ "metadata" \ "id").asInstanceOf[JString].s)
    }
  }

  def drivers: Seq[(String, Driver)] =
    Seq("direct" -> DirectDriver, "http" -> HttpDriver)

  test("time query pages identically through both drivers") {
    def collectAll(d: Driver): Seq[String] = {
      var cursor: Option[String] = None
      var all = Vector.empty[String]
      var done = false
      while (!done) {
        val p = d.byTime(t0, t0 + 1000, "dual", cursor)
        assert(p.ids.size <= 10)
        all ++= p.ids
        cursor = p.nextCursor
        done = cursor.isEmpty
      }
      all
    }
    val direct = collectAll(DirectDriver)
    val http = collectAll(HttpDriver)
    assert(direct === http)
    assert(direct.size === 25)
  }

  test("work-id and latest agree across drivers") {
    for ((name, d) <- drivers) {
      assert(d.byWorkId("w-1", "dual").ids.nonEmpty, name)
      assert(d.latestId("dual", "srv1").isEmpty, name) // t0 is far in the past
      assert(d.latestId("nothere", "srv1").isEmpty, name)
    }
    assert(DirectDriver.byWorkId("w-1", "dual").ids ===
      HttpDriver.byWorkId("w-1", "dual").ids)
  }

  test("http error contract: codes match the reference") {
    def code(url: String): (Int, String) = {
      val (status, j) = HttpDriver.get(url)
      (status, (j \ "code").asInstanceOf[JString].s)
    }
    assert(code(s"$httpBase/v0/archive/files/") === (400, "NoArgs"))
    assert(code(s"$httpBase/v0/archive/files/?start=0") === (400, "NoWhat"))
    assert(code(s"$httpBase/v0/archive/files/?what=x") === (400, "NoWorkInterval"))
    assert(code(s"$httpBase/v0/archive/files/?what=x&start=5") ===
      (400, "InvalidWorkInterval"))
    assert(code(s"$httpBase/v0/archive/files/?what=x&start=zzz&end=5") ===
      (400, "InvalidTime"))
    assert(code(s"$httpBase/v0/archive/files/?what=x&work_id=w&cursor=@@") ===
      (400, "InvalidCursor"))
    assert(code(s"$httpBase/v0/archive/latest/none/here") === (404, "NoSuchFile"))
    assert(code(s"$httpBase/v0/archive/latest/none/here?lookback=soon") ===
      (400, "InvalidLookback"))
  }

  test("next url is directly fetchable") {
    val (_, j) = HttpDriver.get(
      s"$httpBase/v0/archive/files/?what=dual&start=$t0&end=${t0 + 1000}")
    val next = (j \ "next").asInstanceOf[JString].s
    val (code2, j2) = HttpDriver.get(next)
    assert(code2 === 200)
    assert((j2 \ "records").asInstanceOf[JArray].arr.nonEmpty)
  }
}
