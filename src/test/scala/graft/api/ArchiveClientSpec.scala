package graft.api

import graft.SparkSuite
import graft.core.{DatalakeHttpError, DatalakeRecord, InvalidDatalakePath}
import graft.query.ArchiveQuerier
import graft.sources.LocalContentStore
import graft.store.RecordStore
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** A pluggable session for the injection test: delegates to the default
  * transport but counts requests. Top-level with a no-arg constructor so
  * the reflective `graft.session.class` hook can instantiate it
  * (reference `DATALAKE_SESSION_CLASS`, `archive.py:471-487`). */
class CountingSession extends HttpSession {
  private val inner = new HttpSession.Default()
  def get(url: String): HttpSession.Response = {
    CountingSession.calls.incrementAndGet()
    inner.get(url)
  }
}
object CountingSession {
  val calls = new AtomicInteger(0)
}

/** The client-side HTTP archive library against a live [[ApiServer]]:
  * cursor-following list iteration, latest, fetch + metadata + templated
  * download + cat, error mapping, and session injection — the behaviors of
  * the reference's `Archive` HTTP paths (`client/datalake/archive.py`) and
  * its `test_archive.py` fetch tests.
  */
class ArchiveClientSpec extends SparkSuite {

  private val day = DatalakeRecord.TimeBucketSizeMs

  // Content is pushed through the real store so fetch exercises the full
  // relay path; records are time-anchored near "now" so `latest` hits.
  lazy val (client, t0, pushed) = {
    val dir = tmpDir("client")
    val cs = new LocalContentStore(s"$dir/content")
    val store = new RecordStore(spark, s"$dir/records")
    val now = System.currentTimeMillis()
    val t0 = (now / day - 1) * day // start of yesterday's bucket
    val pushed = (1 to 25).map { i =>
      val f = Files.write(Paths.get(dir, s"src-$i.log"),
        (s"line-a $i\nline-b $i\n" * 3).getBytes(StandardCharsets.UTF_8))
      val (url, meta) = cs.push(f, Map(
        "what" -> "clientlog", "where" -> s"srv${i % 2}",
        "work_id" -> (if (i % 2 == 0) "w-even" else null),
        "start" -> Long.box(t0 + i * 1000L),
        "end" -> Long.box(t0 + i * 1000L + 500L)))
      store.append(DatalakeRecord.listFromMetadata(
        meta, url, now, Files.size(f)))
      meta
    }
    val querier = new ArchiveQuerier(store, pageSize = 10)
    val server = new ApiServer(querier, Some(cs))
    server.start()
    (new ArchiveClient(server.baseUrl), t0, pushed)
  }

  test("list follows cursors transparently across pages") {
    val records = client.list("clientlog",
      start = Some(Long.box(t0)), end = Some(Long.box(t0 + day))).toVector
    assert(records.size === 25) // pageSize 10 ⇒ 3 pages walked invisibly
    assert(records.map(_.metadata.id).distinct.size === 25)
    assert(records.forall(_.httpUrl.exists(_.endsWith("/data"))))
    assert(records.forall(_.size.exists(s => s == 54L || s == 60L)))
  }

  test("list accepts polymorphic dates and work_id; empty result is empty") {
    val byWork = client.list("clientlog", workId = Some("w-even")).toVector
    assert(byWork.size === 12)
    assert(byWork.forall(_.metadata.workId.contains("w-even")))
    assert(client.list("clientlog", workId = Some("nothere")).isEmpty)
  }

  test("storage url comes from the archive status document") {
    val u = client.storageUrl()
    assert(u.exists(s => s.startsWith("file://") && s.contains("/content")))
  }

  test("latest returns the newest record; miss raises the API error") {
    val r = client.latest("clientlog", "srv1")
    assert(r.metadata.start === t0 + 25000L)
    val e = intercept[DatalakeHttpError](client.latest("nothere", "srv1"))
    assert(e.getMessage.contains("(NoSuchFile)"))
  }

  test("fetch returns content bytes and validated metadata") {
    val rec = client.latest("clientlog", "srv1")
    val (meta, bytes) = client.fetch(rec.httpUrl.get)
    assert(meta.what === "clientlog")
    assert(meta.id === rec.metadata.id)
    assert(meta.hash === rec.metadata.hash) // round-trip through /metadata
    assert(new String(bytes, StandardCharsets.UTF_8).startsWith("line-a 25\n"))
  }

  test("fetchStreaming re-assembles lines across chunk boundaries") {
    val url = client.latest("clientlog", "srv0").httpUrl.get
    val (_, sf) = client.fetchStreaming(url, chunkBytes = 7)
    val lines = sf.readLines.map(new String(_, StandardCharsets.UTF_8)).toVector
    assert(lines.size === 6)
    assert(lines.forall(_.endsWith("24\n")))
  }

  test("fetchToFilename applies the template and creates directories") {
    val rec = client.latest("clientlog", "srv1")
    val out = tmpDir("fetched")
    val fname = client.fetchToFilename(rec.httpUrl.get,
      Some(s"$out/{where}/{what}-{start}.log"))
    assert(fname === s"$out/srv1/clientlog-${t0 + 25000}.log")
    assert(Files.exists(Paths.get(fname)))
    assert(Files.size(Paths.get(fname)) === 60L)
  }

  test("cat relays content without the client buffering it whole") {
    val rec = client.latest("clientlog", "srv0")
    val out = new ByteArrayOutputStream()
    val n = client.cat(rec.httpUrl.get, out)
    assert(n === 60L)
    assert(out.toString("UTF-8").contains("line-b 24"))
  }

  test("fetch urls outside the configured base are rejected") {
    intercept[InvalidDatalakePath](
      client.fetch("http://elsewhere.example/v0/archive/files/x/data"))
    intercept[InvalidDatalakePath](
      client.fetch(s"${client.httpUrl}/v0/archive/files/x/notdata"))
    val e = intercept[DatalakeHttpError](
      client.fetch(s"${client.httpUrl}/v0/archive/files/nothere/data"))
    assert(e.getMessage.contains("(NoSuchFile)"))
  }

  test("http error contract surfaces message (code)") {
    val e = intercept[DatalakeHttpError](client.list("clientlog",
      start = Some(Long.box(t0 + day)), end = Some(Long.box(t0))).toVector)
    assert(e.getMessage === "start must be before end (InvalidWorkInterval)")
  }

  test("session injection: constructor and reflective hook") {
    CountingSession.calls.set(0)
    val direct = new ArchiveClient(client.httpUrl,
      Some(new CountingSession))
    assert(direct.list("clientlog", workId = Some("w-even")).size === 12)
    val afterDirect = CountingSession.calls.get()
    assert(afterDirect >= 1)

    System.setProperty("graft.session.class",
      classOf[CountingSession].getName)
    try {
      val injected = new ArchiveClient(client.httpUrl)
      assert(injected.latest("clientlog", "srv1").metadata.what === "clientlog")
      assert(CountingSession.calls.get() > afterDirect)
    } finally System.clearProperty("graft.session.class")
  }
}
