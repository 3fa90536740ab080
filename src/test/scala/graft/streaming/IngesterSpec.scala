package graft.streaming

import graft.SparkSuite
import graft.core._
import graft.query.ArchiveQuerier
import graft.store.{LatestStore, RecordStore}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Fake content store mirroring the golden fixtures' `s3_files` blocks
  * (ingester/tests/conftest.py): url → (metadata, size, create_time) with a
  * frozen clock. */
final class FakeContentStore(files: Map[String, String]) extends ContentStore {
  override def fetch(url: String): (Metadata, Long, Long) =
    files.get(url) match {
      case Some(json) => (Metadata.fromJson(json), 290816L, 1430000000000L)
      case None => throw new NoSuchDatalakeFile(s"no such file: $url")
    }
}

/** Port of the ingester golden-file event matrix
  * (the JSON specs in ingester/tests/data + test_s3_notifications.py). */
class IngesterSpec extends SparkSuite {

  val metaJson: String =
    """{"version": 0, "work_id": null, "id": "abc123", "what": "syslog",
      |"path": "/var/log/syslog.log.1", "where": "california",
      |"start": 1430092800000, "end": 1430096400000,
      |"hash": "12345"}""".stripMargin

  val url = "s3://datalake-test/x/syslog/abc123-syslog.txt"

  def s3Event(eventName: String = "ObjectCreated:Put",
      eventVersion: Option[String] = Some("2.0"),
      bucket: String = "datalake-test",
      key: String = "x/syslog/abc123-syslog.txt"): String = {
    val ver = eventVersion.map(v => s""""eventVersion": "$v",""").getOrElse("")
    s"""{$ver "eventName": "$eventName",
       |"s3": {"bucket": {"name": "$bucket"}, "object": {"key": "$key"}}}"""
      .stripMargin
  }

  def notification(events: Seq[String]): String = {
    val msg = s"""{"Records": [${events.mkString(",")}]}"""
      .replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ")
    s"""{"Type": "Notification", "Message": "$msg"}"""
  }

  val testEventNotification: String = {
    val msg = """{\"Event\": \"s3:TestEvent\"}"""
    s"""{"Type": "Notification", "Message": "$msg"}"""
  }

  def ingester(files: Map[String, String] = Map(url -> metaJson)): Ingester =
    new Ingester(new FakeContentStore(files), () => 123000L)

  test("one Put record ingested with per-bucket expansion") {
    val res = ingester().handle(notification(Seq(s3Event())))
    assert(res.report.status === "success")
    assert(res.records.map(_.time_bucket) === Seq(16552L))
    assert(res.records.head.url === url)
    assert(res.records.head.metadata.id === "abc123")
    assert(res.report.records.size === 1)
  }

  test("two s3 sub-records in one event message") {
    val meta2 = metaJson.replace("abc123", "def456")
    val url2 = url.replace("abc123", "def456")
    val res = ingester(Map(url -> metaJson, url2 -> meta2)).handle(
      notification(Seq(s3Event(), s3Event(key = "x/syslog/def456-syslog.txt"))))
    assert(res.report.status === "success")
    assert(res.records.map(_.metadata.id).distinct === Seq("abc123", "def456"))
    assert(res.report.records.size === 2)
  }

  test("multipart-upload event adds records; Copy updates") {
    for (name <- Seq("ObjectCreated:CompleteMultipartUpload", "ObjectCreated:Copy")) {
      val res = ingester().handle(notification(Seq(s3Event(eventName = name))))
      assert(res.report.status === "success", name)
      assert(res.records.nonEmpty, name)
    }
  }

  test("null end time → single bucket") {
    val noEnd = metaJson.replace(""""end": 1430096400000,""", """"end": null,""")
    val res = ingester(Map(url -> noEnd)).handle(notification(Seq(s3Event())))
    assert(res.report.status === "success")
    assert(res.records.map(_.time_bucket) === Seq(16552L))
    assert(res.records.head.metadata.end.isEmpty)
  }

  test("s3:TestEvent is a success no-op") {
    val res = ingester().handle(testEventNotification)
    assert(res.report.status === "success")
    assert(res.records.isEmpty)
    assert(res.report.records.isEmpty)
  }

  test("unsupported event name → error report, no records") {
    val res = ingester().handle(
      notification(Seq(s3Event(eventName = "ObjectRemoved:Delete"))))
    assert(res.report.status === "error")
    assert(res.report.message.get.contains("ObjectRemoved:Delete"))
    assert(res.records.isEmpty)
  }

  test("missing Message → InvalidS3Notification error report") {
    val res = ingester().handle("""{"Type": "Notification"}""")
    assert(res.report.status === "error")
  }

  test("missing eventVersion / unsupported 3.0 → error reports") {
    val noVer = ingester().handle(
      notification(Seq(s3Event(eventVersion = None))))
    assert(noVer.report.status === "error")
    assert(noVer.report.message.get.contains("No eventVersion"))
    val v3 = ingester().handle(
      notification(Seq(s3Event(eventVersion = Some("3.0")))))
    assert(v3.report.status === "error")
    assert(v3.report.message.get.contains("Unsupported event version"))
  }

  test("partial failure keeps records from earlier events (reference parity)") {
    // the reference stores each event's records before a later event
    // fails; the error report covers the message, but fileA stays indexed
    val res = ingester().handle(notification(Seq(
      s3Event(), // resolves fine
      s3Event(key = "x/syslog/missing-file.txt")))) // NoSuchDatalakeFile
    assert(res.report.status === "error")
    assert(res.records.map(_.metadata.id) === Seq("abc123"))
  }

  test("missing file → NoSuchDatalakeFile error report (safe)") {
    val res = ingester(Map.empty).handle(notification(Seq(s3Event())))
    assert(res.report.status === "error")
    assert(res.report.message.get.contains("no such file"))
  }

  test("span over 30 buckets → UnsupportedTimeRange error report") {
    val longSpan = metaJson.replace("1430096400000",
      (1430092800000L + 31L * 86400000L).toString)
    val res = ingester(Map(url -> longSpan)).handle(notification(Seq(s3Event())))
    assert(res.report.status === "error")
    assert(res.report.message.get.contains("too many time buckets"))
  }

  test("missing s3.bucket.name / object.key is UNSAFE (KeyError " +
    "parity): reported as error AND marked fatal — never silently " +
    "dropped as a safe empty-url miss") {
    val noS3 = """{"eventVersion": "2.0", "eventName": "ObjectCreated:Put"}"""
    val res = ingester().handle(notification(Seq(noS3)))
    assert(res.report.status === "error")
    assert(res.fatal.isDefined,
      "a malformed supported event is a poison pill the reference " +
        "re-raises, not a deletable handled message")
    // an UNSUPPORTED event with no s3 block stays the SAFE error —
    // bucket/key are dereferenced lazily, after the event-name check,
    // exactly like the reference's properties
    val unsupNoS3 =
      """{"eventVersion": "2.0", "eventName": "ObjectRemoved:Delete"}"""
    val res2 = ingester().handle(notification(Seq(unsupNoS3)))
    assert(res2.report.status === "error" && res2.fatal.isEmpty)
  }

  test("report keeps the LAST record per url (reference dict " +
    "overwrite), matching what the store keeps") {
    val store = new ContentStore {
      private var n = 0
      override def fetch(u: String): (Metadata, Long, Long) = {
        n += 1; (Metadata.fromJson(metaJson), 1000L * n, 1430000000000L)
      }
    }
    val res = new Ingester(store, () => 123000L)
      .handle(notification(Seq(s3Event(), s3Event())))
    assert(res.report.status === "success")
    assert(res.report.records.size === 1, "one row per distinct url")
    assert(res.report.records.head.size === 2000L,
      "the rewrite's stats must win, as in the reference's dict")
  }

  test("unsafe exception: reports published and good records kept, " +
    "THEN the batch fails so nothing is consumed (publish-then-raise)") {
    val recordStore = new RecordStore(spark, tmpDir("rec-poison") + "/t")
    val reportDir = tmpDir("reports-poison") + "/r"
    val ing = new StreamingIngester(spark,
      new FakeContentStore(Map(url -> metaJson)),
      recordStore, None, Some(reportDir), () => 123000L)
    val noS3 = """{"eventVersion": "2.0", "eventName": "ObjectCreated:Put"}"""
    val batch = spark.createDataset(Seq(
      notification(Seq(s3Event())), notification(Seq(noS3))))(
      org.apache.spark.sql.Encoders.STRING)
    val e = intercept[IllegalStateException] { ing.processBatch(batch) }
    assert(e.getMessage.contains("NOT consumed"))
    // the healthy message's records landed and BOTH reports exist —
    // the reference publishes the error report before re-raising
    assert(recordStore.records.count() === 1)
    val reports = spark.read.json(reportDir)
    assert(reports.count() === 2)
    assert(reports.filter(reports("status") === "error").count() === 1)
  }

  test("legacy report migration: flat root files from the pre-batch= " +
    "code move into batch=legacy on first write, so the mixed tree " +
    "Spark rejects never exists") {
    val recordStore = new RecordStore(spark, tmpDir("rec-legacy") + "/t")
    val reportDir = tmpDir("reports-legacy") + "/r"
    // the pre-r11 Append layout: part files (+ _SUCCESS) FLAT at the root
    val legacyReport =
      """{"start":1,"end":2,"what":"syslog","status":"success"}"""
    Files.createDirectories(Paths.get(reportDir))
    Files.write(Paths.get(reportDir, "part-00000-deadbeef.json"),
      legacyReport.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(reportDir, "_SUCCESS"), Array.empty[Byte])
    val ing = new StreamingIngester(spark,
      new FakeContentStore(Map(url -> metaJson)),
      recordStore, None, Some(reportDir), () => 123000L)
    // untagged = the queue-drain path that writes batch=queue-<uuid>
    ing.processBatch(spark.createDataset(Seq(notification(Seq(s3Event()))))(
      org.apache.spark.sql.Encoders.STRING))
    // one uniform partitioned tree: the root carries ONLY batch= dirs...
    val rootEntries = new java.io.File(reportDir).listFiles().toSeq
    assert(rootEntries.forall(f =>
      f.isDirectory && f.getName.startsWith("batch=")),
      s"mixed layout survived: ${rootEntries.map(_.getName)}")
    assert(rootEntries.exists(_.getName == "batch=legacy"))
    // ...and one read sees the legacy row AND the new one
    val reports = spark.read.json(reportDir)
    assert(reports.count() === 2)
    assert(reports.filter(reports("status") === "success").count() === 2)
  }

  test("legacy report migration retries after a failed attempt — the " +
    "once-only latch must not latch on failure, or the next write " +
    "creates the exact mixed layout the migration exists to prevent") {
    val recordStore = new RecordStore(spark, tmpDir("rec-legacy2") + "/t")
    val reportDir = tmpDir("reports-legacy2") + "/r"
    val legacyReport =
      """{"start":1,"end":2,"what":"syslog","status":"success"}"""
    Files.createDirectories(Paths.get(reportDir))
    Files.write(Paths.get(reportDir, "part-00000-cafe.json"),
      legacyReport.getBytes(StandardCharsets.UTF_8))
    // obstruction: a regular FILE where the migration needs its
    // batch=legacy DIRECTORY — mkdirs/rename fail, the batch throws
    Files.write(Paths.get(reportDir, "batch=legacy"),
      "in the way".getBytes(StandardCharsets.UTF_8))
    val ing = new StreamingIngester(spark,
      new FakeContentStore(Map(url -> metaJson)),
      recordStore, None, Some(reportDir), () => 123000L)
    def oneBatch(): Unit =
      ing.processBatch(spark.createDataset(Seq(notification(Seq(s3Event()))))(
        org.apache.spark.sql.Encoders.STRING))
    intercept[Exception] { oneBatch() }
    // no batch= report dir may exist yet: a write after the failed
    // migration would have built the unreadable mixed tree
    assert(!new java.io.File(reportDir).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("batch=")),
      "a report was written beside unmigrated flat files")
    // operator clears the obstruction; the SAME instance must retry
    Files.delete(Paths.get(reportDir, "batch=legacy"))
    oneBatch()
    val rootEntries = new java.io.File(reportDir).listFiles().toSeq
    assert(rootEntries.forall(f =>
      f.isDirectory && f.getName.startsWith("batch=")),
      s"mixed layout survived the retry: ${rootEntries.map(_.getName)}")
    val reports = spark.read.json(reportDir)
    assert(reports.count() === 2)
  }

  test("streaming end-to-end: files → records + latest + reports, replay-safe") {
    val notifDir = tmpDir("notif")
    val widIndex = new graft.store.WorkIdIndex(spark, tmpDir("wix") + "/i")
    val recordStore = new RecordStore(spark, tmpDir("rec") + "/t",
      workIdIndex = Some(widIndex))
    val latestStore = new LatestStore(spark, tmpDir("lat") + "/t")
    val reportDir = tmpDir("reports") + "/r"
    val withWid = metaJson.replace(""""work_id": null""", """"work_id": "w-77"""")
    val ing = new StreamingIngester(spark,
      new FakeContentStore(Map(url -> withWid)),
      recordStore, Some(latestStore), Some(reportDir), () => 123000L)

    def writeNotif(name: String, content: String): Unit =
      Files.write(Paths.get(notifDir, name),
        content.getBytes(StandardCharsets.UTF_8))

    writeNotif("n1.json", notification(Seq(s3Event())))
    writeNotif("n2.json", notification(Seq(s3Event(eventName = "Bad:Event"))))

    val q1 = ing.start(notifDir, tmpDir("ckpt1"), availableNow = true)
    q1.awaitTermination(120000)

    assert(recordStore.records.count() === 1) // one bucket, one file
    assert(latestStore.latest.count() === 1)
    val reports = spark.read.json(reportDir)
    assert(reports.count() === 2)
    assert(reports.filter(reports("status") === "error").count() === 1)

    // at-least-once replay: same notification redelivered as a new file
    writeNotif("n1-redelivery.json", notification(Seq(s3Event())))
    val q2 = ing.start(notifDir, tmpDir("ckpt2"), availableNow = true)
    q2.awaitTermination(120000)
    // cross-batch dedup keeps the records table duplicate-free
    assert(recordStore.records.count() === 1)

    // and the querier sees exactly one file
    val page = new ArchiveQuerier(recordStore)
      .queryByTime(1430092800000L, 1430096400000L, "syslog")
    assert(page.records.map(_.metadata.id) === Seq("abc123"))

    // the incrementally-maintained work-id index serves the lookup
    val viaIndex = new ArchiveQuerier(recordStore, workIdIndex = Some(widIndex))
      .queryByWorkId("w-77", "syslog")
    assert(viaIndex.records.map(_.metadata.id) === Seq("abc123"))
  }
}
