package graft.query

import graft.SparkSuite
import graft.core.{DatalakeRecord, Metadata}
import graft.store.{LatestStore, RecordStore, RecordRow}
import scala.util.Random

/** Port of the querier behavior matrix
  * (api/tests/test_archive_querier.py:190-614). */
class ArchiveQuerierSpec extends SparkSuite {

  val day: Long = DatalakeRecord.TimeBucketSizeMs
  val rng = new Random(42)

  /** Mirrors generate_random_metadata
    * (client/datalake/tests/conftest.py:87-100). */
  def randomMeta(
      start: Long = 1262304000000L + (math.abs(rng.nextLong()) % (5L * 365 * day)),
      endOffset: Option[Long] = Some(math.abs(rng.nextLong()) % (3 * day)),
      what: String = "what" + rng.alphanumeric.filter(_.isLower).take(6).mkString,
      where: String = "where" + rng.alphanumeric.filter(_.isLower).take(6).mkString,
      workId: Option[String] = None): Metadata =
    Metadata(0, start, endOffset.map(start + _), where, what, workId,
      s"/var/log/$what.log", f"${rng.nextLong()}%016x${rng.nextLong()}%016x",
      f"${rng.nextLong()}%016x")

  def records(m: Metadata, createTime: Long = 1500000000000L): Seq[DatalakeRecord] =
    DatalakeRecord.listFromMetadata(m, s"file:///d/${m.id}/data", createTime, 1024L)

  def freshStore(): RecordStore = new RecordStore(spark, tmpDir("records"))

  test("time query returns records in interval, excludes outside") {
    val store = freshStore()
    val t0 = 1000L * day
    val in1 = randomMeta(start = t0 + 10, endOffset = Some(100L), what = "nginx")
    val in2 = randomMeta(start = t0 - 10, endOffset = Some(20L), what = "nginx")
    val out1 = randomMeta(start = t0 + day, endOffset = Some(10L), what = "nginx")
    val wrongWhat = randomMeta(start = t0 + 10, endOffset = Some(10L), what = "apache")
    store.append(Seq(in1, in2, out1, wrongWhat).flatMap(records(_)))
    val page = new ArchiveQuerier(store).queryByTime(t0, t0 + 500, "nginx")
    assert(page.records.map(_.metadata.id).toSet === Set(in1.id, in2.id))
    assert(page.cursor.isEmpty)
  }

  test("null-end records use point-in-interval semantics") {
    val store = freshStore()
    val t0 = 2000L * day
    // start before the interval, no end: reference excludes it even though
    // an open-ended read would include it (test_no_end_exclusion)
    val before = randomMeta(start = t0 - 100, endOffset = None, what = "w")
    val inside = randomMeta(start = t0 + 100, endOffset = None, what = "w")
    store.append(Seq(before, inside).flatMap(records(_)))
    val page = new ArchiveQuerier(store).queryByTime(t0, t0 + day - 1, "w")
    assert(page.records.map(_.metadata.id) === Seq(inside.id))
    assert(page.records.head.metadata.end.isEmpty)
  }

  test("cross-bucket record deduplicated within a page") {
    val store = freshStore()
    val t0 = 3000L * day
    val spanning = randomMeta(start = t0 + 10, endOffset = Some(3 * day), what = "s")
    store.append(records(spanning))
    assert(records(spanning).size === 4)
    val page = new ArchiveQuerier(store).queryByTime(t0, t0 + 10 * day, "s")
    assert(page.records.map(_.metadata.id) === Seq(spanning.id))
  }

  test("where filter restricts results") {
    val store = freshStore()
    val t0 = 4000L * day
    val a = randomMeta(start = t0 + 1, endOffset = Some(5L), what = "w", where = "hosta")
    val b = randomMeta(start = t0 + 2, endOffset = Some(5L), what = "w", where = "hostb")
    store.append(Seq(a, b).flatMap(records(_)))
    val page = new ArchiveQuerier(store).queryByTime(t0, t0 + 100, "w",
      where = Some("hosta"))
    assert(page.records.map(_.metadata.id) === Seq(a.id))
  }

  test("pagination: pages capped, cursors chain, union is complete") {
    val store = freshStore()
    val t0 = 5000L * day
    val metas = (1 to 25).map { i =>
      randomMeta(start = t0 + i, endOffset = Some(10L), what = "many")
    }
    store.append(metas.flatMap(records(_)))
    val q = new ArchiveQuerier(store, pageSize = 10)
    var cursor: Option[graft.core.Cursor] = None
    var all = Vector.empty[String]
    var pages = 0
    var done = false
    while (!done) {
      val page = q.queryByTime(t0, t0 + day - 1, "many", cursor = cursor)
      assert(page.records.size <= 10)
      if (pages > 0) assert(page.records.nonEmpty) // only last page may be empty
      all ++= page.records.map(_.metadata.id)
      cursor = page.cursor
      pages += 1
      done = cursor.isEmpty
      assert(pages < 10)
    }
    assert(pages === 3)
    assert(all.distinct.size === all.size, "no duplicates across pages here")
    assert(all.toSet === metas.map(_.id).toSet)
  }

  test("cursor round-trips through serialization") {
    val store = freshStore()
    val t0 = 5500L * day
    val metas = (1 to 15).map(i =>
      randomMeta(start = t0 + i, endOffset = Some(5L), what = "ser"))
    store.append(metas.flatMap(records(_)))
    val q = new ArchiveQuerier(store, pageSize = 10)
    val p1 = q.queryByTime(t0, t0 + 100, "ser")
    val serialized = p1.cursor.get.serialized
    val p2 = q.queryByTime(t0, t0 + 100, "ser",
      cursor = Some(graft.core.Cursor.fromSerialized(serialized)))
    assert((p1.records.map(_.metadata.id) ++ p2.records.map(_.metadata.id)).toSet
      === metas.map(_.id).toSet)
  }

  test("cursor outside the query window: past the end = exhausted " +
    "(empty page, reference clears such cursors), BEFORE the start = " +
    "InvalidCursor — a silent empty page would hide every match") {
    val store = freshStore()
    val t0 = 5700L * day
    val m = randomMeta(start = t0 + 10, endOffset = Some(5L), what = "win")
    store.append(records(m))
    val q = new ArchiveQuerier(store)
    val past = graft.core.Cursor(
      Some(DatalakeRecord.bucketOf(t0) + 5), None, None)
    assert(q.queryByTime(t0, t0 + 100, "win", cursor = Some(past))
      === QueryPage(Nil, None))
    val before = graft.core.Cursor(
      Some(DatalakeRecord.bucketOf(t0) - 1), None, None)
    val e = intercept[graft.core.QueryValidationError] {
      q.queryByTime(t0, t0 + 100, "win", cursor = Some(before))
    }
    assert(e.code === graft.core.QueryValidationError.InvalidCursor)
  }

  test("resume-key shape is validated by part count: a time cursor fed " +
    "to a work-id query (and vice versa) is InvalidCursor, never a " +
    "silent misparse that re-serves page 1") {
    val store = freshStore()
    val t0 = 5800L * day
    val m = randomMeta(start = t0 + 1, endOffset = Some(5L), what = "x",
      workId = Some("work-9"))
    store.append(records(m))
    val q = new ArchiveQuerier(store)
    // 3-part time key into the work-id parser
    val timeCursor = graft.core.Cursor(None, Some("19876:srv:ab12"), None)
    val e1 = intercept[graft.core.QueryValidationError] {
      q.queryByWorkId("work-9", "x", cursor = Some(timeCursor))
    }
    assert(e1.code === graft.core.QueryValidationError.InvalidCursor)
    // 2-part work-id key into the time parser
    val workCursor = graft.core.Cursor(
      Some(DatalakeRecord.bucketOf(t0)), Some("srv:ab12"), None)
    val e2 = intercept[graft.core.QueryValidationError] {
      q.queryByTime(t0, t0 + 100, "x", cursor = Some(workCursor))
    }
    assert(e2.code === graft.core.QueryValidationError.InvalidCursor)
    // non-numeric bucket in an otherwise 3-part key
    val junk = graft.core.Cursor(
      Some(DatalakeRecord.bucketOf(t0)), Some("abc:srv:ab12"), None)
    val e3 = intercept[graft.core.QueryValidationError] {
      q.queryByTime(t0, t0 + 100, "x", cursor = Some(junk))
    }
    assert(e3.code === graft.core.QueryValidationError.InvalidCursor)
  }

  test("pageSize = Int.MaxValue (the 'no cap' spelling) does not " +
    "overflow the probe limit") {
    val store = freshStore()
    val t0 = 5900L * day
    val metas = (1 to 5).map(i =>
      randomMeta(start = t0 + i, endOffset = Some(5L), what = "nocap"))
    store.append(metas.flatMap(records(_)))
    val q = new ArchiveQuerier(store, pageSize = Int.MaxValue)
    val page = q.queryByTime(t0, t0 + 100, "nocap")
    assert(page.records.size === 5 && page.cursor.isEmpty)
    assert(q.queryByWorkId("none", "nocap").records.isEmpty)
  }

  test("work-id query with where filter and pagination") {
    val store = freshStore()
    val t0 = 6000L * day
    val withId = (1 to 12).map { i =>
      randomMeta(start = t0 + i, endOffset = Some(5L), what = "job",
        where = if (i % 2 == 0) "even" else "odd", workId = Some("work-7"))
    }
    val otherId = randomMeta(start = t0, endOffset = Some(5L), what = "job",
      workId = Some("work-8"))
    val nullId = randomMeta(start = t0, endOffset = Some(5L), what = "job")
    store.append((withId :+ otherId :+ nullId).flatMap(records(_)))
    val q = new ArchiveQuerier(store, pageSize = 5)
    var cursor: Option[graft.core.Cursor] = None
    var all = Vector.empty[String]
    var done = false
    while (!done) {
      val page = q.queryByWorkId("work-7", "job", cursor = cursor)
      assert(page.records.size <= 5)
      all ++= page.records.map(_.metadata.id)
      cursor = page.cursor
      done = cursor.isEmpty
    }
    assert(all.toSet === withId.map(_.id).toSet)
    var whereAll = Vector.empty[String]
    var wc: Option[graft.core.Cursor] = None
    var wdone = false
    while (!wdone) {
      val p = q.queryByWorkId("work-7", "job", where = Some("even"), cursor = wc)
      whereAll ++= p.records.map(_.metadata.id)
      wc = p.cursor
      wdone = wc.isEmpty
    }
    assert(whereAll.toSet === withId.filter(_.where == "even").map(_.id).toSet)
  }

  test("latest: newest bucket wins; create_time breaks ties") {
    val store = freshStore()
    val now = System.currentTimeMillis()
    val older = randomMeta(start = now - 3 * day, endOffset = None,
      what = "log", where = "srv")
    val newer = randomMeta(start = now - day, endOffset = None,
      what = "log", where = "srv")
    // tie on start: create_time decides (test_archive_querier.py:510-530)
    val tieA = randomMeta(start = now - day, endOffset = None,
      what = "log", where = "srv")
    store.append(records(older, createTime = 100L))
    store.append(records(newer, createTime = 200L))
    store.append(records(tieA, createTime = 300L))
    val q = new ArchiveQuerier(store)
    val latest = q.queryLatest("log", "srv")
    assert(latest.map(_.metadata.id) === Some(tieA.id))
  }

  test("latest: nothing within lookback → None") {
    val store = freshStore()
    val now = System.currentTimeMillis()
    val ancient = randomMeta(start = now - 20 * day, endOffset = None,
      what = "old", where = "srv")
    store.append(records(ancient))
    assert(new ArchiveQuerier(store).queryLatest("old", "srv").isEmpty)
    assert(new ArchiveQuerier(store)
      .queryLatest("old", "srv", lookbackDays = 25).isDefined)
  }

  test("latest table: hit served, future-dated falls back to walk-back") {
    val recStore = freshStore()
    val latestStore = new LatestStore(spark, tmpDir("latest"))
    val now = System.currentTimeMillis()
    val walkback = randomMeta(start = now - day, endOffset = None,
      what = "t", where = "s")
    recStore.append(records(walkback, createTime = 50L))
    // latest-table row 25h in the future → must fall back
    val future = randomMeta(start = now + 25 * 3600 * 1000L, endOffset = None,
      what = "t", where = "s")
    import spark.implicits._
    latestStore.upsert(
      records(future, createTime = 99L).map(RecordRow.fromCore).toDS().toDF())
    val q = new ArchiveQuerier(recStore, Some(latestStore), useLatestTable = true)
    assert(q.queryLatest("t", "s").map(_.metadata.id) === Some(walkback.id))

    // upserting an older row cannot displace the future-dated one (the
    // reference's conditional put has the same monotonicity), so the
    // fallback still serves the walk-back result
    val fresh = randomMeta(start = now - 3600 * 1000L, endOffset = None,
      what = "t", where = "s")
    latestStore.upsert(
      records(fresh, createTime = 999L).map(RecordRow.fromCore).toDS().toDF())
    assert(q.queryLatest("t", "s").map(_.metadata.id) === Some(walkback.id))

    // a clean latest table with an in-window row → served from the table
    val latest2 = new LatestStore(spark, tmpDir("latest-fresh"))
    latest2.upsert(
      records(fresh, createTime = 999L).map(RecordRow.fromCore).toDS().toDF())
    val q2 = new ArchiveQuerier(recStore, Some(latest2), useLatestTable = true)
    assert(q2.queryLatest("t", "s").map(_.metadata.id) === Some(fresh.id))
  }

  test("latest store upsert is monotone under replay") {
    val latestStore = new LatestStore(spark, tmpDir("latest2"))
    import spark.implicits._
    val now = System.currentTimeMillis()
    val newer = randomMeta(start = now - day, endOffset = None, what = "m", where = "x")
    val older = randomMeta(start = now - 2 * day, endOffset = None, what = "m", where = "x")
    latestStore.upsert(records(newer, createTime = 10L).map(RecordRow.fromCore).toDS().toDF())
    // replaying an older batch must NOT displace the newer row
    latestStore.upsert(records(older, createTime = 20L).map(RecordRow.fromCore).toDS().toDF())
    val rows = latestStore.latest.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[org.apache.spark.sql.Row]("metadata")
      .getAs[String]("id") === newer.id)
  }

  test("store append is idempotent on (id, time_bucket) within a batch") {
    val store = freshStore()
    val t0 = 7000L * day
    val m = randomMeta(start = t0, endOffset = Some(10L), what = "dup")
    store.append(records(m) ++ records(m)) // same records twice in one batch
    assert(store.records.count() === 1)
  }
}
