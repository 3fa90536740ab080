package graft.query

import graft.SparkSuite
import graft.core.{Cursor, DatalakeRecord, Metadata}
import graft.store.RecordStore
import scala.util.Random

/** Randomized equivalence check: the Spark querier against a brute-force
  * in-memory model of the reference semantics, across random corpora and
  * random queries paginated to exhaustion (the property-style analogue of
  * the reference's randomized-metadata test strategy).
  */
class QuerierFuzzSpec extends SparkSuite {

  val day: Long = DatalakeRecord.TimeBucketSizeMs
  val base: Long = 15000L * day
  val rng = new Random(20260812)

  val whats = Seq("alpha", "beta")
  val wheres = Seq("h1", "h2", "h3")
  val workIds = Seq(None, Some("w-a"), Some("w-b"))

  val metas: Seq[Metadata] = (1 to 300).map { i =>
    val start = base + rng.nextInt(10) * day + rng.nextInt(1000)
    val end = if (rng.nextBoolean()) None
      else Some(start + rng.nextInt(3) * day + rng.nextInt(500))
    Metadata(0, start, end, wheres(rng.nextInt(3)), whats(rng.nextInt(2)),
      workIds(rng.nextInt(3)), "/var/f.log", f"$i%032x", "h")
  }

  lazy val store: RecordStore = {
    val s = new RecordStore(spark, tmpDir("fuzz") + "/records")
    s.append(metas.flatMap(m =>
      DatalakeRecord.listFromMetadata(m, s"file:///c/${m.id}", 7L, 9L)))
    s
  }
  lazy val querier = new ArchiveQuerier(store, pageSize = 17)

  /** Brute-force model of the time query (querier.py:286-303 semantics). */
  def modelByTime(qs: Long, qe: Long, what: String,
      where: Option[String]): Set[String] =
    metas.filter { m =>
      m.what == what &&
        where.forall(_ == m.where) &&
        (m.end match {
          case None => m.start >= qs && m.start <= qe
          case Some(e) => e >= qs && m.start <= qe
        })
    }.map(_.id).toSet

  def modelByWorkId(workId: String, what: String): Set[String] =
    metas.filter(m => m.workId.contains(workId) && m.what == what)
      .map(_.id).toSet

  def paginateTime(qs: Long, qe: Long, what: String,
      where: Option[String]): Seq[String] = {
    var cursor: Option[Cursor] = None
    var all = Vector.empty[String]
    var guard = 0
    var done = false
    while (!done) {
      val p = querier.queryByTime(qs, qe, what, where,
        cursor.map(c => Cursor.fromSerialized(c.serialized)))
      assert(p.records.size <= 17)
      // the reference contract: no duplicates WITHIN a page (cross-page
      // duplicates are tolerated for multi-bucket records,
      // querier.py:60-75)
      val ids = p.records.map(_.metadata.id)
      assert(ids.distinct.size === ids.size, "duplicate inside a page")
      all ++= ids
      cursor = p.cursor
      guard += 1
      assert(guard < 100, "cursor chain does not terminate")
      done = cursor.isEmpty
    }
    all
  }

  test("50 random time queries agree with the brute-force model") {
    for (_ <- 1 to 50) {
      val qs = base + rng.nextInt(12) * day + rng.nextInt(2000) - 1000
      val qe = qs + rng.nextInt(4) * day + rng.nextInt(2000)
      val what = whats(rng.nextInt(2))
      val where = if (rng.nextBoolean()) Some(wheres(rng.nextInt(3))) else None
      val got = paginateTime(qs, qe, what, where)
      val expected = modelByTime(qs, qe, what, where)
      assert(got.toSet === expected,
        s"time query [$qs,$qe] what=$what where=$where")
    }
  }

  test("work-id queries agree with the brute-force model") {
    for (wid <- Seq("w-a", "w-b"); what <- whats) {
      var cursor: Option[Cursor] = None
      var all = Vector.empty[String]
      var done = false
      while (!done) {
        val p = querier.queryByWorkId(wid, what, cursor = cursor)
        all ++= p.records.map(_.metadata.id)
        cursor = p.cursor
        done = cursor.isEmpty
      }
      assert(all.toSet === modelByWorkId(wid, what), s"$wid/$what")
    }
  }

  test("cursor-tampering fuzz: a mutated cursor either raises " +
    "InvalidCursor or yields records the model confirms — never a " +
    "silently wrong page") {
    val qs = base + 2 * day
    val qe = qs + 4 * day
    val what = whats(0)
    val expected = modelByTime(qs, qe, what, None)
    val first = querier.queryByTime(qs, qe, what)
    val serialized = first.cursor.get.serialized
    val tamperRng = new Random(7)
    val mutations: Seq[String] = Seq.tabulate(60) { i =>
      i % 5 match {
        case 0 => // flip a random character
          val j = tamperRng.nextInt(serialized.length)
          serialized.updated(j,
            ((serialized(j) + 1 + tamperRng.nextInt(25)) % 127)
              .max(33).toChar)
        case 1 => serialized.take(tamperRng.nextInt(serialized.length))
        case 2 => serialized + "AAAA".take(1 + tamperRng.nextInt(4))
        case 3 => // structurally valid but junk fields
          java.util.Base64.getEncoder.encodeToString(
            (s"""{"current_time_bucket":${tamperRng.nextLong()},""" +
              s""""last_evaluated":"${tamperRng.alphanumeric.take(8)
                .mkString}"}""").getBytes("UTF-8")).replaceAll("=+$", "")
        case _ => // wrong-kind resume key smuggled in
          java.util.Base64.getEncoder.encodeToString(
            (s"""{"current_time_bucket":${qs / day},""" +
              s""""last_evaluated":"srv:ab12"}""").getBytes("UTF-8"))
            .replaceAll("=+$", "")
      }
    }
    for (s <- mutations) {
      try {
        val c = Cursor.fromSerialized(s)
        val p = querier.queryByTime(qs, qe, what, cursor = Some(c))
        // parsed and accepted: every returned record must be one the
        // model says matches the query — tampering may lose rows
        // (resuming "further along") but must never fabricate them
        val ids = p.records.map(_.metadata.id)
        assert(ids.forall(expected), s"fabricated rows from cursor $s")
      } catch {
        case e: graft.core.QueryValidationError =>
          assert(e.code === graft.core.QueryValidationError.InvalidCursor)
      }
    }
  }

  test("latest model equivalence over the record window") {
    // model: newest bucket containing the (what, where) pair, argmax by
    // (start, create_time, id) inside it — create_time constant here so
    // id breaks ties deterministically
    val now = base + 15 * day
    val q = new ArchiveQuerier(store, pageSize = 17,
      clock = () => now)
    for (what <- whats; where <- wheres) {
      val candidates = metas.filter(m => m.what == what && m.where == where)
      val expected =
        if (candidates.isEmpty) None
        else {
          val withBuckets = candidates.flatMap(m =>
            DatalakeRecord.timeBucketsOf(m).map(b => (b, m)))
            .filter { case (b, _) => b <= now / day && b >= (now - 14 * day) / day }
          if (withBuckets.isEmpty) None
          else {
            val maxBucket = withBuckets.map(_._1).max
            Some(withBuckets.filter(_._1 == maxBucket).map(_._2)
              .maxBy(m => (m.start, m.id)))
          }
        }
      assert(q.queryLatest(what, where, lookbackDays = 14)
        .map(_.metadata.id) === expected.map(_.id), s"$what/$where")
    }
  }
}
