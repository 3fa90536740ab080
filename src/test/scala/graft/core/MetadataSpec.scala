package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's metadata validation/date matrix
  * (client/datalake/tests/test_metadata.py:22-201). */
class MetadataSpec extends AnyFunSuite {

  def base: Map[String, Any] = Map(
    "version" -> 0,
    "start" -> 1426809600000L,
    "end" -> 1426895999999L,
    "path" -> "/var/log/apache/access.log",
    "where" -> "nebraska",
    "what" -> "apache",
    "hash" -> "12345",
    "work_id" -> null)

  test("valid fixture builds") {
    val m = Metadata.build(base)
    assert(m.start === 1426809600000L)
    assert(m.end === Some(1426895999999L))
    assert(m.workId.isEmpty)
    assert(m.id.nonEmpty)
  }

  test("missing required field") {
    for (f <- Seq("start", "where", "what", "path", "hash"))
      assertThrows[InvalidDatalakeMetadata](Metadata.build(base - f))
  }

  test("'~'-valued where/what/work_id fields are path translations " +
    "(dlfile.py:213-219); literal slugs can never contain '~' so the " +
    "trigger cannot misfire") {
    val fields = base +
      ("path" -> "/var/log/jobs/job-1234.log") +
      ("what" -> ".*job-(?P<job_id>[0-9]+).log$~job-{job_id}") +
      ("work_id" -> ".*job-(?P<job_id>[0-9]+).log$~work{job_id}")
    val m = Metadata.build(Metadata.applyTranslations(fields))
    assert(m.what === "job-1234")
    assert(m.workId === Some("work1234"))
    // untranslated fields pass through untouched; null work_id is safe
    val plain = Metadata.applyTranslations(base)
    assert(plain === base)
    // a translation without a path fails loud, not with a regex error
    assertThrows[InvalidDatalakeMetadata](Metadata.applyTranslations(
      (base - "path") + ("what" -> "a(?P<x>b)~{x}")))
  }

  test("missing work_id key is invalid, null work_id is fine") {
    assertThrows[InvalidDatalakeMetadata](Metadata.build(base - "work_id"))
    assert(Metadata.build(base).workId.isEmpty)
  }

  test("unsupported version") {
    assertThrows[UnsupportedDatalakeMetadataVersion](
      Metadata.build(base + ("version" -> 1)))
  }

  test("version defaults to 0 when absent") {
    assert(Metadata.build(base - "version").version === 0)
  }

  test("id assigned when absent, preserved when present") {
    val m1 = Metadata.build(base)
    val m2 = Metadata.build(base + ("id" -> "abc123"))
    assert(m1.id.length === 32)
    assert(m2.id === "abc123")
  }

  test("invalid slugs rejected") {
    for (bad <- Seq("Capital", "with space", "with.dot", "ünïcode"))
      assertThrows[InvalidDatalakeMetadata](
        Metadata.build(base + ("what" -> bad)))
    assertThrows[InvalidDatalakeMetadata](
      Metadata.build(base + ("where" -> "UPPER")))
  }

  test("work_id slug rules; literal null string rejected") {
    assert(Metadata.build(base + ("work_id" -> "job-123"))
      .workId === Some("job-123"))
    assertThrows[InvalidDatalakeMetadata](
      Metadata.build(base + ("work_id" -> "null")))
    assertThrows[InvalidDatalakeMetadata](
      Metadata.build(base + ("work_id" -> "Bad Id")))
  }

  test("relative path rejected; windows path accepted") {
    assertThrows[InvalidDatalakeMetadata](
      Metadata.build(base + ("path" -> "relative/path.log")))
    assert(Metadata.build(base + ("path" -> "C:\\logs\\foo.log"))
      .path === "C:\\logs\\foo.log")
  }

  test("end < start rejected") {
    assertThrows[InvalidDatalakeMetadata](
      Metadata.build(base + ("end" -> 1426809599999L)))
  }

  test("missing end becomes null") {
    assert(Metadata.build(base - "end").end.isEmpty)
  }

  // normalize_date matrix (metadata.py:180-213)
  test("numeric seconds vs ms heuristic at 1e11") {
    assert(Metadata.normalizeDate(1426809600L) === 1426809600000L)
    assert(Metadata.normalizeDate(1426809600000L) === 1426809600000L)
    assert(Metadata.normalizeDate(0) === 0L)
    assert(Metadata.normalizeDate(100000000001L) === 100000000001L)
    assert(Metadata.normalizeDate(99999999999L) === 99999999999000L)
  }

  test("numeric strings normalized") {
    assert(Metadata.normalizeDate("1426809600") === 1426809600000L)
    assert(Metadata.normalizeDate("1426809600000") === 1426809600000L)
    assert(Metadata.normalizeDate("1426809600.123") === 1426809600123L)
  }

  test("datetime strings normalized, naive = UTC") {
    assert(Metadata.normalizeDate("2015-03-20") === 1426809600000L)
    assert(Metadata.normalizeDate("2015-03-20T00:00:00") === 1426809600000L)
    assert(Metadata.normalizeDate("2015-03-20T00:00:00.954") === 1426809600954L)
    assert(Metadata.normalizeDate("2015-03-20T00:00:00Z") === 1426809600000L)
    assert(Metadata.normalizeDate("2015-03-20T02:00:00+02:00") === 1426809600000L)
  }

  test("garbage dates rejected") {
    assertThrows[InvalidDatalakeMetadata](Metadata.normalizeDate("not a date"))
    assertThrows[InvalidDatalakeMetadata](
      Metadata.build(base + ("start" -> "garbage")))
  }

  test("'now' is near current time") {
    val now = System.currentTimeMillis()
    assert(math.abs(Metadata.normalizeDate("now") - now) < 5000)
  }

  test("json round trip") {
    val m = Metadata.build(base + ("id" -> "deadbeef"))
    val m2 = Metadata.fromJson(m.json)
    assert(m2 === m)
  }

  test("invalid json rejected") {
    assertThrows[InvalidDatalakeMetadata](Metadata.fromJson("{not json"))
    assertThrows[InvalidDatalakeMetadata](Metadata.fromJson(null))
  }

  test("iso8601 decoration") {
    assert(Metadata.toIso8601(1426809600000L) === "2015-03-20T00:00:00.000Z")
    assert(Metadata.toIso8601(1426809600954L) === "2015-03-20T00:00:00.954Z")
  }

  test("trusted wire decode reads epoch-ms verbatim, no s/ms heuristic") {
    // start = 50e9 ms = 1971-08-02: already-normalized server output below
    // the 1e11 heuristic threshold. build() would re-multiply by 1000;
    // the trusted decode must not.
    val m = Metadata.build(base + ("id" -> "deadbeef"))
      .copy(start = 50000000000L, end = Some(50000086400L))
    val decoded = Metadata.fromValidatedJValue(m.toJValue)
    assert(decoded === m)
    assert(decoded.start === 50000000000L)
    // contrast: the untrusted path re-normalizes the same document
    assert(Metadata.fromJValue(m.toJValue).start === 50000000000000L)
    // null end and null work_id survive the round trip
    val m2 = Metadata.build(base + ("id" -> "cafe")).copy(end = None)
    assert(Metadata.fromValidatedJValue(m2.toJValue) === m2)
    assertThrows[InvalidDatalakeMetadata](
      Metadata.fromValidatedJValue(org.json4s.JString("nope")))
  }
}
