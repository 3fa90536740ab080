package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of bucket math tests (client/datalake/tests/test_record.py:50-96). */
class RecordSpec extends AnyFunSuite {

  val day: Long = DatalakeRecord.TimeBucketSizeMs

  def meta(start: Long, end: Option[Long]): Metadata =
    Metadata(0, start, end, "here", "thing", None, "/var/x.log", "id1", "h")

  test("single bucket for instant record") {
    assert(DatalakeRecord.timeBucketsOf(meta(day * 100 + 5, None)) ===
      Seq(100L))
  }

  test("same-bucket interval") {
    assert(DatalakeRecord.timeBucketsOf(
      meta(day * 100 + 5, Some(day * 100 + 99))) === Seq(100L))
  }

  test("span covers every bucket touched, inclusive") {
    assert(DatalakeRecord.timeBucketsOf(
      meta(day * 100, Some(day * 102 + 1))) === Seq(100L, 101L, 102L))
  }

  test("misaligned span: end on bucket boundary belongs to that bucket") {
    assert(DatalakeRecord.timeBucketsOf(
      meta(day * 100 + day / 2, Some(day * 101))) === Seq(100L, 101L))
  }

  test("span of exactly 30 buckets allowed, 31 rejected") {
    assert(DatalakeRecord.timeBucketsOf(
      meta(day * 100, Some(day * 129 + 1))).size === 30)
    assertThrows[UnsupportedTimeRange](
      DatalakeRecord.timeBucketsOf(meta(day * 100, Some(day * 130 + 1))))
  }

  test("negative timestamps floor correctly") {
    assert(DatalakeRecord.bucketOf(-1L) === -1L)
    assert(DatalakeRecord.bucketOf(0L) === 0L)
  }

  test("index key derivations") {
    val m = meta(day * 100, None)
    val r = DatalakeRecord.listFromMetadata(m, "file:///x", 123L, 42L).head
    assert(r.timeIndexKey === "100:thing")
    assert(r.rangeKey === "here:id1")
    assert(r.workIdIndexKey === "nullid1:thing")
    assert(r.whatWhereKey === "thing:here")
    val m2 = m.copy(workId = Some("job-7"))
    val r2 = DatalakeRecord.listFromMetadata(m2, "file:///x", 123L, 42L).head
    assert(r2.workIdIndexKey === "job-7:thing")
  }

  test("one record per bucket with shared metadata") {
    val m = meta(day * 10, Some(day * 12))
    val rs = DatalakeRecord.listFromMetadata(m, "file:///y", 5L, 7L)
    assert(rs.map(_.timeBucket) === Seq(10L, 11L, 12L))
    assert(rs.forall(_.metadata === m))
    assert(rs.forall(_.size === 7L))
  }
}

class TranslatorSpec extends AnyFunSuite {
  test("doc example") {
    val t = Translator(".*job-(?P<job_id>[0-9]+).log$~job{job_id}")
    assert(t.translate("/var/log/jobs/job-1234.log") === "job1234")
  }

  test("multiple groups and literals") {
    val t = Translator("/d/(?P<a>[a-z]+)/(?P<b>[0-9]+)~{a}-x-{b}")
    assert(t.translate("/d/foo/77") === "foo-x-77")
  }

  test("must have exactly one tilde") {
    assertThrows[TranslatorError](Translator("no-tilde-here"))
    assertThrows[TranslatorError](Translator("a~b~c"))
  }

  test("bad regex rejected at construction") {
    assertThrows[TranslatorError](Translator("[unclosed~x"))
  }

  test("non-matching path errors") {
    val t = Translator(".*job-(?P<id>[0-9]+).log$~{id}")
    assertThrows[TranslatorError](t.translate("/var/log/other.log"))
  }

  test("relative path errors") {
    val t = Translator(".*(?P<id>[0-9]+)~{id}")
    assertThrows[TranslatorError](t.translate("rel/path1"))
  }

  test("format referencing unknown group errors") {
    val t = Translator(".*job-(?P<id>[0-9]+).log$~{nope}")
    assertThrows[TranslatorError](t.translate("/var/job-1.log"))
  }
}

class Blake2bSpec extends AnyFunSuite {
  // vectors generated with python hashlib.blake2b (public algorithm, RFC 7693)
  test("empty input, digest_size=16") {
    assert(Blake2b.hexDigest(Array.emptyByteArray) ===
      "cae66941d9efbd404e4d88758ea67670")
  }

  test("'abc', digest_size=16") {
    assert(Blake2b.hexDigest("abc".getBytes) ===
      "cf4ab791c62b8d2b2109c90275287816")
  }

  test("'abc', digest_size=64 (RFC 7693 appendix vector)") {
    assert(Blake2b.hexDigest("abc".getBytes, 64) ===
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("multi-block input, digest_size=16") {
    val big = Array.tabulate(256 * 1000)(i => (i % 256).toByte)
    assert(Blake2b.hexDigest(big) === "53b77b188c91a7d66c490e9489b2fc73")
  }

  test("streaming chunks match one-shot") {
    val data = Array.tabulate(300000)(i => ((i * 31) % 256).toByte)
    val b = new Blake2b(16)
    data.grouped(7777).foreach(c => b.update(c))
    assert(Blake2b.toHex(b.digest()) === Blake2b.hexDigest(data))
    assert(Blake2b.hexDigestStream(
      new java.io.ByteArrayInputStream(data)) === Blake2b.hexDigest(data))
  }

  test("'hello world\\n', digest_size=16") {
    assert(Blake2b.hexDigest("hello world\n".getBytes) ===
      "c0cdb4699cdaa9eea4c563a934f1d52b")
  }
}

class CursorSpec extends AnyFunSuite {
  test("round trip with all fields") {
    val c = Cursor(Some(16636L), Some("nebraska:abc"), Some("abc"))
    val c2 = Cursor.fromSerialized(c.serialized)
    assert(c2 === c)
  }

  test("round trip time-bucket only") {
    val c = Cursor(Some(100L), None, None)
    assert(Cursor.fromSerialized(c.serialized) === c)
  }

  test("non-ASCII resume key round-trips — an ASCII encode would mangle " +
    "it to '?' and the next page would resume from the wrong position") {
    val c = Cursor(Some(16636L), Some("16636:münchen:abc"), Some("abc"))
    assert(Cursor.fromSerialized(c.serialized) === c)
  }

  test("serialized has no padding and is url-safe-ish") {
    val s = Cursor(Some(1L), None, Some("x")).serialized
    assert(!s.endsWith("="))
  }

  test("cursor without required fields rejected") {
    assertThrows[QueryValidationError](Cursor(None, None, Some("id")))
  }

  test("garbage cursor rejected with InvalidCursor code") {
    val e = intercept[QueryValidationError](
      Cursor.fromSerialized("!!!notb64!!!"))
    assert(e.code === QueryValidationError.InvalidCursor)
    val e2 = intercept[QueryValidationError](
      Cursor.fromSerialized(java.util.Base64.getEncoder
        .encodeToString("[1,2]".getBytes)))
    assert(e2.code === QueryValidationError.InvalidCursor)
  }
}
