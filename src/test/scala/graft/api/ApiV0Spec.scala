package graft.api

import graft.core.{Cursor, Metadata, QueryValidationError}
import graft.query.{QueryPage, UnpackedRecord}
import graft.store.MetadataRow
import org.scalatest.funsuite.AnyFunSuite

/** Port of the API error-contract matrix
  * (api/tests/test_bad_queries.py:32-135) plus decoration checks
  * (api/tests/test_metadata.py:30-50). */
class ApiV0Spec extends AnyFunSuite {

  def code(f: => Any): String =
    intercept[QueryValidationError](f).code

  test("no args → NoArgs") {
    assert(code(ApiV0.validateFilesParams(Map.empty)) === "NoArgs")
  }

  test("missing what → NoWhat") {
    assert(code(ApiV0.validateFilesParams(Map("work_id" -> "w"))) === "NoWhat")
  }

  test("what alone → NoWorkInterval") {
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x"))) ===
      "NoWorkInterval")
  }

  test("work_id AND start/end → InvalidWorkInterval") {
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "work_id" -> "w", "start" -> "0"))) === "InvalidWorkInterval")
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "work_id" -> "w", "end" -> "0"))) === "InvalidWorkInterval")
  }

  test("start without end (and vice versa) → InvalidWorkInterval") {
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "start" -> "0"))) === "InvalidWorkInterval")
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "end" -> "0"))) === "InvalidWorkInterval")
  }

  test("garbage times → InvalidTime") {
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "start" -> "not-a-date", "end" -> "0"))) === "InvalidTime")
  }

  test("start after end → InvalidWorkInterval") {
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "start" -> "100", "end" -> "50"))) === "InvalidWorkInterval")
  }

  test("bad cursor → InvalidCursor") {
    assert(code(ApiV0.validateFilesParams(Map("what" -> "x",
      "work_id" -> "w", "cursor" -> "@@@"))) === "InvalidCursor")
  }

  test("valid time query parses; dates normalized") {
    val q = ApiV0.validateFilesParams(Map("what" -> "x",
      "start" -> "2015-03-20", "end" -> "1426895999999", "where" -> "here"))
    assert(q.start === Some(1426809600000L))
    assert(q.end === Some(1426895999999L))
    assert(q.where === Some("here"))
    assert(q.workId.isEmpty)
  }

  test("valid work_id query parses") {
    val q = ApiV0.validateFilesParams(Map("what" -> "x", "work_id" -> "j-1"))
    assert(q.workId === Some("j-1"))
    assert(q.start.isEmpty)
  }

  test("lookback validation") {
    assert(ApiV0.validateLookback("21") === 21)
    assert(code(ApiV0.validateLookback("soon")) === "InvalidLookback")
  }

  val rec: UnpackedRecord = UnpackedRecord(
    "s3://bucket/id1/data",
    MetadataRow(0, 1426809600000L, Some(1426809600954L), "here", "what1",
      None, "/var/log/x.log", "id1", "abcd"),
    Some(1426809601000L), Some(1024L))

  test("record decoration: iso fields, http_url, null end tolerated") {
    val j = ApiV0.recordJson(rec, "http://api")
    val s = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(j))
    assert(s.contains(""""start_iso":"2015-03-20T00:00:00.000Z""""))
    assert(s.contains(""""end_iso":"2015-03-20T00:00:00.954Z""""))
    assert(s.contains(""""http_url":"http://api/v0/archive/files/id1/data""""))
    val noEnd = rec.copy(metadata = rec.metadata.copy(end = None))
    val s2 = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(ApiV0.recordJson(noEnd, "u")))
    assert(s2.contains(""""end":null"""))
    assert(s2.contains(""""end_iso":null"""))
  }

  test("files response carries next url with cursor, null when done") {
    val cur = Cursor(Some(5L), None, Some("id1"))
    val withNext = ApiV0.filesResponse(QueryPage(Seq(rec), Some(cur)),
      "http://api", Map("what" -> "x", "start" -> "0", "end" -> "9"))
    val s = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(withNext))
    assert(s.contains("cursor=" + cur.serialized))
    val done = ApiV0.filesResponse(QueryPage(Seq(rec), None), "u", Map.empty)
    assert((done \ "next") === org.json4s.JNull)
  }

  val meta: Metadata = Metadata(0, 1426809600123L, Some(1426809600999L),
    "here", "syslog", Some("job-1"), "/var/log/syslog.1", "deadbeef", "ff")

  test("filename templating: fields, iso vars, default, unknown var") {
    assert(ApiV0.filenameFromTemplate(Some("{what}.log"), meta) === "syslog.log")
    assert(ApiV0.filenameFromTemplate(
      Some("{where}/{what}-{start}.log"), meta) ===
      "here/syslog-1426809600123.log")
    assert(ApiV0.filenameFromTemplate(Some("{start_iso}"), meta) ===
      "2015-03-20T00:00:00.123")
    assert(ApiV0.filenameFromTemplate(None, meta) === "deadbeef")
    val e = intercept[QueryValidationError](
      ApiV0.filenameFromTemplate(Some("{nope}"), meta))
    assert(e.message.contains("supported template variable"))
  }

  test("filename templating: str.format brace grammar — {{/}} are " +
    "literals, a lone brace is InvalidDatalakePath (archive.py:393-394)") {
    assert(ApiV0.filenameFromTemplate(Some("{{id}}"), meta) === "{id}")
    assert(ApiV0.filenameFromTemplate(Some("a}}b{{c"), meta) === "a}b{c")
    val lone = intercept[QueryValidationError](
      ApiV0.filenameFromTemplate(Some("{id}}.txt"), meta))
    assert(lone.code === "InvalidDatalakePath" &&
      lone.message.contains("Single '}'"))
    val open = intercept[QueryValidationError](
      ApiV0.filenameFromTemplate(Some("{id"), meta))
    assert(open.message.contains("Single '{'"))
  }

  test("content sniffing: mimetype with checksum strip, gzip magic") {
    assert(ContentSniffer.contentType("/var/log/app.log") ===
      Some("text/plain"))
    assert(ContentSniffer.contentType(
      "/var/log/app.json-" + "ab" * 16) === Some("application/json"))
    assert(ContentSniffer.contentType("/var/log/noext") === None)
    assert(ContentSniffer.contentEncoding(
      Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte, 0x00.toByte)) ===
      Some("gzip"))
    assert(ContentSniffer.contentEncoding("plain text".getBytes) === None)
  }
}
