package graft.tools

import graft.api.ListedRecord
import graft.core.Metadata
import org.scalatest.funsuite.AnyFunSuite

/** Human list-format parity with the reference CLI (`cli.py:210-226`):
  * start/end render via python `datetime.isoformat()` — '+00:00' offset,
  * fractional digits only when the sub-second part is non-zero — and the
  * `if v:` truthiness test renders BOTH null and epoch 0 as "null". */
class CliFormatSpec extends AnyFunSuite {

  private def rec(start: Long, end: Option[Long]): ListedRecord =
    ListedRecord(
      url = "s3://bucket/x/data",
      httpUrl = Some("http://h/v0/archive/files/x/data"),
      metadata = Metadata(0, start, end, "srv01", "nginx", None,
        "/var/log/nginx.log", "ab" * 16, "00" * 16),
      createTime = Some(1426809600000L),
      size = Some(1024L))

  private def human(r: ListedRecord): Map[String, String] =
    Cli.formatRecord(r, "human").split("\n")
      .map(_.split(": ", 2)).map(a => a(0) -> a(1)).toMap

  test("whole-second timestamps render without fractional digits") {
    val h = human(rec(1426809600000L, Some(1426809600000L)))
    assert(h("start") === "2015-03-20T00:00:00+00:00")
    assert(h("end") === "2015-03-20T00:00:00+00:00")
  }

  test("sub-second timestamps render python's six fractional digits") {
    val h = human(rec(1426809600954L, None))
    assert(h("start") === "2015-03-20T00:00:00.954000+00:00")
    assert(h("end") === "null")
  }

  test("epoch 0 is falsy in python and renders null") {
    val h = human(rec(0L, Some(0L)))
    assert(h("start") === "null")
    assert(h("end") === "null")
  }

  test("url format emits the bare url line") {
    assert(Cli.formatRecord(rec(1L, None), "url") === "s3://bucket/x/data")
  }
}
