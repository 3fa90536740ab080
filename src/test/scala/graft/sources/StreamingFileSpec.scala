package graft.sources

import graft.core.Blake2b
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's StreamingFile buffer/readlines behavior
  * (client/datalake/dlfile.py:38-135, client/test/test_fetch.py) plus the
  * multipart upload protocol (archive.py:212-257, CHUNK_SIZE
  * archive.py:47-48). */
class StreamingFileSpec extends AnyFunSuite {

  private def sf(content: String, chunk: Int = 4): StreamingFile =
    new StreamingFile(
      content.getBytes(UTF_8).grouped(chunk).map(_.toArray))

  test("read() returns full content across chunk boundaries") {
    assert(new String(sf("welcome to the jungle").read(), UTF_8) ===
      "welcome to the jungle")
  }

  test("read() twice: second call returns empty") {
    val f = sf("welcome to the jungle")
    f.read()
    assert(f.read().isEmpty)
  }

  test("read(size) returns exactly size bytes, buffers the rest") {
    val f = sf("welcome to the jungle", chunk = 3)
    assert(new String(f.read(5), UTF_8) === "welco")
    assert(new String(f.read(4), UTF_8) === "me t")
    assert(new String(f.read(), UTF_8) === "o the jungle")
  }

  test("read(size) past end returns what remains") {
    val f = sf("abc", chunk = 2)
    assert(new String(f.read(10), UTF_8) === "abc")
    assert(f.read(10).isEmpty)
  }

  test("readLines re-assembles lines split across chunks") {
    val text = "line one\nsecond line\nthird\n"
    for (chunk <- Seq(1, 3, 5, 100)) {
      val lines = sf(text, chunk).readLines
        .map(new String(_, UTF_8)).toSeq
      assert(lines === Seq("line one\n", "second line\n", "third\n"),
        s"chunk=$chunk")
    }
  }

  test("readLines yields a final unterminated line") {
    val lines = sf("a\nb\nno newline at end", chunk = 4).readLines
      .map(new String(_, UTF_8)).toSeq
    assert(lines === Seq("a\n", "b\n", "no newline at end"))
  }

  test("readLines on empty stream yields nothing") {
    assert(sf("").readLines.isEmpty)
  }

  test("read after close raises") {
    val f = sf("data")
    f.close()
    intercept[IllegalStateException] { f.read() }
  }

  test("read(size) and readLines share ONE buffer (dlfile parity): " +
    "bytes over-fetched by read(size) are where the line stream starts, " +
    "and bytes past the consumed lines are what read() returns") {
    val f = sf("head:rest of line one\nline two\ntail", chunk = 8)
    assert(new String(f.read(5), UTF_8) === "head:")
    val lines = f.readLines
    assert(new String(lines.next(), UTF_8) === "rest of line one\n")
    assert(new String(lines.next(), UTF_8) === "line two\n")
    // switch back mid-stream: the unconsumed tail goes to read()
    assert(new String(f.read(), UTF_8) === "tail")
    assert(!lines.hasNext)
  }

  test("close() closes the underlying stream even when abandoned early " +
    "— a partial fetch must not leak the descriptor/connection") {
    var closed = false
    val in = new java.io.ByteArrayInputStream(new Array[Byte](100000)) {
      override def close(): Unit = { closed = true; super.close() }
    }
    val f = StreamingFile.fromInputStream(in, chunkSize = 64)
    f.read(10) // touch a little, abandon the rest
    assert(!closed)
    f.close()
    assert(closed)
  }

  test("fromInputStream chunks an arbitrary stream") {
    val bytes = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val f = StreamingFile.fromInputStream(
      new java.io.ByteArrayInputStream(bytes), chunkSize = 77)
    assert(f.read().toSeq === bytes.toSeq)
  }

  test("multipart upload: >1 chunk produces identical bytes and blake2b") {
    val dir = Files.createTempDirectory("mp")
    val src = dir.resolve("src.bin")
    val bytes = Array.tabulate[Byte](10240)(i => (i * 31 % 256).toByte)
    Files.write(src, bytes)
    val target = dir.resolve("data")
    val nParts = LocalContentStore.multipartUpload(src, target,
      chunkSize = 1024)
    assert(nParts === 10)
    assert(Files.readAllBytes(target).toSeq === bytes.toSeq)
    assert(Blake2b.hexDigest(Files.readAllBytes(target)) ===
      Blake2b.hexDigest(bytes))
    // staging dir cleaned up after commit
    assert(!Files.exists(dir.resolve(".data.upload")))
  }

  test("multipart upload with non-aligned final part") {
    val dir = Files.createTempDirectory("mp2")
    val src = dir.resolve("src.bin")
    val bytes = Array.tabulate[Byte](2500)(_.toByte)
    Files.write(src, bytes)
    assert(LocalContentStore.multipartUpload(src, dir.resolve("data"),
      chunkSize = 1000) === 3)
    assert(Files.readAllBytes(dir.resolve("data")).toSeq === bytes.toSeq)
  }

  test("push routes large content through multipart, small through copy") {
    val dir = Files.createTempDirectory("mp3")
    val store = new LocalContentStore(dir.resolve("store").toString)
    val src = dir.resolve("big.log")
    val content = ("x" * 5000 + "\n") * 2
    Files.write(src, content.getBytes(UTF_8))
    val fields = Map[String, Any]("what" -> "biglog", "where" -> "host",
      "work_id" -> null, "start" -> 1430092800000L)
    val (url, meta) = store.push(src, fields, chunkSize = 1024)
    val (gotMeta, size, _) = store.fetch(url)
    assert(size === content.getBytes(UTF_8).length)
    assert(gotMeta.hash === meta.hash)
    // streaming fetch returns the same bytes
    val streamed = store.openStreaming(url, chunkSize = 512).read()
    assert(new String(streamed, UTF_8) === content)
  }
}
