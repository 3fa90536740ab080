package graft.sources

import graft.core.Metadata
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Port of the queue/uploader behavior matrix
  * (client/datalake/tests/test_queue.py:114-263). */
class UploadQueueSpec extends AnyFunSuite {

  def fields(what: String): Map[String, Any] = Map(
    "what" -> what, "where" -> "testhost", "work_id" -> null,
    "start" -> 1430092800000L)

  def newQueue(): (String, java.nio.file.Path) = {
    val q = Files.createTempDirectory("upq").toString
    val src = Files.createTempFile("content", ".log")
    Files.write(src, "log line one\n".getBytes(StandardCharsets.UTF_8))
    (q, src)
  }

  test("bundle round-trips content + metadata, hash inferred") {
    val (q, src) = newQueue()
    val bundle = new Enqueuer(q).enqueue(src, fields("syslog"))
    // reference bundle naming: <id>.tar (queue.py:101)
    assert(bundle.getFileName.toString.endsWith(".tar"))
    val (content, meta) = Bundle.read(bundle)
    assert(new String(content, StandardCharsets.UTF_8) === "log line one\n")
    assert(meta.what === "syslog")
    assert(meta.hash === graft.core.Blake2b.hexDigest(content))
  }

  test("reads a bundle produced by the reference implementation") {
    // src/test/resources/reference-bundle.tar was written by python
    // tarfile mirroring dlfile.py:305-327 (File.to_bundle): members
    // content, version, datalake-metadata.json with TarInfo defaults
    val fixture = Paths.get(
      getClass.getClassLoader.getResource("reference-bundle.tar").toURI)
    val (content, meta) = Bundle.read(fixture)
    assert(new String(content, StandardCharsets.UTF_8) ===
      "GET / HTTP/1.1 200\nGET /health HTTP/1.1 200\n")
    assert(meta.what === "nginx")
    assert(meta.where === "webserver01")
    assert(meta.id === "0123456789abcdef0123456789abcdef")
    assert(meta.start === 1426809600000L)
    assert(meta.end === Some(1426809600954L))
  }

  test("graft-written bundles parse as plain ustar (member layout parity)") {
    val (q, src) = newQueue()
    val bundle = new Enqueuer(q).enqueue(src, fields("parity"))
    val in = new java.io.FileInputStream(bundle.toFile)
    val members = try Tar.read(in) finally in.close()
    // same member set the reference writer produces, content first
    assert(members.keySet ===
      Set("content", "version", "datalake-metadata.json"))
    assert(new String(members("version"), StandardCharsets.UTF_8) === "0")
  }

  test("tar codec rejects truncated archives and over-long names") {
    val entries = Seq("content" -> "abc".getBytes(StandardCharsets.UTF_8))
    val buf = new java.io.ByteArrayOutputStream()
    Tar.write(buf, entries)
    val whole = buf.toByteArray
    // cutting inside the member data must raise, not return partial data
    val truncated = java.util.Arrays.copyOf(whole, 513)
    intercept[java.io.EOFException](
      Tar.read(new java.io.ByteArrayInputStream(truncated)))
    // names beyond the 100-byte ustar field are refused at write time
    intercept[IllegalArgumentException](
      Tar.write(new java.io.ByteArrayOutputStream(),
        Seq(("x" * 101) -> Array.emptyByteArray)))
    // a clean round-trip for the same entries
    val back = Tar.read(new java.io.ByteArrayInputStream(whole))
    assert(back.keySet === Set("content"))
    assert(new String(back("content"), StandardCharsets.UTF_8) === "abc")
    // a stream that ends without the end-of-archive marker is truncated
    // (the mid-copy signature), even when it cuts at a block boundary
    intercept[java.io.EOFException](Tar.read(
      new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOf(whole, 1024))))
  }

  test("tar header validation: checksum rejects garbage before trusting " +
    "the size field; a full 100-byte name stays inside its field") {
    // 512 bytes of text = a complete 'header' whose checksum can't match
    val garbage = ("x" * 512).getBytes(StandardCharsets.US_ASCII)
    intercept[IllegalArgumentException](
      Tar.read(new java.io.ByteArrayInputStream(garbage)))
    // exactly-100-byte name: ustar permits it unterminated, and a
    // whole-block takeWhile would run past it into the mode digits
    val name = "a" * 100
    val buf = new java.io.ByteArrayOutputStream()
    Tar.write(buf, Seq(name -> "data".getBytes(StandardCharsets.UTF_8)))
    val back = Tar.read(new java.io.ByteArrayInputStream(buf.toByteArray))
    assert(back.keySet === Set(name))
    assert(new String(back(name), StandardCharsets.UTF_8) === "data")
  }

  test("zip bundles from earlier graft versions stay readable") {
    val (q, src) = newQueue()
    val meta = Metadata.build(fields("legacy") ++ Map(
      "path" -> src.toAbsolutePath.toString,
      "hash" -> "00000000000000000000000000000000"))
    val legacy = Paths.get(q, s"${meta.id}.bundle")
    val out = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(legacy.toFile))
    try {
      def entry(name: String, bytes: Array[Byte]): Unit = {
        out.putNextEntry(new java.util.zip.ZipEntry(name))
        out.write(bytes); out.closeEntry()
      }
      entry("version", "0".getBytes(StandardCharsets.UTF_8))
      entry("content", "old content\n".getBytes(StandardCharsets.UTF_8))
      entry("datalake-metadata.json",
        meta.json.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    val (content, parsed) = Bundle.read(legacy)
    assert(new String(content, StandardCharsets.UTF_8) === "old content\n")
    assert(parsed.what === "legacy")
  }

  test("drain processes backlog and deletes bundles") {
    val (q, src) = newQueue()
    val enq = new Enqueuer(q)
    enq.enqueue(src, fields("a"))
    enq.enqueue(src, fields("b"))
    val pushed = mutable.Buffer.empty[String]
    val up = new Uploader(q, (_, m) => pushed += m.what)
    assert(up.drain() === 2)
    assert(pushed.sorted === Seq("a", "b"))
    assert(Files.list(Paths.get(q)).count() === 0)
  }

  test("dot-files and invalid bundles are skipped, valid ones proceed") {
    val (q, src) = newQueue()
    Files.write(Paths.get(q, ".hidden"), "x".getBytes)
    // COMPLETE garbage (a full header-sized block that fails the tar
    // checksum) — permanently invalid, unlike a short file which could
    // be a bundle still being copied in
    Files.write(Paths.get(q, "garbage.bundle"), ("not a zip " * 60).getBytes)
    new Enqueuer(q).enqueue(src, fields("good"))
    val pushed = mutable.Buffer.empty[String]
    val skipped = mutable.Buffer.empty[String]
    val up = new Uploader(q, (_, m) => pushed += m.what,
      (p, _) => skipped += p.getFileName.toString)
    assert(up.drain() === 1)
    assert(pushed === Seq("good"))
    assert(skipped === Seq("garbage.bundle"))
    // permanently invalid bundle not retried on next drain
    assert(up.drain() === 0)
    assert(skipped.size === 1)
  }

  test("a truncated bundle is retried, not poisoned: the reference " +
    "watches CLOSE_WRITE so it only ever sees complete files — the " +
    "JVM watcher sees mid-copy files, and latching them as processed " +
    "would silently lose the bundle once the copy completes") {
    val (q, src) = newQueue()
    // a complete valid bundle, then a truncated prefix of it standing in
    // for a non-atomic copy caught mid-write
    val full = new Enqueuer(q).enqueue(src, fields("slowcopy"))
    val bytes = Files.readAllBytes(full)
    Files.delete(full)
    Files.write(full, java.util.Arrays.copyOf(bytes, 700))
    val pushed = mutable.Buffer.empty[String]
    val skipped = mutable.Buffer.empty[Throwable]
    val up = new Uploader(q, (_, m) => pushed += m.what,
      (_, e) => skipped += e)
    assert(up.drain() === 0)
    assert(skipped.nonEmpty && pushed.isEmpty)
    // the "copy" completes; the SAME uploader instance must pick it up
    Files.write(full, bytes)
    assert(up.drain() === 1)
    assert(pushed === Seq("slowcopy"))
  }

  test("push failure leaves the bundle for inspection, uploader continues") {
    val (q, src) = newQueue()
    new Enqueuer(q).enqueue(src, fields("boom"))
    new Enqueuer(q).enqueue(src, fields("fine"))
    val pushed = mutable.Buffer.empty[String]
    val up = new Uploader(q,
      (_, m) => if (m.what == "boom") sys.error("push failed") else pushed += m.what)
    assert(up.drain() === 1)
    assert(pushed === Seq("fine"))
    assert(Files.list(Paths.get(q)).count() === 1) // boom bundle retained
  }

  test("listen with timeout picks up bundles written while watching") {
    val (q, src) = newQueue()
    val pushed = mutable.Buffer.empty[String]
    val up = new Uploader(q, (_, m) => pushed += m.what)
    val writer = new Thread(() => {
      Thread.sleep(300)
      new Enqueuer(q).enqueue(src, fields("late"))
    })
    writer.start()
    val n = up.listen(Some(3000L))
    writer.join()
    assert(n === 1)
    assert(pushed === Seq("late"))
  }

  test("listen with immediate timeout returns after draining backlog") {
    val (q, src) = newQueue()
    new Enqueuer(q).enqueue(src, fields("pre"))
    val pushed = mutable.Buffer.empty[String]
    assert(new Uploader(q, (_, m) => pushed += m.what).listen(Some(1L)) === 1)
    assert(pushed === Seq("pre"))
  }
}
