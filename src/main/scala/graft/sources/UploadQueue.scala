package graft.sources

import graft.core.{DatalakeRecord, InvalidDatalakeMetadata, Metadata}
import java.io.{FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardWatchEventKinds, WatchService}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import scala.collection.mutable

/** Client-side upload queue (T4, `client/datalake/queue.py:78-221`).
  *
  * `Enqueuer.enqueue` wraps {content, version, metadata json} into an
  * uncompressed tar named `<id>.tar` — the exact bundle layout the
  * reference produces (`dlfile.py:311-327`, `queue.py:101`), so bundles
  * interoperate in both directions. Zip envelopes written by earlier
  * graft versions are still readable (sniffed by magic). `Uploader
  * .drain` processes pre-existing bundles then `listen(timeout)` watches
  * for new ones — dot-files are skipped, invalid bundles are skipped
  * with a callback (never crash the uploader), and each successful push
  * invokes the supplied sink.
  */
object Bundle {

  val Version = "0"

  def write(queueDir: Path, content: Array[Byte], meta: Metadata): Path = {
    val target = queueDir.resolve(s"${meta.id}.tar")
    val tmp = queueDir.resolve(s".${meta.id}.tar.partial")
    val out = new FileOutputStream(tmp.toFile)
    // same member order as the reference writer (dlfile.py:311-317)
    try Tar.write(out, Seq(
      "content" -> content,
      "version" -> Version.getBytes(StandardCharsets.UTF_8),
      "datalake-metadata.json" -> meta.json.getBytes(StandardCharsets.UTF_8)))
    finally out.close()
    // atomic publish so the watcher never sees a half-written bundle
    Files.move(tmp, target)
    target
  }

  def read(bundle: Path): (Array[Byte], Metadata) = {
    val entries = readEntries(bundle)
    val version = entries.get("version")
      .map(new String(_, StandardCharsets.UTF_8))
      .getOrElse(throw new InvalidDatalakeMetadata("bundle has no version"))
    if (version != Version)
      throw new InvalidDatalakeMetadata(s"unsupported bundle version $version")
    val meta = Metadata.fromJson(new String(
      entries.getOrElse("datalake-metadata.json",
        throw new InvalidDatalakeMetadata("bundle has no metadata")),
      StandardCharsets.UTF_8))
    (entries.getOrElse("content",
      throw new InvalidDatalakeMetadata("bundle has no content")), meta)
  }

  private def readEntries(bundle: Path): Map[String, Array[Byte]] = {
    // zip local-file magic is "PK\3\4"; anything else is treated as tar
    // (tar has no leading magic — its ustar marker sits at offset 257)
    val head = {
      val in = new FileInputStream(bundle.toFile)
      try in.readNBytes(2) finally in.close()
    }
    val isZip = head.length == 2 && head(0) == 'P' && head(1) == 'K'
    if (!isZip) {
      val in = new FileInputStream(bundle.toFile)
      try Tar.read(in) finally in.close()
    } else {
      val entries = mutable.Map.empty[String, Array[Byte]]
      val in = new ZipInputStream(new FileInputStream(bundle.toFile))
      try {
        var e = in.getNextEntry
        while (e != null) {
          entries(e.getName) = in.readAllBytes()
          in.closeEntry()
          e = in.getNextEntry
        }
      } finally in.close()
      entries.toMap
    }
  }
}

final class Enqueuer(queueDir: String) {
  Files.createDirectories(Paths.get(queueDir))

  def enqueue(file: Path, fields: Map[String, Any]): Path = {
    val content = Files.readAllBytes(file)
    val withHash =
      if (fields.contains("hash")) fields
      else fields + ("hash" -> graft.core.Blake2b.hexDigest(content))
    val withPath =
      if (withHash.contains("path")) withHash
      else withHash + ("path" -> file.toAbsolutePath.toString)
    Bundle.write(Paths.get(queueDir), content,
      Metadata.build(Metadata.applyTranslations(withPath)))
  }
}

final class Uploader(
    queueDir: String,
    push: (Array[Byte], Metadata) => Unit,
    onSkip: (Path, Throwable) => Unit = (_, _) => ()) {

  private val dir = Paths.get(queueDir)
  Files.createDirectories(dir)
  private val processed = mutable.Set.empty[String]

  /** Process all pre-existing bundles (queue.py:127-139 drains the
    * backlog before listening). Dot-files and already-processed names are
    * skipped; invalid bundles are skipped with the callback. */
  def drain(): Int = {
    val stream = Files.list(dir)
    try {
      val files = stream.iterator()
      var n = 0
      while (files.hasNext) {
        val f = files.next()
        if (handleOne(f)) n += 1
      }
      n
    } finally stream.close()
  }

  private def handleOne(f: Path): Boolean = {
    val name = f.getFileName.toString
    if (name.startsWith(".") || processed.contains(name) ||
      !Files.isRegularFile(f)) return false
    // a bundle is marked processed only when the push succeeded (the file
    // is then deleted) or its format is PERMANENTLY invalid (bad header
    // checksum / fields / metadata — IllegalArgument or metadata errors).
    // Transient read errors — EOFException from a file still being
    // copied in non-atomically (the very case the watcher registers
    // ENTRY_MODIFY for), or any other I/O hiccup — must NOT latch
    // `processed`, or the bundle is silently lost forever once the copy
    // completes; like a transient push failure, they leave the bundle
    // eligible for the next drain() (queue.py:127-139).
    val parsed =
      try Some(Bundle.read(f))
      catch {
        case e @ (_: InvalidDatalakeMetadata | _: IllegalArgumentException) =>
          processed += name; onSkip(f, e); return false
        case e: Exception =>
          onSkip(f, e); return false
      }
    try {
      val (content, meta) = parsed.get
      push(content, meta)
      processed += name
      Files.deleteIfExists(f)
      true
    } catch {
      case e: Exception => onSkip(f, e); false
    }
  }

  /** Drain, then watch the directory for up to `timeoutMs` (the
    * reference's `listen(timeout)` contract: return after the timeout
    * with no work; loop forever when timeout is None). */
  def listen(timeoutMs: Option[Long]): Int = {
    // register the watch BEFORE draining the backlog — a bundle written
    // in between is then guaranteed to produce an event
    val watcher: WatchService = dir.getFileSystem.newWatchService()
    dir.register(watcher, StandardWatchEventKinds.ENTRY_CREATE,
      StandardWatchEventKinds.ENTRY_MODIFY)
    var n = drain()
    val deadline = timeoutMs.map(System.currentTimeMillis() + _)
    try {
      var running = true
      while (running) {
        val remaining = deadline.map(_ - System.currentTimeMillis())
        if (remaining.exists(_ <= 0)) running = false
        else {
          val key = remaining match {
            case Some(ms) =>
              watcher.poll(ms, java.util.concurrent.TimeUnit.MILLISECONDS)
            case None => watcher.take()
          }
          if (key != null) {
            key.pollEvents()
            key.reset()
            n += drain()
          }
        }
      }
    } finally watcher.close()
    n
  }
}
