package graft.sources

import graft.core._
import graft.streaming.ContentStore
import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Local-filesystem content store with the reference's key layout.
  *
  * The reference stores object content at key `"{id}/data"` with the
  * metadata JSON embedded as S3 user-metadata (`archive.py:212-257,
  * 438-442`); the filesystem equivalent keeps a `metadata.json` sidecar
  * next to `data`. A real S3 adapter implements the same [[ObjectStore]]
  * trait with the SDK and must pass the same `ObjectStoreContract`
  * suite — content I/O is deliberately not a Spark job (SURVEY §1.3).
  */
final class LocalContentStore(root: String) extends ObjectStore {

  private def dirFor(id: String): Path = Paths.get(root, id)

  def urlFor(id: String): String = s"file://${dirFor(id)}/data"

  /** Base url clients push to (the `/v0/archive/` status document,
    * `v0.py:110-133` `DATALAKE_STORAGE_URL`). */
  def storageUrl: String = s"file://$root"

  /** Push a file: hash it (blake2b-16, the reference's content hash,
    * `dlfile.py:221-235`), validate/normalize metadata, upload content,
    * and write the metadata sidecar. Returns the storage url.
    * Mirrors `Archive.prepare_metadata_and_push` (`archive.py:186-199`).
    *
    * Content larger than `chunkSize` goes through the multipart protocol
    * (`archive.py:212-257`: TransferConfig with multipart_threshold =
    * multipart_chunksize = 100 MB by default): parts are written
    * independently to a hidden upload dir — each is individually
    * retryable, the unit S3 multipart gives you — then committed by
    * concatenation + atomic move, so a reader never observes a partial
    * object. */
  def push(sourcePath: Path, fields: Map[String, Any],
      chunkSize: Int): (String, Metadata) = {
    val withHash =
      if (fields.contains("hash")) fields
      else {
        val in = new BufferedInputStream(new FileInputStream(sourcePath.toFile))
        try fields + ("hash" -> Blake2b.hexDigestStream(in))
        finally in.close()
      }
    val withPath =
      if (withHash.contains("path")) withHash
      else withHash + ("path" -> sourcePath.toAbsolutePath.toString)
    // '~'-valued where/what/work_id fields translate against the path
    // (dlfile.py:213-219) — the reference's file→metadata entry point
    // applies translations before validation
    val meta = Metadata.build(Metadata.applyTranslations(withPath))
    val dir = dirFor(meta.id)
    Files.createDirectories(dir)
    if (Files.size(sourcePath) >= chunkSize)
      LocalContentStore.multipartUpload(sourcePath, dir.resolve("data"),
        chunkSize)
    else
      Files.copy(sourcePath, dir.resolve("data"),
        StandardCopyOption.REPLACE_EXISTING)
    Files.write(dir.resolve("metadata.json"),
      meta.json.getBytes(StandardCharsets.UTF_8))
    (urlFor(meta.id), meta)
  }

  /** Store content under an ALREADY-validated metadata document verbatim
    * — no re-normalization (re-running the s/ms heuristic on values that
    * are already epoch-ms would corrupt pre-1973 timestamps). Used by the
    * uploader, which receives validated metadata inside bundles. */
  def pushValidated(content: Array[Byte], meta: Metadata): String = {
    val dir = dirFor(meta.id)
    Files.createDirectories(dir)
    Files.write(dir.resolve("data"), content)
    Files.write(dir.resolve("metadata.json"),
      meta.json.getBytes(StandardCharsets.UTF_8))
    urlFor(meta.id)
  }

  /** Resolve a url to (metadata, size, create_time) — the ingest-side
    * re-read (`record.py:95-122`). The sidecar was written from
    * already-validated metadata, so it is decoded TRUSTED: re-running
    * `fromJson`'s s/ms normalize heuristic here would rescale pre-1973
    * epoch-ms starts a second time (caught by ObjectStoreContract's
    * verbatim round-trip test). */
  override def fetch(url: String): (Metadata, Long, Long) = {
    val dataPath = pathOf(url)
    val metaPath = dataPath.getParent.resolve("metadata.json")
    if (!Files.exists(dataPath) || !Files.exists(metaPath))
      throw new NoSuchDatalakeFile(s"no such file: $url")
    val meta = Metadata.fromValidatedJValue(
      org.json4s.jackson.JsonMethods.parse(
        new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8)))
    (meta, Files.size(dataPath), Files.getLastModifiedTime(dataPath).toMillis)
  }

  /** Open the content stream (the fetch path, `fetcher.py:70-91`). */
  def open(url: String): InputStream = {
    val p = pathOf(url)
    if (!Files.exists(p)) throw new NoSuchDatalakeFile(s"no such file: $url")
    new BufferedInputStream(new FileInputStream(p.toFile))
  }

  /** Open the content as a chunk-buffered [[StreamingFile]] (the
    * reference's `fetch(url, stream=True)` shape, `archive.py:365-377`):
    * large objects are read incrementally, never materialized whole. */
  def openStreaming(url: String, chunkSize: Int): StreamingFile =
    StreamingFile.fromInputStream(open(url), chunkSize)

  /** Resolve any `<scheme>://` url to a local path — the store is
    * scheme-agnostic so ingest fixtures can carry s3-style urls. */
  private def pathOf(url: String): Path =
    Paths.get(url.replaceFirst("^[a-z0-9]+://", ""))
}

object LocalContentStore {

  /** The reference's `CHUNK_SIZE()` (`archive.py:45-48`): 100 MB
    * multipart threshold and chunk size, overridable through the same
    * `DATALAKE_CHUNK_SIZE_MB` environment variable (float MB). Values
    * that parse but cannot work — non-positive, NaN, or beyond Int
    * range after MB scaling — fall back to the default rather than
    * wedging every push. */
  val DefaultChunkSize: Int =
    sys.env.get("DATALAKE_CHUNK_SIZE_MB").flatMap(_.toDoubleOption)
      .map(_ * 1024 * 1024)
      .filter(b => b >= 1 && b <= Int.MaxValue.toDouble)
      .map(_.toInt)
      .getOrElse(100 * 1024 * 1024)

  /** Multipart upload against the local store: stage `chunkSize` parts in
    * a hidden sibling dir (each part an independent, retryable write),
    * then complete by concatenating into a temp object promoted with an
    * atomic move. Returns the number of parts written. */
  def multipartUpload(source: Path, target: Path, chunkSize: Int): Int = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val uploadDir = target.resolveSibling("." + target.getFileName + ".upload")
    if (Files.exists(uploadDir)) deleteRecursively(uploadDir)
    Files.createDirectories(uploadDir)
    val in = new BufferedInputStream(new FileInputStream(source.toFile))
    var nParts = 0
    try {
      val buf = new Array[Byte](chunkSize)
      var eof = false
      while (!eof) {
        var off = 0
        var n = 0
        while (off < chunkSize && n >= 0) {
          n = in.read(buf, off, chunkSize - off)
          if (n > 0) off += n
        }
        if (n < 0) eof = true
        if (off > 0) {
          Files.write(uploadDir.resolve(f"part-$nParts%05d"),
            java.util.Arrays.copyOf(buf, off))
          nParts += 1
        }
      }
    } finally in.close()
    // complete: concatenate parts in order into a temp object, promote
    val tmp = target.resolveSibling("." + target.getFileName + ".tmp")
    val out = Files.newOutputStream(tmp)
    try {
      (0 until nParts).foreach { i =>
        Files.copy(uploadDir.resolve(f"part-$i%05d"), out)
      }
    } finally out.close()
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(uploadDir)
    nParts
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteRecursively(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
