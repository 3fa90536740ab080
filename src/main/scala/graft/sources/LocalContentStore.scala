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
  * next to `data`. S3 would implement the same interface with the SDK —
  * content I/O is deliberately not a Spark job (SURVEY §1.3).
  */
final class LocalContentStore(root: String) extends ContentStore {

  private def dirFor(id: String): Path = Paths.get(root, id)

  def urlFor(id: String): String = s"file://${dirFor(id)}/data"

  /** Push a file: hash it (blake2b-16, the reference's content hash,
    * `dlfile.py:221-235`), validate/normalize metadata, copy content, and
    * write the metadata sidecar. Returns the storage url.
    * Mirrors `Archive.prepare_metadata_and_push` (`archive.py:186-199`). */
  def push(sourcePath: Path, fields: Map[String, Any]): (String, Metadata) = {
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
    val meta = Metadata.build(withPath)
    val dir = dirFor(meta.id)
    Files.createDirectories(dir)
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
    * re-read (`record.py:95-122`). */
  override def fetch(url: String): (Metadata, Long, Long) = {
    val dataPath = pathOf(url)
    val metaPath = dataPath.getParent.resolve("metadata.json")
    if (!Files.exists(dataPath) || !Files.exists(metaPath))
      throw new NoSuchDatalakeFile(s"no such file: $url")
    val meta = Metadata.fromJson(
      new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8))
    (meta, Files.size(dataPath), Files.getLastModifiedTime(dataPath).toMillis)
  }

  /** Open the content stream (the fetch path, `fetcher.py:70-91`). */
  def open(url: String): InputStream = {
    val p = pathOf(url)
    if (!Files.exists(p)) throw new NoSuchDatalakeFile(s"no such file: $url")
    new BufferedInputStream(new FileInputStream(p.toFile))
  }

  /** Resolve any `<scheme>://` url to a local path — the store is
    * scheme-agnostic so ingest fixtures can carry s3-style urls. */
  private def pathOf(url: String): Path =
    Paths.get(url.replaceFirst("^[a-z0-9]+://", ""))
}
