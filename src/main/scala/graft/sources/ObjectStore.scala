package graft.sources

import graft.core.Metadata
import java.io.InputStream
import java.nio.file.Path

/** SDK adapter seam for the content/object store — the surface a real
  * S3 adapter implements with the AWS SDK (PutObject / multipart upload
  * via TransferConfig, GetObject, HeadObject — `archive.py:212-257,
  * 438-442`), and [[LocalContentStore]] implements over the filesystem.
  *
  * Everything above this trait (ingester, API server, CLI, uploader) is
  * transport-agnostic; [[graft.streaming.ContentStore]] is the narrow
  * ingest-side view (`fetch` only) that ships into Spark tasks. The
  * behavioral contract — key layout `{id}/data`, metadata sidecar,
  * content hashing, multipart atomicity, streaming reads — is pinned by
  * `ObjectStoreContract` in the test tree, which any new adapter should
  * extend and pass unchanged (the moto pattern: one behavior suite, many
  * transports).
  */
trait ObjectStore extends graft.streaming.ContentStore {

  /** Base url clients push to (the `/v0/archive/` status document,
    * `v0.py:110-133` `DATALAKE_STORAGE_URL`). */
  def storageUrl: String

  /** Content url for an id — key layout `{id}/data` (`archive.py:438`). */
  def urlFor(id: String): String

  /** Hash + validate + upload + write metadata; returns (url, metadata).
    * Content at or above `chunkSize` must go through the transport's
    * multipart protocol and commit atomically — a reader never observes
    * a partial object. */
  def push(sourcePath: Path, fields: Map[String, Any],
      chunkSize: Int = LocalContentStore.DefaultChunkSize): (String, Metadata)

  /** Store content under ALREADY-validated metadata verbatim — no
    * re-normalization (the uploader path; re-running the s/ms heuristic
    * on epoch-ms values would corrupt pre-1973 timestamps). */
  def pushValidated(content: Array[Byte], meta: Metadata): String

  /** Open the content stream (the fetch path, `fetcher.py:70-91`). */
  def open(url: String): InputStream

  /** Open as a chunk-buffered [[StreamingFile]] — large objects are read
    * incrementally, never materialized whole (`archive.py:365-377`). */
  def openStreaming(url: String,
      chunkSize: Int = StreamingFile.IterSize): StreamingFile
}
