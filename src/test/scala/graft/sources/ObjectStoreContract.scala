package graft.sources

import graft.core.{Metadata, NoSuchDatalakeFile}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Behavior contract every [[ObjectStore]] adapter must satisfy — run
  * against [[LocalContentStore]] here; a real S3 adapter extends this
  * with its own `newStore()` (against moto/localstack or a test bucket)
  * and must pass unchanged. Pins the reference semantics: `{id}/data`
  * key layout, blake2b content hash inference, multipart atomicity,
  * verbatim validated-metadata puts, and streaming reads.
  */
abstract class ObjectStoreContract extends AnyFunSuite {

  /** A fresh, empty store per test. */
  def newStore(): ObjectStore

  private def srcFile(content: String): java.nio.file.Path = {
    val p = Files.createTempFile("osc", ".log")
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p
  }

  private def fields(what: String): Map[String, Any] = Map(
    "what" -> what, "where" -> "testhost", "work_id" -> null,
    "start" -> Long.box(1430092800000L))

  test("push infers blake2b hash and lands content at urlFor(id)") {
    val store = newStore()
    val (url, meta) = store.push(srcFile("hello object store\n"), fields("a"))
    assert(url === store.urlFor(meta.id))
    assert(meta.hash === graft.core.Blake2b.hexDigest(
      "hello object store\n".getBytes(StandardCharsets.UTF_8)))
    val got = new String(store.open(url).readAllBytes(), StandardCharsets.UTF_8)
    assert(got === "hello object store\n")
  }

  test("fetch returns the pushed metadata, size, and a create_time") {
    val store = newStore()
    val (url, meta) = store.push(srcFile("x" * 100), fields("b"))
    val (fetched, size, createTime) = store.fetch(url)
    assert(fetched.id === meta.id)
    assert(fetched.what === "b")
    assert(size === 100L)
    assert(createTime > 0L)
  }

  test("fetch of an unknown url raises NoSuchDatalakeFile") {
    val store = newStore()
    intercept[NoSuchDatalakeFile](store.fetch(store.urlFor("0" * 32)))
  }

  test("multipart path produces bytes identical to single-part") {
    val store = newStore()
    val content = ("0123456789" * 1000) + "tail"
    // chunkSize far below content size forces >1 part
    val (url, meta) = store.push(srcFile(content), fields("mp"),
      chunkSize = 1024)
    val got = new String(store.open(url).readAllBytes(), StandardCharsets.UTF_8)
    assert(got === content)
    assert(meta.hash === graft.core.Blake2b.hexDigest(
      content.getBytes(StandardCharsets.UTF_8)))
  }

  test("pushValidated stores metadata verbatim (no re-normalization)") {
    val store = newStore()
    // pre-1973 epoch-ms start: a re-run of the s/ms heuristic would
    // rescale it; verbatim storage must not
    val meta = Metadata(0, 86400000L, None, "testhost", "old", None,
      "/var/log/old.log", "ab" * 16, "00" * 16)
    val url = store.pushValidated(
      "vintage\n".getBytes(StandardCharsets.UTF_8), meta)
    val (fetched, _, _) = store.fetch(url)
    assert(fetched.start === 86400000L)
    assert(new String(store.open(url).readAllBytes(),
      StandardCharsets.UTF_8) === "vintage\n")
  }

  test("openStreaming reads the full content incrementally") {
    val store = newStore()
    val content = "streaming-" * 500
    val (url, _) = store.push(srcFile(content), fields("st"))
    val sf = store.openStreaming(url, chunkSize = 64)
    try {
      // bounded reads return at most the requested size and, chained,
      // reassemble the object exactly
      val pieces = Iterator.continually(sf.read(64))
        .takeWhile(_.nonEmpty).toSeq
      assert(pieces.forall(_.length <= 64))
      assert(new String(pieces.flatten.toArray, StandardCharsets.UTF_8)
        === content)
    } finally sf.close()
  }
}

/** The contract run against the local filesystem adapter. */
class LocalObjectStoreSpec extends ObjectStoreContract {
  def newStore(): ObjectStore =
    new LocalContentStore(Files.createTempDirectory("osc-store").toString)
}
