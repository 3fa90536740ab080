package graft.sources

import java.io.InputStream

/** Chunk-iterator file reader — the Scala counterpart of the reference's
  * StreamingFile (`client/datalake/dlfile.py:38-135`): the file is never
  * materialized whole; `read(size)` buffers across chunk boundaries and
  * `readLines` re-assembles lines split by chunking. Backs the fetch path
  * for large objects (the reference's `fetch(url, stream=True)`).
  *
  * `read`/`read(size)`/`readLines` all consume ONE shared buffer (as the
  * reference does), so they interleave correctly: bytes over-fetched by a
  * `read(size)` are what the next `readLines` line starts with, and bytes
  * past the last consumed line are what the next `read` returns. `close()`
  * releases the underlying stream via `onClose` — dropping an
  * early-abandoned multi-GB relay's descriptor, not just the buffer.
  */
final class StreamingFile(
    chunks: Iterator[Array[Byte]],
    onClose: () => Unit = () => ()) {

  private var buffer = Array.emptyByteArray
  private var closed = false

  private def ensureOpen(): Unit =
    if (closed) throw new IllegalStateException(
      "I/O operation on closed stream")

  /** Read the entire remaining content; a second call returns empty
    * (`dlfile.py:76-95`). Linear: chunks accumulate in one output stream
    * (array-concat per chunk re-copies the whole prefix — quadratic). */
  def read(): Array[Byte] = {
    ensureOpen()
    val bos = new java.io.ByteArrayOutputStream(buffer.length max 64)
    bos.write(buffer)
    buffer = Array.emptyByteArray
    while (chunks.hasNext) bos.write(chunks.next())
    bos.toByteArray
  }

  /** Read exactly `size` bytes (fewer at end of stream), buffering the
    * remainder of any over-fetched chunk for the next call. */
  def read(size: Int): Array[Byte] = {
    ensureOpen()
    if (buffer.length < size && chunks.hasNext) {
      val bos = new java.io.ByteArrayOutputStream(size max buffer.length)
      bos.write(buffer)
      while (bos.size < size && chunks.hasNext) bos.write(chunks.next())
      buffer = bos.toByteArray
    }
    if (buffer.length <= size) {
      val out = buffer
      buffer = Array.emptyByteArray
      out
    } else {
      val (out, rest) = buffer.splitAt(size)
      buffer = rest
      out
    }
  }

  /** Iterate lines (terminators kept, like Python `splitlines(True)` for
    * `\n`-terminated data): a line split across chunks is re-assembled,
    * and a final unterminated line is still yielded (`dlfile.py:97-120`).
    * Consumes the shared buffer, so it composes with `read(size)`. */
  def readLines: Iterator[Array[Byte]] = new Iterator[Array[Byte]] {

    /** Index of the first '\n' at or past `from`, or -1. */
    private def findNl(from: Int): Int = {
      var i = from max 0
      while (i < buffer.length) {
        if (buffer(i) == '\n') return i
        i += 1
      }
      -1
    }

    /** Pull chunks until the buffer holds a newline or the source is
      * exhausted; each freshly appended region is scanned once, so the
      * cost per line is linear in its length. */
    private def endOfLine(): Int = {
      ensureOpen()
      var e = findNl(0)
      while (e < 0 && chunks.hasNext) {
        val from = buffer.length
        buffer = buffer ++ chunks.next()
        e = findNl(from)
      }
      e
    }

    def hasNext: Boolean = { endOfLine(); buffer.nonEmpty }

    def next(): Array[Byte] = {
      val e = endOfLine()
      if (buffer.isEmpty) throw new NoSuchElementException("end of stream")
      val cut = if (e < 0) buffer.length else e + 1
      val line = java.util.Arrays.copyOfRange(buffer, 0, cut)
      buffer = java.util.Arrays.copyOfRange(buffer, cut, buffer.length)
      line
    }
  }

  def close(): Unit = {
    if (!closed) {
      closed = true
      buffer = Array.emptyByteArray
      onClose()
    }
  }
}

object StreamingFile {

  /** Default chunk size for HTTP-ish relays (`dlfile.py:30`: 8 KiB). */
  val IterSize: Int = 8 * 1024

  /** Wrap a raw InputStream as a chunk iterator. The stream closes at
    * exhaustion AND on `close()` — an early-abandoned reader must not
    * leak the descriptor/connection. */
  def fromInputStream(in: InputStream, chunkSize: Int = IterSize): StreamingFile =
    new StreamingFile(new Iterator[Array[Byte]] {
      private var nextChunk: Array[Byte] = null
      private var done = false
      private def advance(): Unit = if (nextChunk == null && !done) {
        val buf = new Array[Byte](chunkSize)
        var off = 0
        var n = 0
        while (off < chunkSize && n >= 0) {
          n = in.read(buf, off, chunkSize - off)
          if (n > 0) off += n
        }
        if (off > 0) nextChunk = java.util.Arrays.copyOf(buf, off)
        if (n < 0) { done = true; in.close() }
      }
      def hasNext: Boolean = { advance(); nextChunk != null }
      def next(): Array[Byte] = {
        advance()
        val c = nextChunk; nextChunk = null; c
      }
    }, onClose = () => in.close())
}
