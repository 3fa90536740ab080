package graft.sources

import java.io.InputStream

/** Chunk-iterator file reader — the Scala counterpart of the reference's
  * StreamingFile (`client/datalake/dlfile.py:38-135`): the file is never
  * materialized whole; `read(size)` buffers across chunk boundaries and
  * `readLines` re-assembles lines split by chunking. Backs the fetch path
  * for large objects (the reference's `fetch(url, stream=True)`).
  */
final class StreamingFile(chunks: Iterator[Array[Byte]]) {

  private var buffer = Array.emptyByteArray
  private var closed = false

  private def ensureOpen(): Unit =
    if (closed) throw new IllegalStateException(
      "I/O operation on closed stream")

  /** Read the entire remaining content; a second call returns empty
    * (`dlfile.py:76-95`). */
  def read(): Array[Byte] = {
    ensureOpen()
    while (chunks.hasNext) buffer = buffer ++ chunks.next()
    val out = buffer
    buffer = Array.emptyByteArray
    out
  }

  /** Read exactly `size` bytes (fewer at end of stream), buffering the
    * remainder of any over-fetched chunk for the next call. */
  def read(size: Int): Array[Byte] = {
    ensureOpen()
    while (buffer.length < size && chunks.hasNext)
      buffer = buffer ++ chunks.next()
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
    * and a final unterminated line is still yielded (`dlfile.py:97-120`). */
  def readLines: Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var pending = Array.emptyByteArray
    private val out = scala.collection.mutable.Queue.empty[Array[Byte]]
    private var exhausted = false

    private def refill(): Unit = {
      while (out.isEmpty && !exhausted) {
        ensureOpen()
        if (chunks.hasNext) {
          val data = pending ++ chunks.next()
          var start = 0
          var i = 0
          while (i < data.length) {
            if (data(i) == '\n') {
              out.enqueue(data.slice(start, i + 1))
              start = i + 1
            }
            i += 1
          }
          pending = data.drop(start)
        } else {
          exhausted = true
          if (pending.nonEmpty) {
            out.enqueue(pending)
            pending = Array.emptyByteArray
          }
        }
      }
    }

    def hasNext: Boolean = { refill(); out.nonEmpty }
    def next(): Array[Byte] = { refill(); out.dequeue() }
  }

  def close(): Unit = {
    closed = true
    buffer = Array.emptyByteArray
  }
}

object StreamingFile {

  /** Default chunk size for HTTP-ish relays (`dlfile.py:30`: 8 KiB). */
  val IterSize: Int = 8 * 1024

  /** Wrap a raw InputStream as a chunk iterator (closes the stream at
    * exhaustion). */
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
    })
}
