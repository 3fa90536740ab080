package graft.core

import java.io.InputStream

/** Pure-Scala BLAKE2b (RFC 7693), unkeyed, variable digest size.
  *
  * The reference hashes file content with blake2b digest_size=16 over a
  * 64 KiB buffer (`client/datalake/dlfile.py:221-235`); this implements the
  * same public algorithm on the JVM (no Spark jar ships blake2b).
  */
final class Blake2b(digestSize: Int) {
  require(digestSize >= 1 && digestSize <= 64, "digest size in [1,64]")

  import Blake2b._

  private val h = new Array[Long](8)
  private val buf = new Array[Byte](BlockBytes)
  private var bufLen = 0
  private var t0, t1 = 0L
  private var finished = false

  // init: IV xor parameter block (digest length, fanout=1, depth=1)
  System.arraycopy(IV, 0, h, 0, 8)
  h(0) ^= 0x01010000L ^ digestSize.toLong

  def update(data: Array[Byte]): Unit = update(data, 0, data.length)

  def update(data: Array[Byte], off: Int, len: Int): Unit = {
    require(!finished, "already finalized")
    var o = off
    var remaining = len
    while (remaining > 0) {
      if (bufLen == BlockBytes) {
        incrementCounter(BlockBytes)
        compress(buf, 0, last = false)
        bufLen = 0
      }
      val take = math.min(BlockBytes - bufLen, remaining)
      System.arraycopy(data, o, buf, bufLen, take)
      bufLen += take
      o += take
      remaining -= take
    }
  }

  def digest(): Array[Byte] = {
    require(!finished, "already finalized")
    finished = true
    incrementCounter(bufLen)
    java.util.Arrays.fill(buf, bufLen, BlockBytes, 0.toByte)
    compress(buf, 0, last = true)
    val out = new Array[Byte](digestSize)
    var i = 0
    while (i < digestSize) {
      out(i) = ((h(i >> 3) >>> (8 * (i & 7))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def incrementCounter(n: Int): Unit = {
    t0 += n
    if (java.lang.Long.compareUnsigned(t0, n.toLong) < 0) t1 += 1
  }

  private def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) {
        w = (w << 8) | (block(off + i * 8 + j) & 0xffL)
        j -= 1
      }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t0
    v(13) ^= t1
    if (last) v(14) = ~v(14)

    @inline def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
    }

    var r = 0
    while (r < 12) {
      val s = Sigma(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }
}

object Blake2b {

  private val BlockBytes = 128

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  /** Hex digest of a byte array with the reference's default 16-byte size. */
  def hexDigest(data: Array[Byte], digestSize: Int = 16): String = {
    val b = new Blake2b(digestSize)
    b.update(data)
    toHex(b.digest())
  }

  /** Streaming hash with the reference's 64 KiB buffer
    * (dlfile.py:221-229, "~2 s per GB"). */
  def hexDigestStream(in: InputStream, digestSize: Int = 16): String = {
    val b = new Blake2b(digestSize)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) b.update(buf, 0, n)
      n = in.read(buf)
    }
    toHex(b.digest())
  }

  def toHex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString
}
