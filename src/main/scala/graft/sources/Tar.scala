package graft.sources

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** Minimal POSIX ustar reader/writer — just enough for datalake bundle
  * interop (`client/datalake/dlfile.py:305-327`: an uncompressed tar of
  * three small, plainly-named members). The JDK ships zip but not tar;
  * rather than pull a dependency for ~100 lines of fixed-offset header
  * arithmetic, this implements the subset the bundle format exercises:
  *
  *  - writer: regular files, mode 0644, uid/gid 0, mtime 0 — matching
  *    python `tarfile.TarInfo(name)` defaults so reference and graft
  *    bundles are byte-comparable;
  *  - reader: regular files by name; pax extended headers (typeflag
  *    'x'/'g' — what python >= 3.8 emits by default) and GNU long-name
  *    ('L') entries are skipped, so tars from any common producer parse.
  */
object Tar {

  private val BlockSize = 512

  private def octal(value: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL-terminated (the historical tar encoding)
    val s = s"%0${width - 1}o".format(value)
    (s + "\u0000").getBytes(StandardCharsets.US_ASCII)
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100, s"tar member name too long: $name")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, nameBytes)                     // name
    put(100, octal(0x1a4, 8))             // mode 0644
    put(108, octal(0, 8))                 // uid
    put(116, octal(0, 8))                 // gid
    put(124, octal(size, 12))             // size
    put(136, octal(0, 12))                // mtime (TarInfo default)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                          // typeflag: regular file
    put(257, Array[Byte](0x75, 0x73, 0x74, 0x61, 0x72, 0x00, 0x30, 0x30)) // "ustar\0" + version "00"
    val sum = h.map(_ & 0xff).sum
    put(148, s"%06o".format(sum).getBytes(StandardCharsets.US_ASCII))
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Write `entries` as an uncompressed ustar stream (member order is
    * preserved; the bundle format writes content, version, metadata —
    * `dlfile.py:311-317`). */
  def write(out: OutputStream, entries: Seq[(String, Array[Byte])]): Unit = {
    entries.foreach { case (name, data) =>
      out.write(header(name, data.length.toLong))
      out.write(data)
      val pad = (BlockSize - data.length % BlockSize) % BlockSize
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
  }

  private def readBlock(in: InputStream): Option[Array[Byte]] = {
    val block = in.readNBytes(BlockSize)
    if (block.length < BlockSize) None else Some(block)
  }

  private def parseOctal(block: Array[Byte], off: Int, len: Int): Long = {
    val s = new String(block, off, len, StandardCharsets.US_ASCII)
      .dropWhile(_ == ' ').takeWhile(c => c != '\u0000' && c != ' ')
    if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
  }

  /** Verify the ustar header checksum: the byte sum of the block with the
    * chksum field read as spaces. Garbage (a non-tar file mis-sniffed as
    * tar, or a corrupted header) virtually never passes, so the reader
    * rejects it with a clear PERMANENT error before trusting the size
    * field — an unvalidated size from random bytes can demand a ~2 GB
    * allocation (OutOfMemoryError, which no Exception guard catches). */
  private def verifyChecksum(h: Array[Byte]): Unit = {
    val stored = parseOctal(h, 148, 8)
    // python tarfile accepts either the unsigned or the (historical)
    // signed byte sum on read; do the same
    var unsigned = 0L
    var signed = 0L
    var i = 0
    while (i < BlockSize) {
      val b = if (i >= 148 && i < 156) ' '.toByte else h(i)
      unsigned += (b & 0xff).toLong
      signed += b.toLong
      i += 1
    }
    if (stored != unsigned && stored != signed)
      throw new IllegalArgumentException(
        s"bad tar header checksum ($stored != $unsigned): not a tar file?")
  }

  /** Read all regular-file members as name -> bytes.
    *
    * Error contract (the Uploader's retry classification depends on it):
    * a stream that ENDS without the two-zero-block end-of-archive marker
    * throws [[java.io.EOFException]] — the signature of a file still
    * being copied in, which a caller should RETRY — while a header that
    * fails validation (checksum, octal fields, size bounds) throws
    * [[IllegalArgumentException]] — permanently not a tar. */
  def read(in: InputStream): Map[String, Array[Byte]] = {
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
    var done = false
    while (!done) {
      readBlock(in) match {
        case None => throw new java.io.EOFException(
          "truncated tar: stream ended without the end-of-archive marker")
        case Some(h) if h.forall(_ == 0) => done = true
        case Some(h) =>
          verifyChecksum(h)
          // the name FIELD is bytes [0, 100) — ustar permits a full
          // unterminated 100-byte name, and takeWhile over the whole
          // block would run past it into the mode digits
          val name = new String(
            h.take(100).takeWhile(_ != 0), StandardCharsets.UTF_8)
          val size = parseOctal(h, 124, 12)
          if (size < 0 || size > Int.MaxValue)
            throw new IllegalArgumentException(
              s"tar member $name has unsupported size $size")
          val data = in.readNBytes(size.toInt)
          if (data.length < size) throw new java.io.EOFException(
            s"truncated tar member $name: ${data.length} of $size bytes")
          val pad = (BlockSize - size % BlockSize) % BlockSize
          if (pad > 0) in.readNBytes(pad.toInt)
          val typeflag = h(156)
          // keep regular files; skip pax ('x'/'g'), GNU longname ('L'),
          // directories and links — the bundle format never uses them
          if (typeflag == '0' || typeflag == 0) entries(name) = data
      }
    }
    entries.toMap
  }
}
