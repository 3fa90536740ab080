package graft.core

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization over Spark's native string representation.
  *
  * Mixed-provenance corpora (web crawl + OCR + user uploads) spell the
  * same text with different codepoint sequences — `é` as U+00E9 or as
  * `e` + U+0301 — which silently defeats exact dedup, n-gram hashing and
  * tokenizer vocab lookups. Canonical composition (NFC) before hashing /
  * tokenization makes byte equality mean text equality.
  *
  * Hot-path discipline: the overwhelming majority of crawl text is pure
  * ASCII, which is NFC by construction — detected with one byte scan on
  * the UTF-8 buffer (no decode, no allocation, returns the input
  * object). Non-ASCII strings that are already composed (the common
  * case for NFC-producing sources) pass `Normalizer.isNormalized`'s
  * quick-check and also return the input unchanged; only genuinely
  * decomposed strings pay for `Normalizer.normalize`.
  */
object TextNorm {

  /** NFC-normalize; returns the input object unchanged when the string
    * is already normalized (ASCII fast path never decodes). */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Every adjacent CODEPOINT pair of `s`, in order — the bigram
    * extraction of the char-LM quality scorer, with exactly
    * `substring(s, i, 2)`'s codepoint semantics (so results are
    * byte-identical to the builtin-HOF spelling and to DuckDB's
    * `substring`). One pass over the decoded codepoints; strings
    * shorter than 2 codepoints yield an empty array. */
  def charBigrams(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < 2)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        out(i) = UTF8String.fromString(new String(cps, i, 2))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS scheme) of
    * an ALREADY-normalized string — sorted distinct `array<bigint>`,
    * value-identical to the interpreted-HOF spelling it replaces
    * (`array_sort(array_distinct(flatten(transform(... array_min(
    * slice(grams, j, w))))))` with
    * `gram(i) = conv(substring(md5(substring(t, i, k)), 1, 15), 16, 10)`),
    * so oracle hashes are unchanged. Normalization deliberately stays
    * OUTSIDE (callers keep the builtin `regexp_replace(lower(trim(…)))`
    * chain) so this function never has to replicate Spark's
    * collation-aware lower/trim semantics.
    *
    *   gram(i)  = first 60 bits of md5 of the k-codepoint substring at i
    *              (= the 8-byte big-endian digest prefix >>> 4 — exactly
    *              the 15-hex-char parse)
    *   output   = { min(grams[j..j+w)) : every w-window }, dedup, sort
    *
    * The window mins run over a monotonic index deque — O(grams) total
    * instead of O(grams × w) slice-mins, and with none of the
    * interpreted-lambda re-entry that made the HOF spelling the most
    * expensive battery query. Strings shorter than k + w − 1 codepoints
    * yield an empty array (the HOF guard). */
  def winnowFingerprints(s: UTF8String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val numGrams = n - k + 1
    val grams = new Array[Long](numGrams)
    val md = md5Local.get()
    var i = 0
    while (i < numGrams) {
      md.reset()
      val digest = md.digest(new String(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      grams(i) = java.nio.ByteBuffer.wrap(digest, 0, 8).getLong >>> 4
      i += 1
    }
    val numWin = numGrams - w + 1
    val mins = new Array[Long](numWin)
    val deque = new Array[Int](numGrams)
    var head = 0
    var tail = 0
    var j = 0
    while (j < numGrams) {
      while (tail > head && grams(deque(tail - 1)) >= grams(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) mins(j - w + 1) = grams(deque(head))
      j += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 0
    var m = 0
    while (m < numWin) {
      if (m == 0 || mins(m) != mins(m - 1)) {
        mins(distinct) = mins(m)
        distinct += 1
      }
      m += 1
    }
    val out = new Array[Any](distinct)
    var o = 0
    while (o < distinct) { out(o) = mins(o); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
