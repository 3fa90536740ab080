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
}
