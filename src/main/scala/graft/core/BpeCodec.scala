package graft.core

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge-application inner loop behind the native
  * `bpe_encode` / `bpe_apply` expressions ([[graft.operators.Bpe]]).
  *
  * Semantics are EXACTLY the SQL fold they replace (and the DuckDB
  * oracle mirrors): for each merge (a, b) in training order, one
  * left-to-right pass over the symbol list replacing [.., a][b] with
  * [.., ab] — greedy, so "aaaa" under (a,a) becomes [aa, aa], and a
  * just-formed ab can immediately left-match a following merge in the
  * SAME pass only if the merge list says so later (identical to the
  * `aggregate()` fold's element_at(acc, -1) check).
  *
  * The SQL spelling nested one interpreted `aggregate()` fold per
  * merge, each step allocating concat(slice(acc, …), array(…)) — the
  * measured top cost of the battery at every scale. This is plain
  * array walking: O(merges × symbols) comparisons, no per-step
  * allocation beyond the output buffer.
  */
object BpeCodec {

  /** Driver-built, task-serialized merge table (parallel arrays for the
    * tight loop). */
  final class Model(
      val a: Array[String], val b: Array[String], val ab: Array[String])
    extends Serializable

  def model(merges: Seq[(String, String)]): Model =
    new Model(
      merges.map(_._1).toArray,
      merges.map(_._2).toArray,
      merges.map(m => m._1 + m._2).toArray)

  /** One in-order pass per merge over a symbol buffer. */
  private def applyMerges(
      syms: java.util.ArrayList[String], m: Model)
      : java.util.ArrayList[String] = {
    var cur = syms
    var mi = 0
    while (mi < m.a.length) {
      val out = new java.util.ArrayList[String](cur.size)
      var i = 0
      while (i < cur.size) {
        val s = cur.get(i)
        if (out.size > 0 && out.get(out.size - 1) == m.a(mi) && s == m.b(mi))
          out.set(out.size - 1, m.ab(mi))
        else out.add(s)
        i += 1
      }
      cur = out
      mi += 1
    }
    cur
  }

  /** `bpe_apply`: merge-fold an existing symbol array (the training
    * loop's per-round step). */
  def applySymbols(symbols: ArrayData, m: Model): ArrayData = {
    val n = symbols.numElements()
    val syms = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      syms.add(symbols.getUTF8String(i).toString)
      i += 1
    }
    toArrayData(applyMerges(syms, m))
  }

  /** `bpe_encode`: tokenize a WORD ARRAY — each word becomes its
    * initial symbols + the end marker, merges fold over each word
    * independently, and the per-word token lists concatenate in order
    * (the `flatten(transform(words, …))` of the SQL spelling).
    *
    * Initial symbols replicate Spark's `split(w, '')` EXACTLY: one
    * symbol per CODEPOINT (Spark splits UTF8Strings codepoint-wise, so
    * astral characters stay whole — Java's String.split("") would
    * instead cut between surrogate halves; BpeSpec's emoji case pins
    * this down). */
  def encodeWords(words: ArrayData, m: Model, endMark: String): ArrayData = {
    val out = new java.util.ArrayList[String]()
    val nw = words.numElements()
    var wi = 0
    while (wi < nw) {
      val cps = words.getUTF8String(wi).toString.codePoints().toArray
      val syms = new java.util.ArrayList[String](cps.length + 1)
      var ci = 0
      while (ci < cps.length) {
        syms.add(new String(cps, ci, 1))
        ci += 1
      }
      syms.add(endMark)
      out.addAll(applyMerges(syms, m))
      wi += 1
    }
    toArrayData(out)
  }

  private def toArrayData(l: java.util.ArrayList[String]): ArrayData = {
    val out = new Array[Any](l.size)
    var i = 0
    while (i < l.size) {
      out(i) = UTF8String.fromString(l.get(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
