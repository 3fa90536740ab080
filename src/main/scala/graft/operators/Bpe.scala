package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) tokenizer TRAINING — the
  * vocabulary-learning step of an LLM data pipeline (the battery's
  * `q_token_count` / `q_vocab_topk` cover counting with a FIXED
  * tokenizer; this learns the merges).
  *
  * Scale shape (what makes this 100 TB-ready):
  *   1. ONE corpus scan collapses the corpus to a word-frequency table
  *      (`explode(split(text)) → groupBy(word).count`) — the classic
  *      BPE trick: training is then corpus-size-INDEPENDENT, because
  *      every subsequent round runs over the (vocab-sized, ~1e5-row)
  *      word table, never the corpus again.
  *   2. Each merge round is: explode adjacent symbol pairs weighted by
  *      word count → hash aggregate (map-side partials) → argmax to
  *      the driver (one tiny row) → map-side fold applying the merge.
  *      The only exchange per round carries pair counts.
  *   3. The pair merge is a left-to-right `aggregate()` fold over the
  *      symbol array — a SQL higher-order function, no UDF — giving
  *      standard greedy BPE semantics ("aaaa" + (a,a) → [aa, aa]).
  *
  * Determinism: ties in pair counts break lexicographically on the
  * pair, so retraining reproduces the identical merge list. Words are
  * terminated with `</w>` (the word-boundary marker of the original
  * BPE-for-NMT formulation) so merges never cross word boundaries and
  * end-of-word units are learned separately.
  */
object Bpe {

  /** One learned merge: `left`+`right` become one symbol; `count` is
    * the pair's support when it was chosen. */
  final case class Merge(left: String, right: String, count: Long)

  /** Word-boundary marker symbol. Multi-char, so it cannot collide
    * with any single-character initial symbol. */
  val EndMark = "</w>"

  /** Word-frequency table with each word exploded to its initial
    * symbol sequence (characters + end marker). */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("symbols",
        concat(split(col("word"), ""), array(lit(EndMark))))
      .select(col("symbols"), col("n"))

  /** Adjacent-pair counts over the (word-frequency-weighted) symbol
    * table: the per-round aggregate. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("symbols")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(symbols) - 2), " +
          "i -> struct(element_at(symbols, i + 1) AS a, " +
          "element_at(symbols, i + 2) AS b))")).as("p"),
        col("n"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Left-to-right greedy fold applying merge (a, b) to the array held
    * in `arrayExpr`. */
  private def mergeFold(arrayExpr: String, a: String, b: String): String =
    s"""aggregate($arrayExpr, CAST(array() AS ARRAY<STRING>),
       |  (acc, s) -> IF(size(acc) > 0 AND element_at(acc, -1) = ${sqlLit(a)}
       |                   AND s = ${sqlLit(b)},
       |                 concat(slice(acc, 1, size(acc) - 1),
       |                        array(${sqlLit(a + b)})),
       |                 concat(acc, array(s))))""".stripMargin

  /** See [[Checkpoints.release]] — the shared release idiom. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    Checkpoints.release(df)

  /** Session conf key: word-vocabulary cap for the driver-local
    * training fast path of [[train]] (r17; the
    * [[Dedup.BroadcastVocabCapKey]] precedent). BPE training runs over
    * the word-FREQUENCY table, which is vocab-sized regardless of
    * corpus size — when it fits under the cap it is collected once
    * (`(word, n)` rows, ~tens of MB at the 1M default) and the greedy
    * merge loop runs on the driver: zero Spark jobs per round instead
    * of an aggregate + argmax-collect + re-pinned fold per round (the
    * per-round job dribble was most of q_bpe_merges' wall at bench
    * scale). Vocabularies past the cap fall back LOUDLY (one WARN) to
    * the distributed round loop, which handles unbounded vocab; `0`
    * disables the fast path outright (the crossover-test hook). Both
    * paths learn the IDENTICAL merge sequence: same greedy fold, same
    * (count desc, pair lexicographic) argmax with ties compared in
    * UTF-8 binary order exactly as Spark orders strings. */
  val LocalVocabCapKey = "spark.graft.bpe.localVocabCap"
  private val DefaultLocalVocabCap = 1000000L

  /** Learn up to `merges` BPE merges from the corpus. Stops early when
    * no pair reaches `minCount`. Returns merges in training order —
    * the tokenizer model. */
  def train(docs: DataFrame, textCol: String = "text",
      merges: Int = 50, minCount: Long = 2L): Seq[Merge] = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    // loud parse failure naming the key (ADVICE r17; the Dedup.longConf
    // idiom) — a bare NumberFormatException names only the value
    val cap = docs.sparkSession.conf.getOption(LocalVocabCapKey)
      .map { s =>
        try s.toLong
        catch { case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$LocalVocabCapKey must be a long, got '$s'", e)
        }
      }.getOrElse(DefaultLocalVocabCap)
    if (cap > 0) {
      // one aggregation pass, bounded collect (the charLmScore
      // boundedCollect shape: the limit rides the same pass). An
      // over-cap vocabulary pays this probe pass once and the
      // distributed fallback re-aggregates — deliberate (ADVICE r17):
      // pinning the aggregate BEFORE the probe would make the over-cap
      // path single-pass but would turn the common under-cap path's one
      // collect job into pin-materialize + collect-from-pin, taxing
      // every bench-scale training run to spare the rare fallback one
      // vocab-sized aggregate.
      val capInt = math.min(cap, (Int.MaxValue - 1).toLong).toInt
      val rows = docs
        .select(explode(split(lower(trim(col(textCol))),
          "[ \\t\\n\\x0B\\f\\r]+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("n"))
        .limit(capInt + 1).collect()
      if (rows.length <= capInt)
        return trainLocal(rows, merges, minCount)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BPE train: word vocabulary exceeds $LocalVocabCapKey=$cap — " +
          "falling back to the distributed merge loop (correct at any " +
          "vocab size; one aggregate + argmax round per merge)")
    }
    // the word table is vocab-sized: one materialization replaces a
    // corpus re-scan per round AND caps the per-round lineage; each
    // round's checkpoint releases its predecessor so a long training
    // run holds ONE copy of the word table, not one per merge
    var words = Checkpoints.pin(wordTable(docs, textCol))
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    try {
      while (!done && learned.size < merges) {
        val top = pairCounts(words)
          .filter(col("cnt") >= minCount)
          // deterministic argmax: count desc, then pair lexicographic
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top.head.getString(0), top.head.getString(1))
          learned += Merge(a, b, top.head.getLong(2))
          val next = Checkpoints.pin(words
            .withColumn("symbols", graft.functions.functions
              .bpeApply(col("symbols"), Seq((a, b))))
            .select(col("symbols"), col("n"))) // eager: drop the source now
          releaseCheckpoint(words)
          words = next
        }
      }
      learned.toSeq
    } finally releaseCheckpoint(words)
  }

  /** The driver-local merge loop over a collected `(word, n)` frequency
    * table — semantics bit-identical to the distributed rounds (and so
    * to the DuckDB oracle's unrolled CTE chain):
    *   - initial symbols = one symbol per CODEPOINT + [[EndMark]]
    *     (replicating Spark's `split(w, '')`, which keeps astral
    *     characters whole — [[graft.core.BpeCodec.encodeWords]]'s rule);
    *   - per round: adjacent-pair counts weighted by word frequency,
    *     argmax by (count desc, then pair lexicographic with strings
    *     compared in UTF-8 BINARY order via [[UTF8String]] — Scala's
    *     String ordering compares UTF-16 units and would diverge from
    *     Spark's `orderBy(a, b)` on astral-vs-BMP ties);
    *   - the greedy left-to-right fold of [[graft.core.BpeCodec]]
    *     applies the winning merge;
    *   - stop early when no pair reaches `minCount`.
    * CheckpointSeamSpec pins local-vs-distributed merge equality. */
  private def trainLocal(
      rows: Array[org.apache.spark.sql.Row],
      merges: Int,
      minCount: Long): Seq[Merge] = {
    import org.apache.spark.unsafe.types.UTF8String
    val words = new Array[Array[String]](rows.length)
    val freq = new Array[Long](rows.length)
    var wi = 0
    while (wi < rows.length) {
      val cps = rows(wi).getString(0).codePoints().toArray
      val syms = new Array[String](cps.length + 1)
      var ci = 0
      while (ci < cps.length) {
        syms(ci) = new String(cps, ci, 1)
        ci += 1
      }
      syms(cps.length) = EndMark
      words(wi) = syms
      freq(wi) = rows(wi).getLong(1)
      wi += 1
    }
    def utf8Lt(x: (String, String), y: (String, String)): Boolean = {
      val c = UTF8String.fromString(x._1).compareTo(UTF8String.fromString(y._1))
      c < 0 || (c == 0 &&
        UTF8String.fromString(x._2).compareTo(UTF8String.fromString(y._2)) < 0)
    }
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && learned.size < merges) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      var i = 0
      while (i < words.length) {
        val syms = words(i)
        val n = freq(i)
        var j = 0
        while (j < syms.length - 1) {
          val key = (syms(j), syms(j + 1))
          val prev = counts.get(key)
          counts.put(key, if (prev == null) n else prev + n)
          j += 1
        }
        i += 1
      }
      var best: (String, String) = null
      var bestCnt = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cnt = e.getValue
        if (cnt >= minCount &&
          (best == null || cnt > bestCnt ||
            (cnt == bestCnt && utf8Lt(e.getKey, best)))) {
          best = e.getKey
          bestCnt = cnt
        }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        learned += Merge(a, b, bestCnt)
        val ab = a + b
        var k = 0
        while (k < words.length) {
          val syms = words(k)
          // greedy left-to-right fold (the BpeCodec.applyMerges loop)
          var touches = false
          var j = 0
          while (!touches && j < syms.length - 1) {
            touches = syms(j) == a && syms(j + 1) == b
            j += 1
          }
          if (touches) {
            val out = new java.util.ArrayList[String](syms.length)
            var p = 0
            while (p < syms.length) {
              val s = syms(p)
              if (out.size > 0 && out.get(out.size - 1) == a && s == b)
                out.set(out.size - 1, ab)
              else out.add(s)
              p += 1
            }
            words(k) = out.toArray(new Array[String](out.size))
          }
          k += 1
        }
      }
    }
    learned.toSeq
  }

  /** Tokenize `textCol` with a trained merge list: per word, apply the
    * merges IN TRAINING ORDER (the standard BPE encoder) and emit the
    * flattened token sequence as a `tokens` array column. Map-only —
    * no shuffle; the merge model rides into the task as one broadcast
    * reference object inside the native `bpe_encode` expression
    * ([[graft.core.BpeCodec]]).
    *
    * The earlier spelling nested one interpreted `aggregate()` fold
    * per merge — the measured top battery cost at 64× (212 s,
    * PROFILE.md). The native expression is value-identical (BpeSpec
    * asserts parity against the fold spelling; the DuckDB oracle is
    * unchanged) and scales to production merge counts: O(merges ×
    * symbols) string comparisons, not fold-chain re-entry. */
  def encode(docs: DataFrame, model: Seq[Merge], textCol: String = "text")
      : DataFrame =
    docs
      .withColumn("__words",
        expr(s"filter(split(lower(trim($textCol)), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), " +
          "w -> length(w) > 0)"))
      .withColumn("tokens", graft.functions.functions.bpeEncode(
        col("__words"), model.map(m => (m.left, m.right))))
      .drop("__words")

  /** The pre-native reference spelling of one merge fold — kept for
    * BpeSpec's parity check (the independent reference the DuckDB
    * oracle also mirrors). */
  private[operators] def mergeFoldReference(
      arrayExpr: String, a: String, b: String): String =
    mergeFold(arrayExpr, a, b)

  private[operators] def initialSymbolsReference: String =
    s"concat(split(w, ''), array(${sqlLit(EndMark)}))"
}
