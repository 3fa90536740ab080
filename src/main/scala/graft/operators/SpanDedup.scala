package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level (span) deduplication across documents: find every
  * run of `w` consecutive tokens that occurs verbatim in more than one
  * document, merge the hits into maximal per-document spans, and
  * optionally excise them ("Deduplicating Training Data Makes Language
  * Models Better", Lee et al. 2022 — the ExactSubstr variant, re-expressed
  * as relational passes instead of a suffix array).
  *
  * The reference archive has no text dedup at all (its only dedup is
  * response-level id dedup, `api/datalake_api/querier.py:153-163`); this
  * is part of the LLM-training-pipeline surface the brief adds on top.
  * It complements the document-level near-dup family in [[Dedup]]:
  * MinHash/SimHash ask "are these two DOCUMENTS near-identical", this
  * asks "which REGIONS are copied anywhere else", which is what catches
  * boilerplate, license headers, and quoted passages inside otherwise
  * unique documents.
  *
  * Scale shape (the suffix-array approach is a single-machine algorithm;
  * this is the distributed one):
  *   - gram table: one map-side pass, N·L rows of (doc_id, pos, md5) —
  *     the only corpus-sized intermediate, carrying a fixed 32-char key
  *     instead of gram text;
  *   - duplicated-gram set: one hash aggregate on the key. Cross-doc
  *     duplication is decided by `min(doc_id) <> max(doc_id)` — partially
  *     aggregable, so the exchange after map-side combine carries one row
  *     per distinct gram, never a count-distinct sketch or a re-shuffle;
  *   - hit join: gram table ⋈ dup set on the key — AQE broadcasts the dup
  *     side when small (the common case: dup grams ≪ grams);
  *   - span merge: a per-document window (gaps-and-islands over positions)
  *     — state bounded by document length, no global sort.
  * md5 (128-bit) keys make hash collisions irrelevant at any corpus size
  * and match DuckDB's md5 byte-for-byte, which is what makes the whole
  * operator oracle-checkable.
  */
object SpanDedup {

  /** (doc_id, pos, k): the md5 of the w-token gram starting at 0-based
    * token position `pos`. Documents shorter than `w` tokens contribute
    * nothing (guarded — Spark's `sequence(0, n-w)` would count DOWN for
    * n < w, not return empty). Shared with [[graft.store.GramIndex]],
    * whose stored keys must be byte-identical to the batch-local ones. */
  private[graft] def grams(docs: DataFrame, w: Int,
      textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+").as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(__toks) - $w),
           |  i -> md5(array_join(slice(__toks, i + 1, $w), ' ')))"""
          .stripMargin)).as(Seq("pos", "k")))

  /** Grams that occur in at least two distinct documents. */
  private def dupKeys(g: DataFrame): DataFrame =
    g.groupBy("k")
      .agg(min("doc_id").as("__mn"), max("doc_id").as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select("k")

  /** Positions whose w-gram is duplicated cross-document. */
  private def hitPositions(docs: DataFrame, w: Int,
      textCol: String, idCol: String): DataFrame = {
    val g = grams(docs, w, textCol, idCol)
    g.join(dupKeys(g), Seq("k")).select("doc_id", "pos")
  }

  /** Maximal duplicated spans per document: (doc_id, span_start,
    * span_end, span_tokens), positions 0-based, `span_end` exclusive.
    * Overlapping or touching hit windows merge into one span, so the
    * output is the minimal set of disjoint intervals covering every
    * duplicated w-gram. */
  def dupSpans(docs: DataFrame, w: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    mergeSpans(hitPositions(docs, w, textCol, idCol), w)

  /** Gaps-and-islands merge of flagged positions into maximal spans:
    * `hits` is (doc_id, pos); overlapping or touching [pos, pos+w)
    * windows collapse into one (doc_id, span_start, span_end,
    * span_tokens) row. Per-document window — state bounded by document
    * length, no global sort. Shared with [[graft.store.GramIndex]] so
    * batch-local and history-backed span dedup can never disagree on
    * the merge semantics. */
  private[graft] def mergeSpans(hits: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + w)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__b",
        when(col("pos") > coalesce(prevEnd, lit(-1L)), 1).otherwise(0))
      .withColumn("__g", sum("__b").over(byDoc))
      .groupBy("doc_id", "__g")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + w).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Kept (non-duplicated) tokens per document after excising every
    * duplicated span: (doc_id, pos, tok) for each surviving position.
    * Policy: ALL occurrences of a duplicated region are removed, in every
    * document that carries it (the conservative decontamination-style
    * excision; the keep-one-canonical-occurrence variant needs a gram →
    * owner assignment and is deliberately not baked in — compose with
    * [[Dedup]] canonical selection for that). Documents left with zero
    * tokens disappear from the output. */
  def exciseTokens(docs: DataFrame, w: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    exciseTokensBySpans(docs, dupSpans(docs, w, textCol, idCol),
      textCol, idCol)

  /** [[exciseTokens]] against PRECOMPUTED spans (doc_id, span_start,
    * span_end) — the composition point for history-backed excision:
    * feed [[graft.store.GramIndex]]'s probe/ingest spans here to scrub
    * a batch against the whole corpus, not just itself. Spans are
    * disjoint by construction, so coverage explodes without a distinct. */
  def exciseTokensBySpans(docs: DataFrame, spans: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val covered = spans.select(col("doc_id"),
      explode(expr("sequence(span_start, span_end - 1)")).as("pos"))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+"))
          .as(Seq("pos", "tok")))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
  }

  /** Scrubbed text per document: original id columns + `scrubbed_text`
    * (kept tokens re-joined with single spaces, in order) + `n_kept`.
    * The pipeline-composition form of [[exciseTokens]]. */
  def exciseText(docs: DataFrame, w: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    regroup(exciseTokens(docs, w, textCol, idCol))

  /** [[exciseText]] against precomputed spans (see
    * [[exciseTokensBySpans]]): (doc_id, n_kept, scrubbed_text).
    * Documents left with zero tokens disappear — a fully-duplicated
    * document is excised whole, which subsumes exact dedup. */
  def exciseTextBySpans(docs: DataFrame, spans: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    regroup(exciseTokensBySpans(docs, spans, textCol, idCol))

  private def regroup(kept: DataFrame): DataFrame =
    kept
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
          " ").as("scrubbed_text"))
}
