package graft.queries

import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation battery: repetition quality filters and deterministic
  * stratified sampling / source mixing over `documents` — the curation
  * steps a 100 TB training-data pipeline runs between dedup and
  * tokenization. All outputs are integers (the hash gate's numeric rule)
  * and every hash is md5 so DuckDB can replay the exact decisions.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Corpus with per-rule degenerate plants for the quality-gate
    * queries (first-match-wins, mirrored verbatim in the oracle's CASE
    * chain — a doc_id divisible by two moduli takes the FIRST branch in
    * both engines). */
  private def plantedQualityDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).withColumn("text",
      when($"doc_id" % 19 === 0, rtrim(repeat(concat($"text", lit(" ")), 25)))
        .when($"doc_id" % 23 === 0,
          rtrim(repeat(lit("zxq qvw mkl pro wfg "), 12)))
        .when($"doc_id" % 29 === 0,
          repeat(lit("• the data point of interest\n"), 8))
        .when($"doc_id" % 31 === 0, repeat(
          lit("the data of note goes on and on and on and ends...\n"), 10))
        .when($"doc_id" % 37 === 0,
          rtrim(repeat(lit("the# data of things here now "), 10)))
        .when($"doc_id" % 41 === 0, lit("tiny doc"))
        .when($"doc_id" % 43 === 0,
          rtrim(repeat(lit("pneumonoultramicroscopic "), 30)))
        .when($"doc_id" % 47 === 0,
          concat($"text", repeat(lit(" \uFFFD\uFFFD\uFFFD"), 20)))
        .otherwise($"text"))
  }

  /** Corpus with planted non-Latin passages for `q_script_mix`
    * (first-match-wins CASE, mirrored in the oracle): disjoint moduli
    * append enough Cyrillic / CJK / Arabic / Greek / Hangul to flip the
    * dominant script on typical docs. */
  private def plantedScriptDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).withColumn("text",
      when($"doc_id" % 11 === 0,
        concat($"text", repeat(lit(" данные проверка слово"), 60)))
        .when($"doc_id" % 17 === 0,
          concat($"text", repeat(lit(" 数据处理流水线データ"), 60)))
        .when($"doc_id" % 23 === 1,
          concat($"text", repeat(lit(" بيانات كثيرة هنا"), 60)))
        .when($"doc_id" % 29 === 1,
          concat($"text", repeat(lit(" δεδομένα και άλλα εδώ"), 60)))
        .when($"doc_id" % 31 === 1,
          concat($"text", repeat(lit(" 데이터 처리 구간"), 60)))
        .otherwise($"text"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Unicode script mix: per-doc codepoint counts for the major script
    // blocks (explicit ranges — identical codepoints in Java regex and
    // RE2, unlike \p{script} classes) + first-max-wins dominant script.
    // The multilingual routing signal next to q_langid_model; planted
    // passages flip dominance per block
    "q_script_mix" -> ((s, dir) => {
      import s.implicits._
      Curation.scriptMix(plantedScriptDocs(s, dir))
        .select($"doc_id", $"n_latin", $"n_cyrillic", $"n_greek",
          $"n_cjk", $"n_arabic", $"n_hangul", $"n_digit",
          $"n_codepoints", $"dominant")
        .orderBy($"doc_id")
    }),

    // fixed-size token chunking with overlap (chunk 64, overlap 16):
    // the map-only window pass before embedding/packing; checked as
    // window geometry + order-sensitive chunk hash
    "q_chunk" -> ((s, dir) => {
      import s.implicits._
      Curation.chunk(docs(s, dir), chunkTokens = 64, overlapTokens = 16)
        .select($"doc_id", $"chunk_idx", $"chunk_start", $"n_chunk_tokens",
          md5(array_join($"chunk", " ")).as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // cross-document line dedup (C4/RefinedWeb boilerplate removal):
    // every doc gets a universal header line, every 3rd a shared footer,
    // the rest a unique footer, plus a trailing blank line. Lines seen
    // >5 times corpus-wide vanish everywhere; blank lines survive.
    // Checked as kept/removed counts + md5 of the reassembled text
    "q_line_dedup" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("text",
        concat_ws("\n",
          lit("SUBSCRIBE to our newsletter today"),
          $"text",
          when($"doc_id" % 3 === 0,
            lit("all rights reserved - terms apply"))
            .otherwise(concat(lit("footer note "), $"doc_id".cast("string"))),
          lit("")))
      Curation.lineDedup(planted, maxOccurrences = 5)
        .select($"doc_id", $"n_lines", $"n_kept", $"n_removed",
          md5($"text_clean").as("clean_md5"))
        .orderBy($"doc_id")
    }),

    // markup strip: every 4th doc arrives as crawl tag soup (style +
    // script blocks, a multi-line comment, entities incl. the
    // double-escape case) — stripped to text byte-for-byte reproducibly;
    // untouched docs exercise the identity path
    "q_strip_markup" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("text",
        when($"doc_id" % 4 === 0, concat(
          lit("<html><head><style type=\"text/css\">p { color: red; }" +
            "</style></head><body><h1>Doc "),
          $"doc_id".cast("string"),
          lit("</h1><p class=\"body\">"), $"text",
          lit("</p><script>if (a &lt; b) { run(); }</script>" +
            "<!-- crawl\nnote --><br/>R&amp;D &#39;q&#39;&nbsp;" +
            "&amp;lt;tail&gt;</body></html>")))
          .otherwise($"text"))
      Curation.stripMarkup(planted)
        .select($"doc_id", $"n_tags",
          length($"stripped").as("n_chars_clean"),
          md5($"stripped").as("stripped_md5"))
        .orderBy($"doc_id")
    }),

    // Unicode NFC canonicalization (native codegen'd expression): every
    // 2nd doc gets composed é (U+00E9), decomposed é (e + U+0301) and
    // the Angstrom-sign singleton (U+212B → U+00C5 under NFC) appended —
    // NFC makes the two é spellings byte-identical and rewrites the
    // singleton (codepoint count drops); odd docs exercise the ASCII
    // identity fast path
    "q_nfc" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("text",
        when($"doc_id" % 2 === 0,
          concat($"text", lit(" caf\u00e9 cafe\u0301 \u212Bngstr\u00f6m")))
          .otherwise($"text"))
      val n = graft.functions.functions.nfc($"text")
      planted.select($"doc_id",
        length($"text").as("n_chars_raw"),
        length(n).as("n_chars_nfc"),
        when(n =!= $"text", 1).otherwise(0).as("nfc_changed"),
        md5(n).as("nfc_md5"))
        .orderBy($"doc_id")
    }),

    // Gopher-style repetition filter: per-doc 3-gram totals, duplicated-
    // gram mass, top-gram count, and the >20%-duplicated flag. Every 7th
    // doc gets its text doubled (simulated boilerplate) so the flag path
    // is exercised — the synthetic corpus has almost no natural
    // repetition
    "q_repetition" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("text",
        when($"doc_id" % 7 === 0, concat_ws(" ", $"text", $"text"))
          .otherwise($"text"))
      Curation.repetitionStats(planted, n = 3)
        .withColumn("flagged",
          when($"dup_grams" * 5 > $"n_grams", 1).otherwise(0))
        .orderBy($"doc_id")
    }),

    // eval-set decontamination: every 13th doc plays the benchmark set;
    // docs sharing any 5-gram with it are flagged (the eval members
    // themselves fully self-overlap, so the flag path is exercised)
    "q_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      Curation.contaminationStats(d, d.filter($"doc_id" % 13 === 0), n = 5)
        .withColumn("contaminated", when($"n_hits" > 0, 1).otherwise(0))
        .orderBy($"doc_id")
    }),

    // the reverse contamination direction: per EVAL sample, how much of
    // it already lives in the corpus and in how many distinct docs —
    // the eval-integrity report next to q_decontaminate's corpus-side
    // flags (same 5-gram class, same every-13th eval set)
    "q_decontaminate_eval" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      Curation.evalContaminationReport(
        d, d.filter($"doc_id" % 13 === 0), n = 5)
        .orderBy($"eval_id")
    }),

    // the same decontamination through the Bloom-prefiltered path (the
    // eval-set-too-big-to-broadcast-exactly shape): a literal bit-array
    // probe prunes corpus grams map-side, an exact semi-join confirms
    // the survivors — identical answer, so it shares the exact oracle
    "q_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      Curation.contaminationStatsBloom(
        d, d.filter($"doc_id" % 13 === 0), n = 5)
        .withColumn("contaminated", when($"n_hits" > 0, 1).otherwise(0))
        .orderBy($"doc_id")
    }),

    // LM-coverage quality scoring (integer-exact CCNet-style filter):
    // vocabulary = the corpus's 300 most frequent word bigrams (count
    // desc, gram asc tie-break), score = share of each doc's bigrams
    // drawn from it. Every 11th doc gets shuffled-alphabet gibberish
    // appended so the low-coverage path is exercised
    "q_lm_coverage" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("text",
        when($"doc_id" % 11 === 0, concat($"text",
          lit(" zq xv qj vx jz wq qx zx vj xq "),
          md5($"doc_id".cast("string")), lit(" "),
          md5(($"doc_id" + 1).cast("string"))))
          .otherwise($"text"))
      Curation.lmCoverage(planted, n = 2, vocabSize = 300)
        .orderBy($"doc_id")
    }),

    // character-bigram LM quality score: model = corpus-wide adjacent
    // char-pair counts over the normalized text, score = average model
    // probability of each doc's bigrams in micro units. The probability
    // quantization (round(1e6*cnt/total)) and the order-independent
    // integer sum make the score replay bit-identically in DuckDB
    "q_charlm_score" -> ((s, dir) => {
      import s.implicits._
      Curation.charLmScore(docs(s, dir)).orderBy($"doc_id")
    }),

    // PII redaction: scrub emails/IPs/phones into typed tokens with
    // per-class prevalence counts. Every 5th doc gets planted PII
    // (deterministic, mirrored in the oracle) since the synthetic corpus
    // has none; md5 of the redacted text makes the byte-exact scrub
    // hash-checkable
    "q_redact" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("text",
        when($"doc_id" % 5 === 0, concat($"text",
          lit(" Contact: user"), $"doc_id".cast("string"),
          lit("@example.com from 10.0.0."),
          ($"doc_id" % 200).cast("string"),
          lit(" call +1 (555) 010-99"),
          ($"doc_id" % 10).cast("string")))
          .otherwise($"text"))
      graft.operators.Curation.redact(planted)
        .select($"doc_id", $"n_emails", $"n_ips", $"n_phones",
          md5($"redacted").as("redacted_md5"))
        .orderBy($"doc_id")
    }),

    // sequence packing: documents placed into fixed-capacity token bins
    // in doc_id order (the "concatenate the token stream, cut every N
    // tokens" pretraining layout) via the two-level prefix sum — small
    // rangeSize so the bucket machinery is genuinely exercised at sf0.01
    "q_pack_bins" -> ((s, dir) => {
      import s.implicits._
      val withTokens = docs(s, dir).select($"doc_id",
        regexp_count(lower($"text"),
          lit(TextQueries.TokenRe)).cast("long").as("n_tokens"))
      Curation.packBins(withTokens, tokensCol = "n_tokens",
        idCol = "doc_id", capacity = 2048L, rangeSize = 64L)
        .select($"doc_id", $"n_tokens", $"tokens_before", $"bin",
          $"bin_offset")
        .orderBy($"doc_id")
    }),

    // per-source token-budget selection (the mixture-recipe "take N
    // tokens per source" fill): greedy in doc_id order, budget 700 ≈
    // half of every source's total so both kept and cut paths carry
    // rows; small rangeSize exercises the two-level machinery
    "q_token_budget" -> ((s, dir) => {
      import s.implicits._
      val withTokens = docs(s, dir).select($"doc_id", $"source",
        regexp_count(lower($"text"),
          lit(TextQueries.TokenRe)).cast("long").as("n_tokens"))
      Curation.tokenBudget(withTokens, budget = 700L,
        tokensCol = "n_tokens", rangeSize = 64L)
        .select($"doc_id", $"source", $"n_tokens", $"tokens_before", $"kept")
        .orderBy($"doc_id")
    }),

    // deterministic epoch shuffle: two epochs of md5-ranked training
    // order — different permutations per epoch, bit-reproducible on
    // both engines, no RNG state
    "q_epoch_shuffle" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"epoch").orderBy($"shuffle_key", $"doc_id")
      Seq(1, 2).map { e =>
        Curation.epochShuffle(docs(s, dir), e)
          .select(lit(e).as("epoch"), $"doc_id", $"shuffle_key")
      }.reduce(_ unionByName _)
        .withColumn("rank", row_number().over(w))
        .select($"epoch", $"rank", $"doc_id", $"shuffle_key")
        .orderBy($"epoch", $"rank")
    }),

    // deterministic stratified sampling: downsample the dominant language
    // to 10%, keep 50% of the rest; the kept set is a pure function of
    // doc_id so any engine reproduces it row-for-row
    "q_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      Curation.stratifiedSample(docs(s, dir),
        stratumCol = "lang", idCol = "doc_id",
        rates = Map("en" -> 10), defaultPct = 50)
        .select($"doc_id", $"lang", $"sample_bucket")
        .orderBy($"doc_id")
    }),

    // the capstone: the full curation pass a training pipeline runs —
    // recrawled duplicates collapsed by exact dedup, low-quality and
    // repetition-flagged docs dropped, the dominant language downsampled,
    // then an embedding-coverage audit per language. Composes
    // q_dedup_exact + q_repetition + q_stratified_sample machinery into
    // one plan (each stage is a hash aggregate or map-side filter; the
    // embedding join is a plain equi-join AQE can re-plan)
    "q_curation_pipeline" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      // recrawl ids offset far past any scale factor's doc_id domain —
      // a small offset would collide with real ids on larger corpora and
      // silently merge two distinct documents' grams
      val recrawl = d.filter($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + 1000000000L)
      val corpus = d.unionByName(recrawl)
      val canonical = corpus.groupBy(md5($"text").as("__h"))
        .agg(min($"doc_id").as("doc_id"))
      val deduped = corpus.join(
        canonical.select($"doc_id"), Seq("doc_id"), "left_semi")
      val withWords = deduped.withColumn("n_words",
        size(split(trim($"text"), "[ \\t\\n\\x0B\\f\\r]+")))
      val flags = Curation.repetitionStats(deduped, n = 3)
        .select($"doc_id", ($"dup_grams" * 5 > $"n_grams").as("__flagged"))
      val quality = withWords.join(flags, Seq("doc_id"), "left")
        .filter($"n_words" >= 15 && !coalesce($"__flagged", lit(false)))
      val sampled = Curation.stratifiedSample(quality,
        stratumCol = "lang", idCol = "doc_id",
        rates = Map("en" -> 50), defaultPct = 100)
      val emb = Tables.read(s, dir, "embeddings")
        .select($"vec_id".as("doc_id"), lit(1).as("__has_emb"))
      sampled.join(emb, Seq("doc_id"), "left")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"__has_emb", lit(0))).as("n_with_embedding"),
          sum($"n_words").as("sum_words"))
        .orderBy($"lang")
    }),

    // the composed Gopher quality GATE (arXiv:2112.11446 §A1.1): one
    // call, keep/drop + ordered reason list, every threshold an integer
    // cross-multiplication. Planted degenerates (first-match-wins CASE,
    // mirrored in the oracle) exercise each rule: %19 giant+repetitive,
    // %23 no-stopword junk, %29 all-bullet lines, %31 ellipsis lines,
    // %37 symbol-heavy, %41 too short, %43 absurd word length
    // quantile-gated selection over the char-LM score: keep the best
    // 90% of the corpus — the threshold is the EXACT ceil(N/10)-th
    // smallest avg_micro (bucket-and-refine, no global sort), ties
    // keep. The dynamic-threshold companion to q_quality_gate's fixed
    // rules
    "q_score_gate" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Selection.keepAboveQuantile(
        Curation.charLmScore(docs(s, dir)), "avg_micro",
        dropPpm = 100000L)
        .select($"doc_id", $"avg_micro", $"kept")
        .orderBy($"doc_id")
    }),

    "q_quality_gate" -> ((s, dir) => {
      import s.implicits._
      Curation.qualityGate(plantedQualityDocs(s, dir),
        minWords = 5L, maxWords = 500L)
        .select($"doc_id", $"n_words", $"keep", $"reasons")
        .orderBy($"doc_id")
    }),

    // the per-source curation report over the same gate — docs/words
    // total vs kept plus one drop-count column per rule: the audit
    // table a curation run publishes (the reference's report-sink shape
    // applied to quality filtering)
    "q_curation_report" -> ((s, dir) => {
      import s.implicits._
      Curation.curationReport(
        Curation.qualityGate(plantedQualityDocs(s, dir),
          minWords = 5L, maxWords = 500L),
        stratumCol = "source")
        .orderBy($"source")
    }),

    // gate + dedup COMPOSED in the curateAllWithHistory stage order
    // (batch form of the five-stage streaming pipeline): quality-gate a
    // recrawl-extended corpus FIRST, exact-dedup only the survivors,
    // and report per source what each stage kept. The recrawl
    // re-appends every 7th doc under a far id, so dedup must collapse
    // it back onto its original while the gate books planted junk
    // before any hashing happens. Plan shape: the gate is one corpus
    // scan + one id-keyed join; dedup adds one hash-agg + one
    // left-semi — no corpus self-join at any scale
    "q_gate_dedup_pipeline" -> ((s, dir) => {
      import s.implicits._
      val d = plantedQualityDocs(s, dir)
        .select($"doc_id", $"source", $"text")
      val recrawl = d.filter($"doc_id" % 7 === 0)
        .withColumn("doc_id", $"doc_id" + 2000000000L)
      // stopword floor 1 (not the default 2): the synthetic corpus is
      // word-salad where most docs carry exactly one list stopword —
      // floor 2 gates out EVERYTHING and the dedup stage would have
      // nothing to prove
      // pin the recrawl-extended corpus AND the gated frame ONCE (the
      // curateAllBatch discipline, StreamOps persist): the gate reads
      // its input twice (expression leg + repetition agg) and three
      // legs consume the gate's verdicts — the gate audit agg, the
      // canonical hash-agg, and the semi-join probe side. Without the
      // pins every leg re-ran the whole gate from the base scan (~3x
      // the corpus reads and regexp work). Content is unchanged, only
      // the number of base scans (exactly 2: docs + recrawl). The
      // per-source audit is a handful of rows, so it is taken EAGERLY
      // while the pins are warm and handed back as a local relation —
      // both caches release before this function returns (the
      // keepAboveQuantile discipline; the lazy-persist version leaked
      // two cached frames per call into any non-harness session,
      // ADVICE r11).
      val corpus = d.unionByName(recrawl).persist()
      val gated = Curation.qualityGate(corpus,
        minWords = 5L, maxWords = 500L, minStopwords = 1).persist()
      try {
        val kept = gated.filter($"keep" === 1)
        val canonical = kept.groupBy(md5($"text").as("__h"))
          .agg(min($"doc_id").as("doc_id"))
        val unique = kept.join(
          canonical.select($"doc_id"), Seq("doc_id"), "left_semi")
        val audit = gated.groupBy($"source")
          .agg(count(lit(1)).as("docs_total"),
            sum($"keep".cast("long")).as("gate_kept"))
          .join(unique.groupBy($"source")
            .agg(count(lit(1)).as("dedup_kept"),
              sum($"n_words").as("words_kept")), Seq("source"))
          .orderBy($"source")
        s.createDataFrame(
          java.util.Arrays.asList(audit.collect(): _*), audit.schema)
      } finally {
        gated.unpersist(false)
        corpus.unpersist(false)
      }
    }),

    // dataset mixing: per-source keep rates (a 3-tier curriculum mix),
    // reported as kept/total per source — the audit table a mixing step
    // emits before materializing the blend
    "q_source_mix" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val kept = Curation.stratifiedSample(d,
        stratumCol = "source", idCol = "doc_id",
        rates = Map("src0" -> 100, "src1" -> 100, "src2" -> 80,
          "src3" -> 80, "src4" -> 50),
        defaultPct = 20)
        .groupBy($"source").agg(count(lit(1)).as("n_kept"))
      d.groupBy($"source").agg(count(lit(1)).as("n_total"))
        .join(kept, Seq("source"), "left")
        .select($"source", $"n_total",
          coalesce($"n_kept", lit(0L)).as("n_kept"))
        .orderBy($"source")
    }),

    // deterministic train/val/test split (98/1/1): md5-ppm ranges over
    // the id — rows never move between splits as the corpus grows
    // (unlike randomSplit), and every stratum splits at the same ratio
    // for free. Audit: per (split, lang) counts
    "q_split_assign" -> ((s, dir) => {
      import s.implicits._
      Curation.splitAssign(docs(s, dir), "doc_id",
        Seq("train" -> 980000, "val" -> 10000, "test" -> 10000))
        .groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"split", $"lang")
    }),

    // trained language-ID: per-lang smoothed char-bigram models, every
    // doc scored under every model, argmax prediction next to the true
    // label — the Cavnar-Trenkle upgrade of q_lang_markers' heuristic.
    // One ln micro-rounding per model cell, integer products/sums after.
    // (On this synthetic corpus the langs share most vocabulary — only
    // sparse marker words differ — so the audit column reports ~36%
    // accuracy over 5 langs vs 20% chance: the corpus is weakly
    // char-separable by construction, which is itself what the audit
    // output is for)
    "q_langid_model" -> ((s, dir) => {
      import s.implicits._
      Curation.langId(docs(s, dir))
        .orderBy($"doc_id")
    }),

    // temperature (α) source mixing — the mT5/XLM-R sampling policy:
    // keep rates ∝ n^α / n against a 150-doc budget, flattening the
    // source distribution so rare sources over-represent. One float
    // step (round(1e6·exp(α·ln n)), the DSIR discipline), then pure
    // 128-bit integer arithmetic; the audit table reports computed
    // rates next to realized keeps
    "q_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val rates = Curation.temperatureRates(d, "source",
        alpha = 0.5, budget = 150L)
      val kept = Curation.temperatureMix(d, "source", "doc_id",
        alpha = 0.5, budget = 150L)
        .groupBy($"source").agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .select($"source", $"n_docs", $"keep_ppm",
          coalesce($"n_kept", lit(0L)).as("n_kept"))
        .orderBy($"source")
    }))

  /** q_redact oracle built from the SAME pattern list the operator
    * applies ([[Curation.RedactPatterns]]) — one source of truth, no
    * regex drift between engines. Mirrors the operator's progressive
    * semantics: each class is counted on the text after the earlier
    * classes were replaced, so counts equal emitted tokens. */
  private val RedactOracle: String = {
    val steps = Curation.RedactPatterns.zip(Curation.RedactCountColumns)
    // s0 = planted text; each step counts on s(i-1) and produces s(i)
    val stages = steps.zipWithIndex.map { case (((p, tok), cname), i) =>
      s"""s$i AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(t, '$p')) AS $cname,
         |    regexp_replace(t, '$p', '$tok', 'g') AS t${
        if (i > 0) s",\n    ${steps.take(i).map(_._2).mkString(", ")}" else ""}
         |  FROM ${if (i == 0) "planted" else s"s${i - 1}"})"""
        .stripMargin
    }.mkString(",\n")
    val countCols = Curation.RedactCountColumns.mkString(", ")
    val last = s"s${steps.size - 1}"
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' Contact: user' ||
       |      doc_id || '@example.com from 10.0.0.' || (doc_id % 200) ||
       |      ' call +1 (555) 010-99' || (doc_id % 10)
       |    ELSE text END AS t
       |  FROM documents),
       |$stages
       |SELECT doc_id, $countCols, md5(t) AS redacted_md5
       |FROM $last ORDER BY doc_id""".stripMargin
  }

  /** q_strip_markup oracle generated from the SAME ordered pattern list
    * the operator folds over ([[Curation.MarkupPatterns]]) — one source
    * of truth, no regex drift between engines (the [[RedactOracle]]
    * discipline). */
  private val StripOracle: String = {
    def q(s: String) = s.replace("'", "''")
    val stripExpr = Curation.MarkupPatterns.foldLeft("t") {
      case (acc, (p, r)) => s"regexp_replace($acc, '${q(p)}', '${q(r)}', 'g')"
    }
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 4 = 0 THEN
       |      '<html><head><style type="text/css">p { color: red; }' ||
       |      '</style></head><body><h1>Doc ' || doc_id ||
       |      '</h1><p class="body">' || text ||
       |      '</p><script>if (a &lt; b) { run(); }</script>' ||
       |      '<!-- crawl' || chr(10) ||
       |      'note --><br/>R&amp;D &#39;q&#39;&nbsp;' ||
       |      '&amp;lt;tail&gt;</body></html>'
       |    ELSE text END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '<[^>]+>')) AS INT) AS n_tags,
       |  CAST(length(trim($stripExpr)) AS INT) AS n_chars_clean,
       |  md5(trim($stripExpr)) AS stripped_md5
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  /** Shared by `q_decontaminate` and `q_bloom_decontaminate`: the Bloom
    * path's prefilter has no false negatives and its false positives are
    * removed by the exact confirm join, so both queries compute THIS —
    * the exact set-membership contamination stats. */
  private val DecontaminateOracle: String =
    """WITH words AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS w
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w) - 3),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |           w[i+3] || ' ' || w[i+4])) AS g
      |  FROM words WHERE len(w) >= 5
      |), eval_grams AS (
      |  SELECT DISTINCT g FROM grams WHERE doc_id % 13 = 0
      |), hits AS (
      |  SELECT gr.doc_id, count(*) AS n_grams,
      |         sum(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      |  FROM grams gr LEFT JOIN eval_grams eg ON gr.g = eg.g
      |  GROUP BY gr.doc_id
      |)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
      |  CASE WHEN COALESCE(n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
      |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Shared oracle SQL (generated-oracle discipline, one source of
    * truth): the planted-degenerates corpus used by the three gate
    * queries. */
  private val PlantedQualitySql: String =
    """  SELECT doc_id, source, CASE
      |    WHEN doc_id % 19 = 0 THEN rtrim(repeat(text || ' ', 25))
      |    WHEN doc_id % 23 = 0 THEN rtrim(repeat('zxq qvw mkl pro wfg ', 12))
      |    WHEN doc_id % 29 = 0
      |      THEN repeat('• the data point of interest' || chr(10), 8)
      |    WHEN doc_id % 31 = 0 THEN repeat(
      |      'the data of note goes on and on and on and ends...' || chr(10), 10)
      |    WHEN doc_id % 37 = 0 THEN rtrim(repeat('the# data of things here now ', 10))
      |    WHEN doc_id % 41 = 0 THEN 'tiny doc'
      |    WHEN doc_id % 43 = 0 THEN rtrim(repeat('pneumonoultramicroscopic ', 30))
      |    WHEN doc_id % 47 = 0
      |      THEN text || repeat(' ' || chr(65533) || chr(65533) || chr(65533), 20)
      |    ELSE text END AS text
      |  FROM documents""".stripMargin

  /** The quality-gate CTE chain (sig -> feat -> rwords -> rgrams ->
    * rper -> rep -> gate -> gated), parameterized by the corpus CTE
    * name so the gate+dedup composition runs the IDENTICAL rules over
    * a recrawl-extended corpus. Plain template + replace, not an
    * s-interpolator: the SQL contains dollar anchors. */
  private val GateChainTemplate: String =
    """sig AS (
      |  SELECT doc_id, source, text,
      |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS w,
      |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
      |      x -> x <> '') AS l
      |  FROM __CORPUS__),
      |feat AS (
      |  SELECT doc_id, source,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT)
      |      AS wchars,
      |    CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS hashc,
      |    CAST(len(regexp_extract_all(text, '\.\.\.|…')) AS BIGINT) AS ellsym,
      |    CAST(len(list_filter(l, x -> regexp_matches(x, '^[•\-\*]')))
      |      AS BIGINT) AS bullet,
      |    CAST(len(list_filter(l, x -> regexp_matches(x, '(\.\.\.|…)$')))
      |      AS BIGINT) AS ellip,
      |    CAST(len(list_filter(w, x -> regexp_matches(lower(x), '[a-z]')))
      |      AS BIGINT) AS alpha,
      |    CAST(len(l) AS BIGINT) AS nlines,
      |    CAST(len(regexp_extract_all(text,
      |      '[\x{FFFD}\x{0000}-\x{0008}\x{000E}-\x{001F}\x{0080}-\x{009F}]'))
      |      AS BIGINT) AS badenc,
      |    CAST(length(text) AS BIGINT) AS n_cp,
      |    (CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\bbe\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\bthat\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\bhave\b') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(lower(text), '\bwith\b') THEN 1 ELSE 0 END)
      |      AS stop
      |  FROM sig),
      |rwords AS (
      |  SELECT doc_id, string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')
      |    AS w
      |  FROM __CORPUS__),
      |rgrams AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |  FROM rwords WHERE len(w) >= 3),
      |rper AS (SELECT doc_id, g, count(*) AS cnt FROM rgrams GROUP BY 1, 2),
      |rep AS (
      |  SELECT doc_id, sum(cnt) AS ng,
      |    sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dg
      |  FROM rper GROUP BY 1),
      |gate AS (
      |  SELECT f.doc_id, f.source, f.n_words,
      |    coalesce(array_to_string(list_filter([
      |      CASE WHEN f.n_words < 5 THEN 'too_few_words' END,
      |      CASE WHEN f.n_words > 500 THEN 'too_many_words' END,
      |      CASE WHEN f.wchars < 3 * f.n_words OR f.wchars > 10 * f.n_words
      |           THEN 'word_length' END,
      |      CASE WHEN f.hashc * 10 > f.n_words
      |           OR f.ellsym * 10 > f.n_words THEN 'symbol_ratio' END,
      |      CASE WHEN f.bullet * 10 > f.nlines * 9 THEN 'bullet_lines' END,
      |      CASE WHEN f.ellip * 10 > f.nlines * 3 THEN 'ellipsis_lines' END,
      |      CASE WHEN f.alpha * 5 < f.n_words * 4 THEN 'alpha_words' END,
      |      CASE WHEN f.stop < __MINSTOP__ THEN 'stopwords' END,
      |      CASE WHEN coalesce(r.dg, 0) * 5 > coalesce(r.ng, 0)
      |           THEN 'repetition' END,
      |      CASE WHEN f.badenc * 1000 > f.n_cp THEN 'encoding' END
      |    ], x -> x IS NOT NULL), ','), '') AS reasons
      |  FROM feat f LEFT JOIN rep r USING (doc_id)),
      |gated AS (
      |  SELECT doc_id, source, n_words,
      |    CASE WHEN reasons = '' THEN 1 ELSE 0 END AS keep, reasons
      |  FROM gate)""".stripMargin

  /** @param minStop stopword floor (`minStopwords` on the Spark side).
    * The `coalesce(..., '')` in the template is load-bearing: DuckDB's
    * `array_to_string` of an EMPTY list is NULL, Spark's `array_join`
    * is '' — without it a clean document (no reasons at all) would
    * keep=0 in the oracle and hash-mismatch the Spark keep=1. */
  private def gateChainSql(corpus: String, minStop: Int = 2): String =
    GateChainTemplate.replace("__CORPUS__", corpus)
      .replace("__MINSTOP__", minStop.toString)

  val oracleSql: Map[String, String] = Map(
    "q_redact" -> RedactOracle,
    "q_strip_markup" -> StripOracle,

    // lines split on chr(10) keep trailing empties on both engines
    // (Spark split(.., -1) / DuckDB string_split); blank lines are
    // structural: excluded from boilerplate counting, always kept
    "q_line_dedup" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    'SUBSCRIBE to our newsletter today' || chr(10) || text ||
        |    chr(10) ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'all rights reserved - terms apply'
        |         ELSE 'footer note ' || doc_id END || chr(10) AS t
        |  FROM documents),
        |l AS (
        |  SELECT doc_id,
        |    unnest(string_split(t, chr(10))) AS line,
        |    generate_subscripts(string_split(t, chr(10)), 1) AS line_idx
        |  FROM planted),
        |boiler AS (
        |  SELECT line FROM l WHERE trim(line) <> ''
        |  GROUP BY line HAVING count(*) > 5),
        |kept AS (
        |  SELECT l.doc_id, count(*) AS n_kept,
        |    string_agg(l.line, chr(10) ORDER BY l.line_idx) AS text_clean
        |  FROM l LEFT JOIN boiler b ON l.line = b.line
        |  WHERE b.line IS NULL
        |  GROUP BY l.doc_id),
        |tot AS (
        |  SELECT doc_id, len(string_split(t, chr(10))) AS n_lines
        |  FROM planted)
        |SELECT t.doc_id, CAST(t.n_lines AS INT) AS n_lines,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(t.n_lines - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
        |  md5(COALESCE(k.text_clean, '')) AS clean_md5
        |FROM tot t LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // mirrors Curation.lmCoverage: bigrams over \s+-normalized words,
    // vocab = top-300 by (count DESC, gram ASC), integer-division pct
    "q_lm_coverage" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN
        |      text || ' zq xv qj vx jz wq qx zx vj xq ' ||
        |      md5(CAST(doc_id AS VARCHAR)) || ' ' ||
        |      md5(CAST(doc_id + 1 AS VARCHAR))
        |    ELSE text END AS text
        |  FROM documents),
        |words AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS w
        |  FROM planted),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w)),
        |      i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM words WHERE len(w) >= 2),
        |counts AS (SELECT g, count(*) AS cnt FROM grams GROUP BY g),
        |vocab AS (SELECT g FROM counts ORDER BY cnt DESC, g LIMIT 300),
        |hits AS (
        |  SELECT gr.doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN v.g IS NOT NULL THEN 1 ELSE 0 END) AS n_known
        |  FROM grams gr LEFT JOIN vocab v ON gr.g = v.g
        |  GROUP BY gr.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(n_known, 0) AS BIGINT) AS n_known,
        |  CAST(CASE WHEN COALESCE(n_grams, 0) > 0
        |       THEN COALESCE(n_known, 0) * 100 // n_grams
        |       ELSE 0 END AS BIGINT) AS coverage_pct
        |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // mirrors Curation.charLmScore: explicit whitespace class (\s
    // differs between engines on U+000B), micro-quantized bigram
    // probability, integer sum + integer-division mean
    "q_charlm_score" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)),
        |                   '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, substring(t, i, 2) AS g
        |  FROM norm, unnest(generate_series(1, length(t) - 1)) AS u(i)
        |  WHERE length(t) >= 2),
        |model AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
        |          FROM grams GROUP BY g),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM model),
        |scored AS (
        |  SELECT gr.doc_id,
        |    CAST(round(m.cnt * 1000000.0 / t.total) AS BIGINT) AS p_micro
        |  FROM grams gr JOIN model m ON gr.g = m.g CROSS JOIN tot t)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(p_micro) AS BIGINT) AS score_sum,
        |  CAST(sum(p_micro) // count(*) AS BIGINT) AS avg_micro
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // chr(233)=U+00E9 composed é, chr(769)=U+0301 combining acute,
    // chr(8491)=U+212B Angstrom sign (NFC singleton -> U+00C5),
    // chr(246)=U+00F6; length() is codepoints on both engines
    "q_nfc" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN text || ' caf' || chr(233) || ' cafe' || chr(769) ||
        |           ' ' || chr(8491) || 'ngstr' || chr(246) || 'm'
        |      ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(t) AS INT) AS n_chars_raw,
        |  CAST(length(nfc_normalize(t)) AS INT) AS n_chars_nfc,
        |  CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END AS nfc_changed,
        |  md5(nfc_normalize(t)) AS nfc_md5
        |FROM planted ORDER BY doc_id""".stripMargin,

    // chunk 64 / overlap 16 -> stride 48; start upper bound n-1-overlap
    // mirrors Curation.chunk's no-contained-tail rule
    "q_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
        |                t -> length(t) > 0) AS toks
        |  FROM documents),
        |sized AS (
        |  SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0),
        |starts AS (
        |  SELECT doc_id, toks, n,
        |    unnest(generate_series(0, greatest(n - 1 - 16, 0), 48)) AS chunk_start
        |  FROM sized)
        |SELECT doc_id, CAST(chunk_start // 48 AS INT) AS chunk_idx,
        |  CAST(chunk_start AS INT) AS chunk_start,
        |  CAST(len(toks[chunk_start + 1 : least(chunk_start + 64, n)]) AS INT)
        |    AS n_chunk_tokens,
        |  md5(array_to_string(toks[chunk_start + 1 : least(chunk_start + 64, n)],
        |    ' ')) AS chunk_md5
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_decontaminate" -> DecontaminateOracle,

    // Bloom prefilter + exact confirm returns the set-join's exact
    // answer (no false negatives; false positives die in the confirm),
    // so the twin shares the oracle — the filter changes how much the
    // confirm join reads, not the result
    "q_bloom_decontaminate" -> DecontaminateOracle,

    "q_decontaminate_eval" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')
        |      AS w
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |           w[i+3] || ' ' || w[i+4])) AS g
        |  FROM words WHERE len(w) >= 5
        |), eg AS (
        |  SELECT DISTINCT doc_id AS eval_id, g FROM grams
        |  WHERE doc_id % 13 = 0
        |), cg AS (SELECT DISTINCT doc_id AS corpus_id, g FROM grams),
        |m AS (
        |  SELECT eg.eval_id, eg.g, cg.corpus_id
        |  FROM eg JOIN cg ON eg.g = cg.g),
        |agg AS (
        |  SELECT eval_id,
        |    count(DISTINCT g) AS n_contaminated_grams,
        |    count(DISTINCT corpus_id) AS n_corpus_docs
        |  FROM m GROUP BY eval_id),
        |tot AS (SELECT eval_id, count(*) AS n_grams FROM eg GROUP BY eval_id)
        |SELECT e.doc_id AS eval_id,
        |  CAST(coalesce(tot.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(agg.n_contaminated_grams, 0) AS BIGINT)
        |    AS n_contaminated_grams,
        |  CAST(coalesce(agg.n_corpus_docs, 0) AS BIGINT) AS n_corpus_docs
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 13 = 0) e
        |LEFT JOIN tot ON tot.eval_id = e.doc_id
        |LEFT JOIN agg ON agg.eval_id = e.doc_id
        |ORDER BY eval_id""".stripMargin,

    // the oracle computes tokens_before as ONE global cumulative window —
    // the semantic definition the two-level prefix sum must reproduce
    "q_pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(tokens_before AS BIGINT) AS tokens_before,
        |  CAST(tokens_before // 2048 AS BIGINT) AS bin,
        |  CAST(tokens_before % 2048 AS BIGINT) AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // the oracle computes tokens_before as one per-source cumulative
    // window — the semantic definition the two-level prefix sum must
    // reproduce (the q_pack_bins contract, partitioned by source)
    "q_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, tokens_before,
        |  CAST(CASE WHEN tokens_before < 700 THEN 1 ELSE 0 END AS BIGINT)
        |    AS kept
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_epoch_shuffle" ->
      """WITH e AS (SELECT unnest([1, 2]) AS epoch),
        |r AS (
        |  SELECT epoch, doc_id,
        |    md5(epoch || ':' || doc_id) AS shuffle_key
        |  FROM e, documents)
        |SELECT epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch
        |    ORDER BY shuffle_key, doc_id) AS INT) AS rank,
        |  doc_id, shuffle_key
        |FROM r ORDER BY epoch, rank""".stripMargin,

    "q_repetition" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text ELSE text END AS text
        |  FROM documents
        |), words AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS w
        |  FROM planted
        |), grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM words WHERE len(w) >= 3
        |), per_gram AS (
        |  SELECT doc_id, g, count(*) AS cnt FROM grams GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(sum(cnt) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams,
        |  CAST(max(cnt) AS BIGINT) AS top_gram_n,
        |  CASE WHEN sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 5 > sum(cnt)
        |       THEN 1 ELSE 0 END AS flagged
        |FROM per_gram GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
        |      AS sample_bucket
        |  FROM documents
        |)
        |SELECT doc_id, lang, sample_bucket FROM b
        |WHERE sample_bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |ORDER BY doc_id""".stripMargin,
    "q_curation_pipeline" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text, lang FROM documents
        |  WHERE doc_id % 10 = 0
        |), canonical AS (
        |  SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)
        |), deduped AS (
        |  SELECT c.* FROM corpus c JOIN canonical USING (doc_id)
        |), words AS (
        |  SELECT doc_id, lang,
        |    len(string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |      AS n_words,
        |    string_split(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS w
        |  FROM deduped
        |), grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM words WHERE len(w) >= 3
        |), per_gram AS (
        |  SELECT doc_id, g, count(*) AS cnt FROM grams GROUP BY 1, 2
        |), rep AS (
        |  SELECT doc_id,
        |    (sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 5 > sum(cnt)) AS flagged
        |  FROM per_gram GROUP BY doc_id
        |), quality AS (
        |  SELECT w.doc_id, w.lang, w.n_words
        |  FROM words w LEFT JOIN rep USING (doc_id)
        |  WHERE w.n_words >= 15 AND NOT coalesce(rep.flagged, false)
        |), sampled AS (
        |  SELECT doc_id, lang, n_words FROM quality
        |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |          % 100
        |        < CASE WHEN lang = 'en' THEN 50 ELSE 100 END
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_embedding,
        |  CAST(sum(n_words) AS BIGINT) AS sum_words
        |FROM sampled LEFT JOIN embeddings e ON sampled.doc_id = e.vec_id
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_split_assign" ->
      """WITH keyed AS (
        |  SELECT lang, doc_id,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      ::BIGINT % 1000000 AS k
        |  FROM documents),
        |assigned AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN k < 980000 THEN 'train'
        |         WHEN k < 990000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM keyed)
        |SELECT split, lang, count(*) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM assigned GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    "q_langid_model" ->
      """WITH norm AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(lower(trim(text)),
        |                   '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, lang, substring(t, i, 2) AS g
        |  FROM norm, unnest(generate_series(1, length(t) - 1)) AS u(i)
        |  WHERE length(t) >= 2),
        |counts AS (
        |  SELECT lang, g, CAST(count(*) AS BIGINT) AS cnt
        |  FROM grams GROUP BY lang, g),
        |totals AS (
        |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS total
        |  FROM counts GROUP BY lang),
        |v AS (SELECT count(DISTINCT g) AS vocab FROM grams),
        |model AS (
        |  SELECT c.lang, c.g,
        |    CAST(round(1000000.0 * ln((c.cnt + 1) /
        |      CAST(t.total + v.vocab AS DOUBLE))) AS BIGINT) AS lp
        |  FROM counts c JOIN totals t ON c.lang = t.lang CROSS JOIN v),
        |oov AS (
        |  SELECT t.lang,
        |    CAST(round(1000000.0 * ln(1 /
        |      CAST(t.total + v.vocab AS DOUBLE))) AS BIGINT) AS lp
        |  FROM totals t CROSS JOIN v),
        |dg AS (
        |  SELECT doc_id, lang, g, CAST(count(*) AS BIGINT) AS n
        |  FROM grams GROUP BY doc_id, lang, g),
        |scored AS (
        |  SELECT dg.doc_id, dg.lang,
        |    o.lang AS cand,
        |    CAST(sum(dg.n * coalesce(m.lp, o.lp)) AS BIGINT) AS score
        |  FROM dg
        |  CROSS JOIN oov o
        |  LEFT JOIN model m ON m.lang = o.lang AND m.g = dg.g
        |  GROUP BY dg.doc_id, dg.lang, o.lang),
        |best AS (
        |  SELECT doc_id, lang, cand, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, cand ASC) AS rn
        |  FROM scored)
        |SELECT doc_id, lang, cand AS predicted_lang,
        |  score AS score_micro,
        |  CASE WHEN cand = lang THEN 1 ELSE 0 END AS correct
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_temperature_mix" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, n_docs,
        |    CAST(round(1000000.0 * exp(0.5 * ln(n_docs))) AS BIGINT) AS w
        |  FROM counts
        |), t AS (SELECT sum(w) AS tw FROM w),
        |r AS (
        |  SELECT source, n_docs,
        |    least(1000000, CAST(
        |      (CAST(150 AS HUGEINT) * 1000000 * w)
        |        // (CAST(tw AS HUGEINT) * n_docs) AS BIGINT)) AS keep_ppm
        |  FROM w, t
        |), kept AS (
        |  SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN r ON d.source = r.source
        |  WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
        |          ::BIGINT % 1000000 < r.keep_ppm
        |  GROUP BY d.source
        |)
        |SELECT r.source, r.n_docs, r.keep_ppm,
        |  coalesce(k.n_kept, 0) AS n_kept
        |FROM r LEFT JOIN kept k USING (source)
        |ORDER BY r.source""".stripMargin,

    "q_score_gate" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)),
        |                   '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, substring(t, i, 2) AS g
        |  FROM norm, unnest(generate_series(1, length(t) - 1)) AS u(i)
        |  WHERE length(t) >= 2),
        |model AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
        |          FROM grams GROUP BY g),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM model),
        |scored AS (
        |  SELECT gr.doc_id,
        |    CAST(round(m.cnt * 1000000.0 / t.total) AS BIGINT) AS p_micro
        |  FROM grams gr JOIN model m ON gr.g = m.g CROSS JOIN tot t),
        |per_doc AS (
        |  SELECT doc_id, CAST(sum(p_micro) // count(*) AS BIGINT) AS avg_micro
        |  FROM scored GROUP BY doc_id),
        |thr AS (
        |  SELECT avg_micro AS t FROM per_doc ORDER BY avg_micro
        |  LIMIT 1 OFFSET (greatest(1,
        |    ((SELECT count(*) FROM per_doc) * 100000 + 999999) // 1000000) - 1))
        |SELECT doc_id, avg_micro,
        |  CASE WHEN avg_micro >= (SELECT t FROM thr) THEN 1 ELSE 0 END AS kept
        |FROM per_doc ORDER BY doc_id""".stripMargin,

    "q_script_mix" ->
      """WITH planted AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 11 = 0 THEN text || repeat(' данные проверка слово', 60)
        |    WHEN doc_id % 17 = 0 THEN text || repeat(' 数据处理流水线データ', 60)
        |    WHEN doc_id % 23 = 1 THEN text || repeat(' بيانات كثيرة هنا', 60)
        |    WHEN doc_id % 29 = 1 THEN text || repeat(' δεδομένα και άλλα εδώ', 60)
        |    WHEN doc_id % 31 = 1 THEN text || repeat(' 데이터 처리 구간', 60)
        |    ELSE text END AS text
        |  FROM documents),
        |cnt AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z\x{00C0}-\x{024F}]')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x{0370}-\x{03FF}]')) AS BIGINT) AS n_greek,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]')) AS BIGINT) AS n_cjk,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x{0600}-\x{06FF}]')) AS BIGINT) AS n_arabic,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x{AC00}-\x{D7A3}]')) AS BIGINT) AS n_hangul,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |    CAST(length(text) AS BIGINT) AS n_codepoints
        |  FROM planted),
        |dom AS (
        |  SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
        |    n_hangul, n_digit) AS m
        |  FROM cnt)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_hangul,
        |  n_digit, n_codepoints,
        |  CASE WHEN m = 0 THEN 'other'
        |       WHEN n_latin = m THEN 'latin'
        |       WHEN n_cyrillic = m THEN 'cyrillic'
        |       WHEN n_greek = m THEN 'greek'
        |       WHEN n_cjk = m THEN 'cjk'
        |       WHEN n_arabic = m THEN 'arabic'
        |       WHEN n_hangul = m THEN 'hangul'
        |       WHEN n_digit = m THEN 'digit'
        |       ELSE 'other' END AS dominant
        |FROM dom ORDER BY doc_id""".stripMargin,

    "q_quality_gate" ->
      ("WITH planted AS (\n" + PlantedQualitySql + "),\n" +
        gateChainSql("planted") + "\n" +
        "SELECT doc_id, n_words, keep, reasons FROM gated ORDER BY doc_id"),

    "q_curation_report" ->
      ("WITH planted AS (\n" + PlantedQualitySql + "),\n" +
        gateChainSql("planted") + "\n" +
        """SELECT source,
          |  CAST(count(*) AS BIGINT) AS docs_total,
          |  CAST(sum(keep) AS BIGINT) AS docs_kept,
          |  CAST(sum(n_words) AS BIGINT) AS words_total,
          |  CAST(sum(n_words * keep) AS BIGINT) AS words_kept,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'too_few_words')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_too_few_words,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'too_many_words')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_too_many_words,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'word_length')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_word_length,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'symbol_ratio')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol_ratio,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'bullet_lines')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet_lines,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'ellipsis_lines')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_ellipsis_lines,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'alpha_words')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_words,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'stopwords')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'repetition')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition,
          |  CAST(sum(CASE WHEN list_contains(string_split(reasons, ','), 'encoding')
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_encoding
          |FROM gated GROUP BY source ORDER BY source""".stripMargin),

    "q_gate_dedup_pipeline" ->
      ("WITH planted AS (\n" + PlantedQualitySql + "),\n" +
        """corpus AS (
          |  SELECT doc_id, source, text FROM planted
          |  UNION ALL
          |  SELECT doc_id + 2000000000 AS doc_id, source, text FROM planted
          |  WHERE doc_id % 7 = 0),
          |""".stripMargin +
        gateChainSql("corpus", minStop = 1) + ",\n" +
        """keptx AS (
          |  SELECT g.doc_id, g.source, g.n_words, c.text
          |  FROM gated g JOIN corpus c USING (doc_id) WHERE g.keep = 1),
          |canonical AS (
          |  SELECT min(doc_id) AS doc_id FROM keptx GROUP BY md5(text)),
          |uniq AS (SELECT k.* FROM keptx k JOIN canonical USING (doc_id)),
          |tot AS (
          |  SELECT source, CAST(count(*) AS BIGINT) AS docs_total,
          |    CAST(sum(keep) AS BIGINT) AS gate_kept
          |  FROM gated GROUP BY source),
          |ded AS (
          |  SELECT source, CAST(count(*) AS BIGINT) AS dedup_kept,
          |    CAST(sum(n_words) AS BIGINT) AS words_kept
          |  FROM uniq GROUP BY source)
          |SELECT t.source, t.docs_total, t.gate_kept, d.dedup_kept,
          |  d.words_kept
          |FROM tot t JOIN ded d USING (source) ORDER BY source""".stripMargin),

    "q_source_mix" ->
      """WITH b AS (
        |  SELECT source,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
        |      AS sample_bucket
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN sample_bucket < CASE source
        |    WHEN 'src0' THEN 100 WHEN 'src1' THEN 100
        |    WHEN 'src2' THEN 80 WHEN 'src3' THEN 80
        |    WHEN 'src4' THEN 50 ELSE 20 END
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM b GROUP BY source ORDER BY source""".stripMargin)
}
