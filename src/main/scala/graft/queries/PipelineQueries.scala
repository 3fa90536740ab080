package graft.queries

import graft.operators.{CellIndex, Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-operator battery (dedup hashing, ANN, quantization,
  * multimodal) wired for DuckDB oracle checking: every hash is md5-based
  * (the one hash family both engines share — DuckDB parses the same hex
  * prefixes with `('0x' || …)::BIGINT`), fractional outputs are
  * micro-scaled BIGINTs, and the stub media decoder is keyed on md5.
  * xxhash64-based fast variants of the same operators remain available on
  * the operator objects. The ANN queries are integer-exact end-to-end:
  * [[Similarity.centroids]] sums micro-quantized BIGINT components
  * (order-independent) and divides once, so both engines produce
  * bit-identical centroids, probe assignments, and ranks.
  *
  * Each near-dup query plants duplicates where the synthetic corpus has
  * none so candidate generation provably fires.
  */
object PipelineQueries {

  /** One materialized [[CellIndex]] per scale-factor dir, built lazily in
    * a temp dir: Verify builds it once; Bench passes time only the probe
    * (the honest semantics — an index exists to be built once and probed
    * many times). */
  private val cellIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, CellIndex]

  private def cellIndex(s: SparkSession, dir: String): CellIndex =
    cellIndexCache.getOrElseUpdate(dir, {
      val path = TempDirs.managed("graft-cellindex-").toString
      val idx = new CellIndex(s, path)
      idx.build(Tables.read(s, dir, "embeddings"))
      idx
    })

  /** The LEARNED twin of [[cellIndex]]: cells come from the k-means
    * coarse quantizer (`q_kmeans`'s exact training, k=4, 2 Lloyd
    * rounds), not a given label column — the full train → build → probe
    * IVF lifecycle under the hash gate. */
  private val learnedIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, CellIndex]

  private def learnedIndex(s: SparkSession, dir: String): CellIndex =
    learnedIndexCache.getOrElseUpdate(dir, {
      val path = TempDirs.managed("graft-cellindex-learned-").toString
      val idx = new CellIndex(s, path)
      idx.buildLearned(Tables.read(s, dir, "embeddings"), k = 4, iters = 2)
      idx
    })

  /** [[cellIndex]] with the PQ half materialized: codes partitioned by
    * cell + stored codebooks — the `q_ann_pq_cell_topk` serving path. */
  private val pqIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, CellIndex]

  private def pqIndex(s: SparkSession, dir: String): CellIndex =
    pqIndexCache.getOrElseUpdate(dir, {
      val idx = cellIndex(s, dir)
      idx.buildPq(m = 4, k = 4, iters = 2)
      idx
    })

  /** Trained PQ codebooks per scale-factor dir. `pqTrain` is
    * deterministic for a given corpus and returns a tiny driver-side
    * list (m·k centroids), so `q_pq_codes` / `q_pq_topk` /
    * `q_ann_ivfpq_topk` share ONE training run and bench passes time
    * the encode/probe legs — the [[cellIndex]] precedent (an index
    * trains once and serves many probes; re-training per probe query
    * both inflates and destabilizes the probe numbers, VERDICT r6 §7:
    * 2.1 s → 3.0 s → 6.4 s drift was retraining under cache-order and
    * contention shifts, not probe regression). */
  private val pqBooksCache = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(Int, Int, Seq[Double])]]

  private def pqBooks(s: SparkSession, dir: String)
      : Seq[(Int, Int, Seq[Double])] =
    pqBooksCache.getOrElseUpdate(dir,
      Similarity.pqTrain(emb(s, dir), m = 4, k = 4, iters = 2))

  /** Trained auto-k quantizer (k = ⌈N/[[SemTargetClusterSize]]⌉) per
    * scale-factor dir (the [[pqBooks]] pattern): `q_semdedup` dedups
    * against a trained clustering, so bench passes time the dedup
    * legs, not re-training. `q_kmeans` deliberately does NOT use this
    * cache — training IS that query's measured work, at its own fixed
    * k=4. */
  private val kmeansModelCache = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(Int, Seq[Double])]]

  private def kmeansModelFor(s: SparkSession, dir: String)
      : Seq[(Int, Seq[Double])] =
    kmeansModelCache.getOrElseUpdate(dir,
      Similarity.kmeansModelAuto(emb(s, dir),
        targetClusterSize = SemTargetClusterSize, iters = 2))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Corpus with planted exact duplicates (10% of docs re-appear under
    * shifted ids) for near-dup candidate generation. The shift is far
    * past any scale factor's doc_id domain so planted ids can never
    * collide with real ones. */
  private def planted(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000000L))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  /** One seeded [[graft.store.NearDupIndex]] per scale-factor dir: the
    * whole corpus bulk-appended as history. `q_neardup_probe` then asks
    * "is this arriving batch a near-dup of anything ever ingested" —
    * the incremental-dedup question a batch-local LSH self-join cannot
    * answer — via the persisted band postings (partition-pruned to the
    * batch's own band-key buckets, never a corpus rescan). */
  private val nearDupProbeCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.store.NearDupIndex]

  private def nearDupProbeIndex(s: SparkSession, dir: String)
      : graft.store.NearDupIndex =
    nearDupProbeCache.getOrElseUpdate(dir, {
      val path = TempDirs.managed("graft-neardup-probe-").toString
      val idx = new graft.store.NearDupIndex(s, path)
      idx.append(docs(s, dir))
      idx
    })

  /** The full incremental lifecycle for `q_neardup_ingest`: two batches
    * ingested in sequence (even doc_ids, then odd doc_ids + planted
    * copies of history docs), each deduped within itself AND against
    * the snapshot the previous commit left behind. */
  private val nearDupIngestCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.store.NearDupIndex]

  private def nearDupIngestIndex(s: SparkSession, dir: String)
      : graft.store.NearDupIndex =
    nearDupIngestCache.getOrElseUpdate(dir, {
      val path = TempDirs.managed("graft-neardup-ingest-").toString
      val idx = new graft.store.NearDupIndex(s, path)
      val d = docs(s, dir)
      idx.ingest(d.filter(col("doc_id") % 2 === 0))
      idx.ingest(d.filter(col("doc_id") % 2 === 1).unionByName(
        d.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000000L)))
      idx
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 60-bit md5 SimHash per document (deduplication: SimHash)
    "q_simhash" -> ((s, dir) =>
      Dedup.simhashMd5(docs(s, dir))
        .select(col("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))),

    // banded-Hamming SimHash candidates over the planted corpus
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairsMd5(planted(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),

    // MinHash-LSH candidate pairs over the planted corpus
    "q_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashCandidates(planted(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),

    // banding-recall measurement (r13): how much of the EXACT word-set
    // Jaccard truth does the MinHash-LSH banding recover, per J decile —
    // the tuning measurement behind every band-width knob. At 100 TB
    // exact truth is uncomputable corpus-wide, so the production shape
    // is exactly this: a deterministic doc sample (doc_id % 5 = 0 —
    // includes every planted copy, so the J=1 decile is populated),
    // exact prefix-filtered Jaccard on the sample as truth, the SAME
    // banding as q_minhash_lsh_pairs as the candidate set, and a
    // per-decile (found / true) table. Integer-exact: the decile is
    // (10*|∩|) div |∪|, counts are counts.
    "q_banding_recall" -> ((s, dir) => {
      val sample = planted(s, dir).filter(col("doc_id") % 5 === 0)
      val truth = Dedup.jaccardSelfJoin(TextQueries.jaccardBase(sample),
        "doc_id", "words", Seq("lang", "size_bucket"), num = 1, den = 4)
      // pairs-only candidates (r17): this query never reads
      // matching_hashes, so the band self-join shuffles (doc_id, band,
      // key) rows without the 8x32-byte signature array — same pair
      // set, same oracle
      val cands = Dedup.minhashCandidatePairs(sample)
        .select(col("doc_a"), col("doc_b"), lit(1).as("__hit"))
      truth.join(cands, Seq("doc_a", "doc_b"), "left")
        .groupBy(expr("(inter_size * 10) div union_size").as("j_decile"))
        .agg(count(lit(1)).as("n_true_pairs"),
          count(col("__hit")).as("n_found"))
        .orderBy(col("j_decile"))
    }),

    // band-width TUNING CURVE (r14, VERDICT r13 #5): the banding-recall
    // measurement swept across the band configurations of the same
    // 8-hash signature — 2 bands x 4 rows, 4x2, 8x1 — emitting per
    // (config, J-decile) recall AND the config's total candidate count,
    // so the band-width knob has a measured recall/cost trade-off table
    // instead of one point. Narrower bands are strictly more permissive
    // (equality of a 4-hash band implies equality of its 2-hash halves),
    // so candidates(2x4) ⊆ candidates(4x2) ⊆ candidates(8x1) — the
    // curve's monotonicity is a BandingCurveSpec invariant, as is
    // recall 1.0 at J=1 for every config (exact TEXT duplicates share
    // all 8 minhashes). Exact truth is computed once on the sample;
    // per-config candidates are pinned so the count and the recall join
    // read one materialization.
    "q_banding_curve" -> ((s, dir) => {
      val sample = planted(s, dir).filter(col("doc_id") % 5 === 0)
      val truth = Dedup.jaccardSelfJoin(TextQueries.jaccardBase(sample),
        "doc_id", "words", Seq("lang", "size_bucket"), num = 1, den = 4)
      // ONE signature build for all three band layouts (r17): the three
      // configs band the SAME 8-hash signature, so the shingle explode +
      // 8 min-aggregates — the expensive corpus-scan leg — runs once
      // into a pin and each config derives its band keys from the
      // pinned columns (before: one full signature build per config,
      // 3x the scan/tokenize/hash work; band keys and so the candidate
      // sets are bit-identical). The pin is released as soon as the
      // three candidate pins are materialized — the per-config pair
      // tables below are what the returned plan reads.
      val sigs = graft.operators.Checkpoints.pin(
        Dedup.minhashSigs(sample, 8))
      val perConfig = try {
        Seq(4, 2, 1).map { rowsPerBand =>
          val bands = 8 / rowsPerBand
          val cands = graft.operators.Checkpoints.pin(
            Dedup.minhashCandidatePairsOfSigs(sigs, 8, rowsPerBand))
          val nCand = cands.agg(count(lit(1)).as("n_candidates"))
          truth.join(cands.withColumn("__hit", lit(1)),
              Seq("doc_a", "doc_b"), "left")
            .groupBy(expr("(inter_size * 10) div union_size").as("j_decile"))
            .agg(count(lit(1)).as("n_true_pairs"),
              count(col("__hit")).as("n_found"))
            .withColumn("bands", lit(bands))
            .withColumn("rows_per_band", lit(rowsPerBand))
            .crossJoin(broadcast(nCand))
        }
      } finally graft.operators.Checkpoints.release(sigs)
      perConfig.reduce(_.unionByName(_))
        .select(col("bands"), col("rows_per_band"), col("j_decile"),
          col("n_true_pairs"), col("n_found"), col("n_candidates"))
        .orderBy(col("bands"), col("j_decile"))
    }),

    // exact edit-distance CONFIRM pass over the MinHash-LSH candidates —
    // the production two-stage fuzzy dedup (sparse LSH candidate
    // generation bounds the pair count; q_ngram_jaccard's blocked join
    // is deliberately permissive and would feed 100× more pairs). The
    // DP is BANDED (threshold 64 → O(L·k) per pair, -1 beyond the band;
    // Spark's 3-arg levenshtein): cost per pair is bounded regardless
    // of document length, and a pair beyond the band is by definition
    // not a near-dup, so the sentinel loses nothing. Two cross-engine
    // traps closed: DuckDB's levenshtein is BYTE-based where Spark's is
    // codepoint-based (hence the printable-ASCII projection, on which
    // the DPs agree), and DuckDB has no banded variant (the oracle
    // computes the full distance and applies the band as a CASE — the
    // exact values the band contract promises)
    "q_edit_distance" -> ((s, dir) => {
      // pairs-only candidates (r17, the q_banding_recall note): the
      // confirm feed never reads matching_hashes, so the band self-join
      // drops the signature array from its shuffle. The normalized-text
      // table is PINNED once: both confirm-join legs consume it, and
      // unpinned each leg re-ran the two regexp_replace passes over the
      // whole planted corpus (the jaccardSelfJoin verify-sets
      // discipline). Pair set, confirm arithmetic, and oracle unchanged.
      val pairs = Dedup.minhashCandidatePairs(planted(s, dir))
      val norm = graft.operators.Checkpoints.pin(
        planted(s, dir).select(col("doc_id"),
          regexp_replace(
            regexp_replace(lower(trim(col("text"))),
              "[ \\t\\n\\x0B\\f\\r]+", " "),
            "[^\\x20-\\x7E]", "").as("__t")))
      pairs
        .join(norm.select(col("doc_id").as("doc_a"), col("__t").as("__ta")),
          Seq("doc_a"))
        .join(norm.select(col("doc_id").as("doc_b"), col("__t").as("__tb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("__ta"), col("__tb"), 64).cast("long")
            .as("edit_dist"),
          greatest(length(col("__ta")), length(col("__tb")), lit(1))
            .cast("double").as("__den"))
        .select(col("doc_a"), col("doc_b"), col("edit_dist"),
          when(col("edit_dist") >= 0L,
            round(lit(1000000.0) *
              (lit(1.0) - col("edit_dist").cast("double") / col("__den")))
              .cast("long"))
            .otherwise(lit(-1L)).as("sim_micro"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // incremental near-dup PROBE: the whole corpus is history (persisted
    // LSH band postings under a versioned manifest); the arriving batch
    // (planted shifted copies) probes it without rescanning or
    // re-signing the corpus — candidates from the band equi-join against
    // only the batch's own key buckets, confirmed with the banded
    // Levenshtein against the stored normalized canonical text
    "q_neardup_probe" -> ((s, dir) => {
      val batch = docs(s, dir).filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000000L)
      // single-partition sort, not a global orderBy: the probe result
      // is tiny (≈ batch size) and a range sort's sampling pass
      // re-executes the un-checkpointed confirm leg
      nearDupProbeIndex(s, dir).probe(batch)
        .repartition(1).sortWithinPartitions(col("doc_id"), col("hist_id"))
    }),

    // incremental near-dup INGEST: two consecutive batches through the
    // full dedup lifecycle (within-batch LSH + confirm + connected
    // components, history collapse into the prior commit's canonicals,
    // atomic postings+verdict commit); emits the persisted per-document
    // verdict table
    "q_neardup_ingest" -> ((s, dir) => {
      nearDupIngestIndex(s, dir).assignments
        .select(col("doc_id"), col("canonical_id"))
        .orderBy(col("doc_id"))
    }),

    // winnowing candidate pairs over the planted corpus: inverted-index
    // join on fingerprint value with a document-frequency cap (the
    // hot-fingerprint guard) — planted re-appearances and genuine
    // substring overlaps both surface
    "q_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(planted(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),

    // winnowing fingerprints (the MOSS local-substring dedup): per-doc
    // sorted distinct window-min gram hashes — any shared substring of
    // length >= k+w-1 shows up as an identical fingerprint in both docs
    "q_winnow" -> ((s, dir) =>
      Dedup.winnow(docs(s, dir))
        .select(col("doc_id"),
          size(col("fingerprints")).as("n_fingerprints"),
          md5(concat_ws(",",
            expr("transform(fingerprints, f -> CAST(f AS STRING))")))
            .as("fp_md5"))
        .orderBy(col("doc_id"))),

    // IVF-style ANN top-k (label cells, nprobe=2) — full-scan variant
    "q_ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), queryIds = Seq(0L, 1L, 2L, 3L, 4L))),

    // ANN top-k via the materialized cell-partitioned index: the
    // candidate scan reads ONLY the probed cells (PartitionFilters:
    // [cell IN (…)]) — the scale path, vs ivfTopK's filtered full scan
    "q_ann_cell_topk" -> ((s, dir) => {
      val idx = cellIndex(s, dir)
      val queries = emb(s, dir)
        .filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L, 3L, 4L)))
        .select(col("vec_id").as("query_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"))
      idx.topK(queries, k = 5, nprobe = 2)
    }),

    // ANN top-k via the LEARNED-cell index: the quantizer is trained by
    // q_kmeans's exact k-means, the corpus laid out by that assignment,
    // and the probe runs the same partition-pruned path as
    // q_ann_cell_topk — train → build → probe end-to-end, hash-gated
    "q_ann_learned_topk" -> ((s, dir) => {
      val idx = learnedIndex(s, dir)
      val queries = emb(s, dir)
        .filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L, 3L, 4L)))
        .select(col("vec_id").as("query_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"))
      idx.topK(queries, k = 5, nprobe = 2)
    }),

    // k-means coarse-quantizer training (k=4, 2 Lloyd rounds,
    // deterministic seeds) — the index-TRAINING step of IVF; outputs
    // per-cluster sizes and micro-integer centroid checksums
    "q_kmeans" -> ((s, dir) =>
      Similarity.kmeans(emb(s, dir), k = 4, iters = 2)
        .select(col("cluster"), col("n_vectors"),
          expr("aggregate(transform(centroid, " +
            "x -> CAST(round(x * 1000000) AS BIGINT)), 0L, " +
            "(acc, x) -> acc + x)").as("centroid_sum_micro"))
        .orderBy(col("cluster"))),

    // SemDeDup: semantic dedup by k-means cluster blocking — every
    // vector with a lower-id cluster-mate above the cosine threshold is
    // dropped (the embedding-space sibling of MinHash near-dup: catches
    // paraphrases that share no shingles). Scale-honest config: k =
    // ceil(N/128) keeps cluster size — and so pair volume per vector —
    // constant as the corpus grows; the oracle runs the same unrolled
    // Lloyd chain as q_kmeans with its seed LIMIT computed by the same
    // ceil-div
    "q_semdedup" -> ((s, dir) =>
      Similarity.semanticDedupWith(emb(s, dir), kmeansModelFor(s, dir),
        thresholdMicro = 300000L)
        .orderBy(col("vec_id"))),

    // product-quantization train + encode (4 subspaces × 4 centroids
    // over the dim-64 embeddings): per-vector codes and total micro
    // quantization error, hash-gated against an oracle that unrolls all
    // four per-subspace Lloyd chains — the PQ half of IVF-PQ
    "q_pq_codes" -> ((s, dir) => {
      val books = pqBooks(s, dir)
      Similarity.pqEncode(emb(s, dir), books).orderBy(col("vec_id"))
    }),

    // PQ asymmetric-distance (ADC) top-k: the encoded corpus ranked
    // against exact query vectors through per-query lookup tables —
    // no stored float is touched, the query-side half of IVF-PQ
    "q_pq_topk" -> ((s, dir) => {
      val books = pqBooks(s, dir)
      Similarity.pqAdcTopK(emb(s, dir), books,
        queryIds = Seq(0L, 1L, 2L), k = 5)
    }),

    // the full IVF-PQ probe: nprobe cells by centroid cosine, then ADC
    // ranking of only the probed cells' encoded vectors — IVF bounds
    // what is read, PQ bounds what is stored and compared
    "q_ann_ivfpq_topk" -> ((s, dir) => {
      val books = pqBooks(s, dir)
      Similarity.ivfPqTopK(emb(s, dir), books,
        queryIds = Seq(0L, 1L, 2L), k = 5, nprobe = 2)
    }),

    // IVF-PQ over the MATERIALIZED index: the probe reads only the
    // probed cells' stored CODES (PartitionFilters on the codes table,
    // m bytes/vector) and ranks by ADC — same oracle as
    // q_ann_ivfpq_topk because the index changes what is read, not
    // the answer (the q_ann_cell_topk precedent)
    "q_ann_pq_cell_topk" -> ((s, dir) => {
      val idx = pqIndex(s, dir)
      val queries = emb(s, dir)
        .filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L)))
        .select(col("vec_id").as("query_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"))
      idx.topKPq(queries, k = 5, nprobe = 2)
    }),

    // IVF-PQ with the exact re-rank leg: ADC shortlists r=10 per query
    // from the stored codes, the shortlist joins back to the STORED
    // float vectors (partition-pruned to probed cells, candidate-bounded
    // by broadcast) for exact cosine, and the final top-5 ranks by the
    // exact scores — quantization error capped at the ranking boundary
    "q_ann_pq_rerank_topk" -> ((s, dir) => {
      val idx = pqIndex(s, dir)
      val queries = emb(s, dir)
        .filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L)))
        .select(col("vec_id").as("query_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"))
      idx.topKPqRerank(queries, k = 5, nprobe = 2, rerank = 10)
    }),

    // random-hyperplane LSH bucket histogram (md5-derived planes)
    "q_hyperplane_lsh" -> ((s, dir) =>
      Similarity.hyperplaneLshMd5(emb(s, dir))
        .groupBy(col("lsh_bucket"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy(col("lsh_bucket"))),

    // multimodal decode(stub) + feature-extract pipeline
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.pipeline(docs(s, dir), Multimodal.decodeStubMd5)),

    // int8 quantization stats: per-vector quantized representation
    "q_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(emb(s, dir))
        .select(col("vec_id"), col("label"),
          expr("CAST(round(vmin * 1000000) AS BIGINT)").as("vmin_micro"),
          expr("CAST(round(vmax * 1000000) AS BIGINT)").as("vmax_micro"),
          expr("aggregate(qvec, 0, (acc, q) -> acc + q)").as("qsum"))
        .orderBy(col("vec_id"))),

    // frame sampling over the synthesized video/audio assets
    "q_frame_sample" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(docs(s, dir)),
        batchPartitions = s.sparkContext.defaultParallelism,
        decoder = Multimodal.decodeStubMd5)
      Multimodal.sampleFrames(feats)
        .orderBy(col("asset_id"), col("frame_idx"))
    }),

    // perceptual aHash of REAL rendered-and-decoded PNGs: block values
    // are md5-derived (oracle-computable), the Spark path goes through
    // genuine PNG encode → ImageIO decode → luminance box means — a
    // codec bug or box-mean drift breaks the hash gate
    "q_image_phash" -> ((s, dir) =>
      Multimodal.imageHashes(
        renderedAssets(s, dir),
        batchPartitions = s.sparkContext.defaultParallelism)
        .repartition(1).sortWithinPartitions(col("asset_id"))),

    // image near-dup pairs over the same rendered corpus: every 10th
    // doc gets a one-block-perturbed copy (the planted() pattern);
    // banded-Hamming join + exact confirm, the image leg of the dedup
    // family finally under the oracle gate
    "q_image_neardup" -> ((s, dir) =>
      Multimodal.imageNearDups(
        renderedAssets(s, dir),
        maxHamming = 8,
        batchPartitions = s.sparkContext.defaultParallelism)
        .repartition(1)
        .sortWithinPartitions(col("asset_a"), col("asset_b"))))

  /** Rendered image corpus per scale-factor dir (the `pqBooks`
    * pattern): the PNG ENCODE of [[imageBlocks]] is corpus
    * preparation — one-time per dir, written to a temp parquet so
    * bench passes measure the real pipeline work (decode → box-mean
    * aHash → banded join), not re-synthesizing the corpus each pass.
    * The decode side stays inside the measured queries. */
  private val imageAssetCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def renderedAssets(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[graft.operators.MediaAsset] = {
    import s.implicits._
    val p = imageAssetCache.getOrElseUpdate(dir, {
      val tmp = TempDirs.managed("graft-imgassets-")
      val out = tmp.resolve("assets").toString
      Multimodal.renderBlockAssets(imageBlocks(s, dir))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(p).as[graft.operators.MediaAsset]
  }

  /** Deterministic image corpus for the aHash oracle gate: one 64-block
    * gray pattern per doc (block i's value = byte i%16 of
    * md5("<doc_id>_<i/16>")), plus a copy of every 10th doc under a
    * +1e9-shifted id with block 0 perturbed by +1 (mod 256) — a
    * near-duplicate that the banded-Hamming join must pair with its
    * original. Block values stay relational so the DuckDB oracle
    * computes the identical aHash with no image codec; the PNG
    * round-trip happens only on the Spark side
    * ([[Multimodal.renderBlockAssets]]). */
  private def imageBlocks(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      col("doc_id").as("asset_id"), col("doc_id").as("orig"),
      lit(0L).as("delta"))
    val copies = docs(s, dir).filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 1000000000L).as("asset_id"),
      col("doc_id").as("orig"), lit(1L).as("delta"))
    base.unionByName(copies)
      .withColumn("blocks", expr(
        """transform(sequence(0, 63), i ->
          |  CAST((CAST(conv(substring(md5(concat(CAST(orig AS STRING), '_',
          |           CAST(i div 16 AS STRING))), i % 16 * 2 + 1, 2), 16, 10)
          |         AS BIGINT)
          |    + IF(i = 0, delta, 0L)) % 256 AS INT))""".stripMargin))
      .select(col("asset_id"), col("blocks"))
  }

  // ---- generated DuckDB oracle SQL -------------------------------------

  /** Planted corpus CTE matching [[planted]]. */
  private val PlantedCte =
    "d AS (\n" +
      "  SELECT doc_id, text FROM documents\n" +
      "  UNION ALL\n" +
      "  SELECT doc_id + 1000000000 AS doc_id, text FROM documents " +
      "WHERE doc_id % 10 = 0)"

  /** tok/votes/sim CTEs computing the 60-bit md5 simhash over `src`,
    * mirroring [[Dedup.simhashMd5]] bit for bit. */
  private def simhashCtes(src: String): String = {
    val votes = (0 until 60)
      .map(j => s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$j")
      .mkString(",\n    ")
    val assembled = (0 until 60)
      .map(j => s"(CASE WHEN v$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)")
      .mkString(" | ")
    s"""tok AS (
       |  SELECT doc_id, ('0x' || substring(md5(token), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS token
       |        FROM $src)),
       |votes AS (
       |  SELECT doc_id,
       |    VOTES
       |  FROM tok GROUP BY doc_id),
       |sim AS (
       |  SELECT doc_id, CAST(ASSEMBLED AS BIGINT) AS simhash FROM votes)"""
      .stripMargin
      .replace("VOTES", votes)
      .replace("ASSEMBLED", assembled)
  }

  /** sh/sig CTEs computing the 8-hash md5 minhash signature over `src`,
    * mirroring [[Dedup.minhashCandidates]] / `q_minhash_sig`. */
  private def minhashCtes(src: String): String = {
    val mins = (0 until 8)
      .map(k => s"list_min(list_transform(shingles, s -> md5(s || '#$k'))) AS h$k")
      .mkString(",\n    ")
    s"""sh AS (
       |  SELECT doc_id,
       |    list_transform(
       |      generate_series(1, greatest(len(w) - 2, 1)),
       |      i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS shingles
       |  FROM (SELECT doc_id,
       |          string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS w
       |        FROM $src)),
       |sig AS (
       |  SELECT doc_id,
       |    MINS
       |  FROM sh)""".stripMargin.replace("MINS", mins)
  }

  /** Shared truth-side CTEs of the banding recall/curve oracles: the
    * planted corpus, its deterministic %5 sample, exact blocked word-set
    * Jaccard truth at J >= 0.25, and the 8-hash minhash signature table
    * (`sig`) over the sample. */
  private val BandingTruthCtes: String = "WITH pl AS (\n" +
    "  SELECT doc_id, text, lang, n_chars FROM documents\n" +
    "  UNION ALL\n" +
    "  SELECT doc_id + 1000000000 AS doc_id, text, lang, n_chars\n" +
    "  FROM documents WHERE doc_id % 10 = 0),\n" +
    "samp AS (SELECT * FROM pl WHERE doc_id % 5 = 0),\n" +
    """ws AS (
      |  SELECT doc_id, lang, CAST(n_chars // 100 AS INT) AS size_bucket,
      |    list_distinct(string_split_regex(lower(trim(text)),
      |      '[ \t\n\x0B\f\r]+')) AS w
      |  FROM samp),
      |truth AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.w, b.w)) AS inter_size,
      |    len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)) AS union_size
      |  FROM ws a JOIN ws b
      |    ON a.lang = b.lang AND a.size_bucket = b.size_bucket
      |   AND a.doc_id < b.doc_id
      |  WHERE 4 * len(list_intersect(a.w, b.w)) >=
      |        len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))),
      |""".stripMargin + minhashCtes("samp")

  /** One banding CTE over `sig`: `8 / rowsPerBand` bands, band b keyed
    * by md5 of its consecutive `rowsPerBand` component hashes — the SQL
    * mirror of [[graft.operators.Dedup.minhashBands]]'s band keys. */
  private def bandedCteSql(name: String, rowsPerBand: Int): String = {
    val bands = 8 / rowsPerBand
    (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(k => s"h${b * rowsPerBand + k}")
      s"  SELECT doc_id, $b AS band, md5(${parts.mkString(" || ")}) AS key FROM sig"
    }.mkString(s"$name AS (\n", "\n  UNION ALL\n", ")")
  }

  /** Per-vector projections onto the md5-derived hyperplanes, mirroring
    * [[Similarity.md5PlaneSigns]]: component (b, d) is −1 iff the first
    * hex char of md5("b:d") is odd. */
  private def hyperplaneProjSql(nbits: Int): String = {
    val projs = (0 until nbits).map { b =>
      s"list_inner_product(v, list_transform(generate_series(1, len(v)), " +
        s"d -> CASE WHEN instr('13579bdf', substring(md5('$b:' || (d - 1)), 1, 1)) > 0 " +
        "THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)) AS p" + b
    }.mkString(",\n    ")
    val bucket = (0 until nbits)
      .map(b => s"(CASE WHEN p$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)")
      .mkString(" | ")
    "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n" +
      "proj AS (\n  SELECT vec_id,\n    " + projs + "\n  FROM base)\n" +
      s"SELECT CAST($bucket AS BIGINT) AS lsh_bucket, count(*) AS n_vectors\n" +
      "FROM proj GROUP BY 1 ORDER BY 1"
  }

  /** Block-value + aHash CTEs mirroring [[imageBlocks]] and the
    * integer box-mean/threshold math of [[Multimodal.perceptualHash]]:
    * over a block-constant 64×64 gray PNG the decoded 8×8 box means
    * ARE the block values, so the oracle computes the identical aHash
    * purely relationally (no image codec in DuckDB). Bit 63 is
    * assembled from the min-BIGINT literal — `1 << 63` overflows
    * DuckDB's checked shift. */
  private val ImagePhashCtes: String =
    """WITH ab AS (
      |  SELECT doc_id AS asset_id, doc_id AS orig, 0 AS delta
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents
      |  WHERE doc_id % 10 = 0),
      |bl AS (
      |  SELECT asset_id, i,
      |    (('0x' || substring(md5(orig::VARCHAR || '_' || (i // 16)),
      |        (i % 16) * 2 + 1, 2))::BIGINT
      |     + CASE WHEN i = 0 THEN delta ELSE 0 END) % 256 AS v
      |  FROM ab CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)),
      |mn AS (
      |  SELECT asset_id, sum(v) // 64 AS mean FROM bl GROUP BY asset_id),
      |ph AS (
      |  SELECT b.asset_id,
      |    CAST(sum(CASE WHEN b.v > m.mean AND b.i < 63
      |                  THEN (1::BIGINT << b.i) ELSE 0 END) AS BIGINT)
      |    | CASE WHEN max(CASE WHEN b.i = 63 AND b.v > m.mean
      |                         THEN 1 ELSE 0 END) = 1
      |           THEN (-9223372036854775807 - 1) ELSE 0::BIGINT END
      |      AS phash
      |  FROM bl b JOIN mn m USING (asset_id)
      |  GROUP BY b.asset_id)""".stripMargin

  /** media-asset CTE mirroring [[Multimodal.assetsFromDocuments]] +
    * [[Multimodal.decodeStubMd5]]. */
  private val FeaturesCte =
    """feat AS (
      |  SELECT asset_id, media_type, n_bytes, content_hash,
      |    CAST(hv % 1920 + 1 AS INT) AS width,
      |    CAST((hv >> 16) % 1080 + 1 AS INT) AS height,
      |    CAST(CASE media_type WHEN 'video' THEN n_bytes % 240 + 1
      |                         WHEN 'audio' THEN n_bytes % 48000 + 1
      |                         ELSE 1 END AS INT) AS n_frames
      |  FROM (
      |    SELECT asset_id, media_type, n_bytes, content_hash,
      |           ('0x' || substring(content_hash, 1, 8))::BIGINT AS hv
      |    FROM (
      |      SELECT doc_id AS asset_id,
      |        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |        strlen(text) AS n_bytes,
      |        md5(text) AS content_hash
      |      FROM documents)))""".stripMargin

  /** Shared ANN oracle mirroring [[Similarity.ivfTopK]] /
    * [[CellIndex.topK]]: micro-quantized BIGINT component sums → one
    * exact division per centroid component → micro-rounded probe and
    * candidate ranks. Both variants compute the same answer (the index
    * changes WHAT IS READ, not the result), so they share this SQL. */
  private val AnnOracle: String = {
    def cos(a: String, b: String) =
      s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * " +
        s"sqrt(list_inner_product($b, $b)))"
    s"""WITH base AS (
       |  SELECT vec_id, label AS cell, embedding::DOUBLE[] AS v
       |  FROM embeddings),
       |comp AS (
       |  SELECT cell, d, CAST(round(v[d] * 1000000) AS BIGINT) AS c_micro
       |  FROM (SELECT cell, v,
       |          unnest(generate_series(1, len(v))) AS d FROM base)),
       |agg AS (
       |  SELECT cell, d,
       |    CAST(sum(c_micro) AS DOUBLE) /
       |      (CAST(count(*) AS DOUBLE) * 1000000.0) AS m
       |  FROM comp GROUP BY cell, d),
       |cents AS (
       |  SELECT cell, list(m ORDER BY d) AS centroid FROM agg GROUP BY cell),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv FROM base
       |  WHERE vec_id IN (0, 1, 2, 3, 4)),
       |probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        CAST(round(${cos("q.qv", "c.centroid")} * 1000000) AS BIGINT)
       |          DESC, c.cell) AS probe_rank
       |    FROM q CROSS JOIN cents c)
       |  WHERE probe_rank <= 2),
       |cand AS (
       |  SELECT p.query_id, b.vec_id AS cand_id, b.cell,
       |    CAST(round(${cos("p.qv", "b.v")} * 1000000) AS BIGINT)
       |      AS cos_sim_micro
       |  FROM probes p JOIN base b
       |    ON b.cell = p.cell AND b.vec_id <> p.query_id)
       |SELECT query_id, cand_id, cell, rank, cos_sim_micro FROM (
       |  SELECT cand.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim_micro DESC, cand_id) AS rank
       |  FROM cand)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Unrolled 2-iteration Lloyd CTE chain mirroring
    * [[Similarity.kmeansModel]] at k=4: seeds = 4 smallest vec_ids;
    * each round = micro-BIGINT argmin assignment (ties by cluster
    * index) + quantize-sum-divide update — every comparison and
    * centroid bit-identical cross-engine. Ends with `c2` (the trained
    * model) and `a3` (the final assignment); [[KmeansOracle]]
    * aggregates them and [[LearnedAnnOracle]] probes them. The k-
    * agnostic chain body lives in [[kmeansCtes]] — only the seed
    * LIMIT carries k, so [[SemKmeansCtes]] reuses the identical
    * unroll at its corpus-dependent k. */
  private val KmeansCtes: String = kmeansCtes("4")

  /** SemDeDup's scale-honest cluster count: k = ⌈N / 128⌉, spelled as
    * the SAME integer ceil-div on both engines (Spark
    * [[Similarity.kmeansModelAuto]], DuckDB dynamic LIMIT below) so the
    * unrolled Lloyd chain trains the identical model at any corpus
    * size. 128-vector target clusters keep within-cluster pair volume
    * LINEAR in the corpus — the battery's previous fixed k=4 grew
    * (N/4)² pairs and could not be profiled at 64×. */
  private val SemTargetClusterSize = 128L

  private val SemKmeansCtes: String = kmeansCtes(
    s"greatest(1, ((SELECT count(*) FROM base) + ${SemTargetClusterSize - 1}) " +
      s"// $SemTargetClusterSize)")

  private def kmeansCtes(limitSql: String): String = {
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    def dist(v: String, c: String) =
      s"CAST(round((${lip(v, v)} - 2 * ${lip(v, c)} + ${lip(c, c)}) " +
        "* 1000000) AS BIGINT)"
    def assignCte(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT b.vec_id, b.v, c.cluster,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        ${dist("b.v", "c.centroid")}, c.cluster) AS rk
         |    FROM base b CROSS JOIN $cents c)
         |  WHERE rk = 1)""".stripMargin
    def updateCte(name: String, assigned: String) =
      s"""$name AS (
         |  SELECT cluster, list(m ORDER BY d) AS centroid FROM (
         |    SELECT cluster, d,
         |      CAST(sum(cm) AS DOUBLE) /
         |        (CAST(count(*) AS DOUBLE) * 1000000.0) AS m
         |    FROM (SELECT cluster, d,
         |            CAST(round(v[d] * 1000000) AS BIGINT) AS cm
         |          FROM (SELECT cluster, v,
         |                  unnest(generate_series(1, len(v))) AS d
         |                FROM $assigned))
         |    GROUP BY cluster, d)
         |  GROUP BY cluster)""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
       |           AS cluster,
       |         v AS centroid
       |  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT $limitSql)),
       |${assignCte("a1", "c0")},
       |${updateCte("c1", "a1")},
       |${assignCte("a2", "c1")},
       |${updateCte("c2", "a2")},
       |${assignCte("a3", "c2")}""".stripMargin
  }

  private val KmeansOracle: String =
    s"""$KmeansCtes
       |SELECT f.cluster, f.n_vectors, s.centroid_sum_micro
       |FROM (SELECT cluster, count(*) AS n_vectors FROM a3
       |      GROUP BY cluster) f
       |JOIN (SELECT cluster,
       |        CAST(list_sum(list_transform(centroid,
       |          x -> round(x * 1000000))) AS BIGINT) AS centroid_sum_micro
       |      FROM c2) s USING (cluster)
       |ORDER BY cluster""".stripMargin

  /** Per-subspace Lloyd chains + encode CTEs for the PQ oracles,
    * mirroring [[Similarity.pqTrain]]/[[Similarity.pqEncode]] (m
    * subspaces of dim/m contiguous components, k centroids, 2 unrolled
    * iterations — the [[KmeansCtes]] discipline per slice). Ends with
    * `enc_<j>` CTEs carrying each vector's winning (code_j, d_j). */
  private def pqCtes(m: Int, k: Int, dim: Int): String = {
    val sub = dim / m
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    def dist(v: String, c: String) =
      s"CAST(round((${lip(v, v)} - 2 * ${lip(v, c)} + ${lip(c, c)}) " +
        "* 1000000) AS BIGINT)"
    def assignCte(name: String, base: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT b.vec_id, b.v, c.cluster,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        ${dist("b.v", "c.centroid")}, c.cluster) AS rk
         |    FROM $base b CROSS JOIN $cents c)
         |  WHERE rk = 1)""".stripMargin
    def updateCte(name: String, assigned: String) =
      s"""$name AS (
         |  SELECT cluster, list(m ORDER BY d) AS centroid FROM (
         |    SELECT cluster, d,
         |      CAST(sum(cm) AS DOUBLE) /
         |        (CAST(count(*) AS DOUBLE) * 1000000.0) AS m
         |    FROM (SELECT cluster, d,
         |            CAST(round(v[d] * 1000000) AS BIGINT) AS cm
         |          FROM (SELECT cluster, v,
         |                  unnest(generate_series(1, len(v))) AS d
         |                FROM $assigned))
         |    GROUP BY cluster, d)
         |  GROUP BY cluster)""".stripMargin
    val chains = (0 until m).map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      s"""sbase_$j AS (
         |  SELECT vec_id, v[$lo:$hi] AS v FROM pqb),
         |sc0_$j AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
         |           AS cluster,
         |         v AS centroid
         |  FROM (SELECT vec_id, v FROM sbase_$j ORDER BY vec_id LIMIT $k)),
         |${assignCte(s"sa1_$j", s"sbase_$j", s"sc0_$j")},
         |${updateCte(s"sc1_$j", s"sa1_$j")},
         |${assignCte(s"sa2_$j", s"sbase_$j", s"sc1_$j")},
         |${updateCte(s"sc2_$j", s"sa2_$j")},
         |enc_$j AS (
         |  SELECT vec_id, cluster AS code_$j, dd AS d_$j FROM (
         |    SELECT b.vec_id, c.cluster,
         |      ${dist("b.v", "c.centroid")} AS dd,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        ${dist("b.v", "c.centroid")}, c.cluster) AS rk
         |    FROM sbase_$j b CROSS JOIN sc2_$j c)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pqb AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$chains""".stripMargin
  }

  private val PqCodesOracle: String = {
    val m = 4
    val joins = (1 until m)
      .map(j => s"JOIN enc_$j USING (vec_id)").mkString(" ")
    val codes = (0 until m).map(j => s"code_$j").mkString(", ")
    val err = (0 until m).map(j => s"d_$j").mkString(" + ")
    s"""${pqCtes(m, 4, 64)}
       |SELECT vec_id, $codes, CAST($err AS BIGINT) AS err_micro
       |FROM enc_0 $joins
       |ORDER BY vec_id""".stripMargin
  }

  private val PqTopkOracle: String = {
    val m = 4
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    def dist(v: String, c: String) =
      s"CAST(round((${lip(v, v)} - 2 * ${lip(v, c)} + ${lip(c, c)}) " +
        "* 1000000) AS BIGINT)"
    val luts = (0 until m).map { j =>
      s"""lut_$j AS (
         |  SELECT q.vec_id AS query_id, c.cluster,
         |    ${dist("q.v", "c.centroid")} AS d
         |  FROM (SELECT vec_id, v FROM sbase_$j
         |        WHERE vec_id IN (0, 1, 2)) q
         |  CROSS JOIN sc2_$j c)""".stripMargin
    }.mkString(",\n")
    val encJoins = (1 until m)
      .map(j => s"JOIN enc_$j e$j USING (vec_id)").mkString(" ")
    val lutJoins = (0 until m).map { j =>
      val qj = if (j == 0) "" else s"l$j.query_id = l0.query_id AND "
      s"JOIN lut_$j l$j ON ${qj}l$j.cluster = code_$j"
    }.mkString(" ")
    val adcSum = (0 until m).map(j => s"l$j.d").mkString(" + ")
    s"""${pqCtes(m, 4, 64)},
       |$luts,
       |adc AS (
       |  SELECT l0.query_id, e0.vec_id AS cand_id,
       |    CAST($adcSum AS BIGINT) AS adc_micro
       |  FROM enc_0 e0 $encJoins $lutJoins
       |  WHERE e0.vec_id <> l0.query_id)
       |SELECT query_id, cand_id, rank, adc_micro FROM (
       |  SELECT adc.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_micro, cand_id) AS rank
       |  FROM adc)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-PQ oracle: [[AnnOracle]]'s cell-centroid probe router composed
    * with [[pqCtes]]'s codebooks/codes — candidates come from the
    * probed cells only and are ranked by ADC distance through the same
    * per-(query, subspace, cluster) lookup rows as [[PqTopkOracle]]. */
  /** WITH-body shared by the IVF-PQ oracles: training, encoding, cell
    * layout, probe routing, per-query LUTs, and the `adc`
    * candidate-distance CTE — the tails differ only in how the final
    * ranking consumes `adc` (pure ADC vs exact re-rank). */
  private val IvfPqAdcCtes: String = {
    val m = 4
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    def cos(a: String, b: String) =
      s"${lip(a, b)} / (sqrt(${lip(a, a)}) * sqrt(${lip(b, b)}))"
    def dist(v: String, c: String) =
      s"CAST(round((${lip(v, v)} - 2 * ${lip(v, c)} + ${lip(c, c)}) " +
        "* 1000000) AS BIGINT)"
    val luts = (0 until m).map { j =>
      s"""lut_$j AS (
         |  SELECT q.vec_id AS query_id, c.cluster,
         |    ${dist("q.v", "c.centroid")} AS d
         |  FROM (SELECT vec_id, v FROM sbase_$j
         |        WHERE vec_id IN (0, 1, 2)) q
         |  CROSS JOIN sc2_$j c)""".stripMargin
    }.mkString(",\n")
    val encJoins = (1 until m)
      .map(j => s"JOIN enc_$j USING (vec_id)").mkString(" ")
    val lutJoins = (0 until m).map(j =>
      s"JOIN lut_$j l$j ON l$j.query_id = p.query_id " +
        s"AND l$j.cluster = cc.code_$j").mkString(" ")
    val adcSum = (0 until m).map(j => s"l$j.d").mkString(" + ")
    s"""${pqCtes(m, 4, 64)},
       |cellb AS (
       |  SELECT vec_id, label AS cell, embedding::DOUBLE[] AS v
       |  FROM embeddings),
       |comp AS (
       |  SELECT cell, d, CAST(round(v[d] * 1000000) AS BIGINT) AS c_micro
       |  FROM (SELECT cell, v,
       |          unnest(generate_series(1, len(v))) AS d FROM cellb)),
       |agg AS (
       |  SELECT cell, d,
       |    CAST(sum(c_micro) AS DOUBLE) /
       |      (CAST(count(*) AS DOUBLE) * 1000000.0) AS m
       |  FROM comp GROUP BY cell, d),
       |cents AS (
       |  SELECT cell, list(m ORDER BY d) AS centroid FROM agg GROUP BY cell),
       |qq AS (
       |  SELECT vec_id AS query_id, v AS qv FROM cellb
       |  WHERE vec_id IN (0, 1, 2)),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT qq.query_id, c.cell,
       |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
       |        CAST(round(${cos("qq.qv", "c.centroid")} * 1000000) AS BIGINT)
       |          DESC, c.cell) AS probe_rank
       |    FROM qq CROSS JOIN cents c)
       |  WHERE probe_rank <= 2),
       |$luts,
       |cellcodes AS (
       |  SELECT vec_id, cb.cell, ${(0 until m).map(j => s"code_$j").mkString(", ")}
       |  FROM enc_0 $encJoins JOIN cellb cb USING (vec_id)),
       |adc AS (
       |  SELECT p.query_id, cc.vec_id AS cand_id, cc.cell,
       |    CAST($adcSum AS BIGINT) AS adc_micro
       |  FROM probes p
       |  JOIN cellcodes cc ON cc.cell = p.cell AND cc.vec_id <> p.query_id
       |  $lutJoins)""".stripMargin
  }

  private val IvfPqOracle: String =
    s"""$IvfPqAdcCtes
       |SELECT query_id, cand_id, cell, rank, adc_micro FROM (
       |  SELECT adc.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_micro, cand_id) AS rank
       |  FROM adc)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Re-rank oracle: ADC shortlists r=10 per query from the same `adc`
    * CTE, then the shortlist joins back to the float vectors for exact
    * cosine and the final rank comes from the exact scores — the DuckDB
    * mirror of [[graft.operators.CellIndex.topKPqRerank]]. */
  private val IvfPqRerankOracle: String = {
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    def cos(a: String, b: String) =
      s"${lip(a, b)} / (sqrt(${lip(a, a)}) * sqrt(${lip(b, b)}))"
    s"""$IvfPqAdcCtes,
       |shortlist AS (
       |  SELECT query_id, cand_id, cell FROM (
       |    SELECT adc.*, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_micro, cand_id) AS adc_rank
       |    FROM adc)
       |  WHERE adc_rank <= 10),
       |rer AS (
       |  SELECT s.query_id, s.cand_id, s.cell,
       |    CAST(round(${cos("q.qv", "v.v")} * 1000000) AS BIGINT)
       |      AS cos_sim_micro
       |  FROM shortlist s
       |  JOIN qq q ON q.query_id = s.query_id
       |  JOIN cellb v ON v.vec_id = s.cand_id)
       |SELECT query_id, cand_id, cell, rank, cos_sim_micro FROM (
       |  SELECT rer.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim_micro DESC, cand_id) AS rank
       |  FROM rer)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Learned-cell ANN oracle: [[KmeansCtes]]'s trained model `c2` is the
    * probe router and its final assignment `a3` the cell layout —
    * exactly what [[CellIndex.buildLearned]] materializes — then the
    * probe/rank logic of [[AnnOracle]] verbatim on top. */
  private val LearnedAnnOracle: String = {
    def cos(a: String, b: String) =
      s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * " +
        s"sqrt(list_inner_product($b, $b)))"
    s"""$KmeansCtes,
       |celled AS (
       |  SELECT vec_id, cluster AS cell, v FROM a3),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv FROM base
       |  WHERE vec_id IN (0, 1, 2, 3, 4)),
       |probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.cluster AS cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        CAST(round(${cos("q.qv", "c.centroid")} * 1000000) AS BIGINT)
       |          DESC, c.cluster) AS probe_rank
       |    FROM q CROSS JOIN c2 c)
       |  WHERE probe_rank <= 2),
       |cand AS (
       |  SELECT p.query_id, b.vec_id AS cand_id, b.cell,
       |    CAST(round(${cos("p.qv", "b.v")} * 1000000) AS BIGINT)
       |      AS cos_sim_micro
       |  FROM probes p JOIN celled b
       |    ON b.cell = p.cell AND b.vec_id <> p.query_id)
       |SELECT query_id, cand_id, cell, rank, cos_sim_micro FROM (
       |  SELECT cand.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim_micro DESC, cand_id) AS rank
       |  FROM cand)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q_ann_ivf_topk" -> AnnOracle,

    "q_ann_cell_topk" -> AnnOracle,

    "q_ann_learned_topk" -> LearnedAnnOracle,

    "q_kmeans" -> KmeansOracle,

    "q_semdedup" -> (SemKmeansCtes +
      """, sd_dup AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM a3 a JOIN a3 b
        |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE CAST(round(list_inner_product(a.v, b.v) /
        |      (sqrt(list_inner_product(a.v, a.v)) *
        |       sqrt(list_inner_product(b.v, b.v))) * 1000000) AS BIGINT)
        |    > 300000)
        |SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS is_kept
        |FROM a3 a LEFT JOIN sd_dup d ON a.vec_id = d.vec_id
        |ORDER BY a.vec_id""".stripMargin),

    "q_pq_codes" -> PqCodesOracle,

    "q_pq_topk" -> PqTopkOracle,

    "q_ann_ivfpq_topk" -> IvfPqOracle,

    // the materialized-index twin shares the oracle: partition-pruned
    // reads change I/O, not results
    "q_ann_pq_cell_topk" -> IvfPqOracle,
    "q_ann_pq_rerank_topk" -> IvfPqRerankOracle,

    "q_simhash" -> ("WITH " + simhashCtes("documents") +
      "\nSELECT doc_id, simhash FROM sim ORDER BY doc_id"),

    "q_simhash_pairs" -> ("WITH " + PlantedCte + ",\n" + simhashCtes("d") +
      """,
        |banded AS (
        |  SELECT doc_id, simhash, b.band,
        |         (simhash >> (b.band * 15)) & 32767 AS key
        |  FROM sim CROSS JOIN
        |       (SELECT unnest(generate_series(0, 3)) AS band) b)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin),

    "q_minhash_lsh_pairs" -> ("WITH " + PlantedCte + ",\n" + minhashCtes("d") +
      (",\nbanded AS (\n" +
        "  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2 || h3) AS key FROM sig\n" +
        "  UNION ALL\n" +
        "  SELECT doc_id, 1 AS band, md5(h4 || h5 || h6 || h7) AS key FROM sig)\n" +
        "SELECT DISTINCT p.doc_a, p.doc_b,\n  (" +
        (0 until 8).map(k => s"(CASE WHEN sa.h$k = sb.h$k THEN 1 ELSE 0 END)")
          .mkString(" + ") + ") AS matching_hashes\n" +
        "FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n" +
        "      FROM banded a JOIN banded b\n" +
        "        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id) p\n" +
        "JOIN sig sa ON sa.doc_id = p.doc_a\n" +
        "JOIN sig sb ON sb.doc_id = p.doc_b\n" +
        "ORDER BY doc_a, doc_b")),

    // truth = exact blocked word-set Jaccard on the % 5 sample (DuckDB
    // computes it all-pairs — fine at oracle scale; Spark uses the
    // prefix-filtered join, same answer by the lossless lemma);
    // candidates = the same banding as q_minhash_lsh_pairs over the
    // same sample; one left join + decile aggregate
    "q_banding_recall" -> (BandingTruthCtes +
      s""",
        |${bandedCteSql("banded", 4)},
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT CAST((t.inter_size * 10) // t.union_size AS BIGINT) AS j_decile,
        |  COUNT(*) AS n_true_pairs,
        |  COUNT(c.doc_a) AS n_found
        |FROM truth t LEFT JOIN cand c
        |  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // the tuning-curve sweep: same truth, three band configurations,
    // per-config recall deciles + total candidate count
    "q_banding_curve" -> (BandingTruthCtes + ",\n" +
      Seq(4, 2, 1).map { r =>
        s"""${bandedCteSql(s"banded_$r", r)},
           |cand_$r AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM banded_$r a JOIN banded_$r b
           |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""
          .stripMargin
      }.mkString(",\n") + "\n" +
      Seq(4, 2, 1).map { r =>
        s"""SELECT CAST(${8 / r} AS INT) AS bands,
           |  CAST($r AS INT) AS rows_per_band,
           |  CAST((t.inter_size * 10) // t.union_size AS BIGINT) AS j_decile,
           |  COUNT(*) AS n_true_pairs,
           |  COUNT(c.doc_a) AS n_found,
           |  (SELECT COUNT(*) FROM cand_$r) AS n_candidates
           |FROM truth t LEFT JOIN cand_$r c
           |  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
           |GROUP BY 1, 2, 3""".stripMargin
      }.mkString("\nUNION ALL\n") +
      "\nORDER BY bands, j_decile"),

    // the LSH band join of q_minhash_lsh_pairs feeding the banded
    // levenshtein confirm; ASCII projection + CASE band as in the
    // Spark side's comment
    "q_edit_distance" -> ("WITH " + PlantedCte + ",\n" + minhashCtes("d") +
      """,
        |banded AS (
        |  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2 || h3) AS key FROM sig
        |  UNION ALL
        |  SELECT doc_id, 1 AS band, md5(h4 || h5 || h6 || h7) AS key FROM sig),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |norm AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |      '[^\x20-\x7E]', '', 'g') AS t
        |  FROM d),
        |dd AS (
        |  SELECT p.doc_a, p.doc_b,
        |    levenshtein(na.t, nb.t) AS full_dist,
        |    greatest(length(na.t), length(nb.t), 1) AS den
        |  FROM pairs p
        |  JOIN norm na ON p.doc_a = na.doc_id
        |  JOIN norm nb ON p.doc_b = nb.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(CASE WHEN full_dist <= 64 THEN full_dist ELSE -1 END
        |    AS BIGINT) AS edit_dist,
        |  CAST(CASE WHEN full_dist <= 64 THEN
        |    round(1000000.0 * (1.0 - CAST(full_dist AS DOUBLE) / den))
        |    ELSE -1 END AS BIGINT) AS sim_micro
        |FROM dd
        |ORDER BY doc_a, doc_b""".stripMargin),

    // the persisted-index probe: band postings over the WHOLE corpus as
    // history, planted shifted copies as the arriving batch — candidate
    // generation is the band equi-join (batch side >= 1e9, history side
    // < 1e9), the confirm the same ASCII-projected banded levenshtein
    // as q_edit_distance, over text truncated to the index's stored
    // normChars (4000)
    "q_neardup_probe" -> ("WITH " + PlantedCte + ",\n" + minhashCtes("d") +
      """,
        |banded AS (
        |  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2 || h3) AS key FROM sig
        |  UNION ALL
        |  SELECT doc_id, 1 AS band, md5(h4 || h5 || h6 || h7) AS key FROM sig),
        |pairs AS (
        |  SELECT DISTINCT p.doc_id, h.doc_id AS hist_id
        |  FROM banded p JOIN banded h ON p.band = h.band AND p.key = h.key
        |  WHERE p.doc_id >= 1000000000 AND h.doc_id < 1000000000),
        |norm AS (
        |  SELECT doc_id, substring(regexp_replace(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |    '[^\x20-\x7E]', '', 'g'), 1, 4000) AS t
        |  FROM d),
        |dd AS (
        |  SELECT p.doc_id, p.hist_id, levenshtein(na.t, nb.t) AS full_dist,
        |    greatest(length(na.t), length(nb.t), 1) AS den
        |  FROM pairs p JOIN norm na ON p.doc_id = na.doc_id
        |               JOIN norm nb ON p.hist_id = nb.doc_id)
        |SELECT doc_id, hist_id, CAST(full_dist AS BIGINT) AS edit_dist,
        |  CAST(round(1000000.0 * (1.0 - CAST(full_dist AS DOUBLE) / den))
        |    AS BIGINT) AS sim_micro
        |FROM dd WHERE full_dist <= 64
        |ORDER BY doc_id, hist_id""".stripMargin),

    // the two-batch incremental lifecycle replayed in SQL: batch 1
    // (even ids) clusters within itself (band join -> levenshtein
    // confirm -> recursive min-label closure); batch 2 (odd ids +
    // planted copies) first collapses into batch-1 CANONICALS it
    // confirms against (postings exist only for canonicals), then
    // clusters among itself; a cluster takes the smallest matched
    // history canonical, else its smallest member
    "q_neardup_ingest" -> ("WITH RECURSIVE\n" +
      """d AS (SELECT doc_id, text FROM documents),
        |b1 AS (SELECT doc_id, text FROM d WHERE doc_id % 2 = 0),
        |b2 AS (SELECT doc_id, text FROM d WHERE doc_id % 2 = 1
        |       UNION ALL
        |       SELECT doc_id + 1000000000 AS doc_id, text FROM d
        |       WHERE doc_id % 10 = 0),
        |allb AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        |""".stripMargin + minhashCtes("allb") +
      """,
        |banded AS (
        |  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2 || h3) AS key FROM sig
        |  UNION ALL
        |  SELECT doc_id, 1 AS band, md5(h4 || h5 || h6 || h7) AS key FROM sig),
        |norm AS (
        |  SELECT doc_id, substring(regexp_replace(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |    '[^\x20-\x7E]', '', 'g'), 1, 4000) AS t
        |  FROM allb),
        |ec1 AS (
        |  SELECT e.doc_a, e.doc_b FROM (
        |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |    FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
        |    JOIN b1 x ON a.doc_id = x.doc_id
        |    JOIN b1 y ON b.doc_id = y.doc_id
        |    WHERE a.doc_id < b.doc_id) e
        |  JOIN norm na ON e.doc_a = na.doc_id
        |  JOIN norm nb ON e.doc_b = nb.doc_id
        |  WHERE levenshtein(na.t, nb.t) <= 64),
        |edges1 AS (SELECT doc_a, doc_b FROM ec1
        |           UNION SELECT doc_b, doc_a FROM ec1),
        |reach1(doc, other) AS (
        |  SELECT doc_id, doc_id FROM b1
        |  UNION SELECT doc_a, doc_b FROM edges1
        |  UNION SELECT r.doc, e.doc_b FROM reach1 r
        |        JOIN edges1 e ON r.other = e.doc_a),
        |a1 AS (SELECT doc AS doc_id, min(other) AS canonical_id
        |       FROM reach1 GROUP BY doc),
        |canon1 AS (SELECT doc_id FROM a1 WHERE doc_id = canonical_id),
        |hist2 AS (
        |  SELECT h.doc_id, min(h.hist_id) AS hc FROM (
        |    SELECT DISTINCT p.doc_id, c.doc_id AS hist_id
        |    FROM banded p JOIN banded c ON p.band = c.band AND p.key = c.key
        |    JOIN b2 y ON p.doc_id = y.doc_id
        |    JOIN canon1 cc ON c.doc_id = cc.doc_id) h
        |  JOIN norm na ON h.doc_id = na.doc_id
        |  JOIN norm nb ON h.hist_id = nb.doc_id
        |  WHERE levenshtein(na.t, nb.t) <= 64 AND h.doc_id <> h.hist_id
        |  GROUP BY h.doc_id),
        |ec2 AS (
        |  SELECT e.doc_a, e.doc_b FROM (
        |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |    FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
        |    JOIN b2 x ON a.doc_id = x.doc_id
        |    JOIN b2 y ON b.doc_id = y.doc_id
        |    WHERE a.doc_id < b.doc_id) e
        |  JOIN norm na ON e.doc_a = na.doc_id
        |  JOIN norm nb ON e.doc_b = nb.doc_id
        |  WHERE levenshtein(na.t, nb.t) <= 64),
        |edges2 AS (SELECT doc_a, doc_b FROM ec2
        |           UNION SELECT doc_b, doc_a FROM ec2),
        |reach2(doc, other) AS (
        |  SELECT doc_id, doc_id FROM b2
        |  UNION SELECT doc_a, doc_b FROM edges2
        |  UNION SELECT r.doc, e.doc_b FROM reach2 r
        |        JOIN edges2 e ON r.other = e.doc_a),
        |cc2 AS (SELECT doc AS doc_id, min(other) AS cluster_id
        |        FROM reach2 GROUP BY doc),
        |ch2 AS (SELECT c.cluster_id, min(h.hc) AS ch
        |        FROM cc2 c LEFT JOIN hist2 h ON c.doc_id = h.doc_id
        |        GROUP BY c.cluster_id),
        |a2 AS (SELECT c.doc_id, COALESCE(ch.ch, c.cluster_id) AS canonical_id
        |       FROM cc2 c JOIN ch2 ch ON c.cluster_id = ch.cluster_id)
        |SELECT doc_id, canonical_id
        |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        |ORDER BY doc_id""".stripMargin),

    "q_hyperplane_lsh" -> hyperplaneProjSql(12),

    // planted corpus, k=8/w=4, df cap 20, >= 3 shared fingerprints
    "q_winnow_pairs" ->
      ("""WITH """ + PlantedCte + """,
        |norm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM d),
        |grams AS (
        |  SELECT doc_id, list_transform(generate_series(1, length(t) - 7),
        |      i -> ('0x' || substring(md5(substring(t, i, 8)), 1, 15))::BIGINT)
        |    AS g
        |  FROM norm WHERE length(t) >= 8),
        |fp AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |      generate_series(1, len(g) - 3), j -> list_min(g[j : j + 3]))) AS f
        |  FROM grams WHERE len(g) >= 4),
        |ex AS (SELECT doc_id, unnest(f) AS fp FROM fp),
        |rare AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) <= 20)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS INT) AS shared_fingerprints
        |FROM (SELECT * FROM ex JOIN rare USING (fp)) a
        |JOIN (SELECT * FROM ex JOIN rare USING (fp)) b USING (fp)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3
        |ORDER BY doc_a, doc_b""").stripMargin,

    // k=8 char grams, w=4 windows; coalesce: DuckDB array_to_string of
    // an empty list is NULL where Spark concat_ws gives ''
    "q_winnow" ->
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, CASE WHEN length(t) < 8 THEN CAST([] AS BIGINT[])
        |    ELSE list_transform(generate_series(1, length(t) - 8 + 1),
        |      i -> ('0x' || substring(md5(substring(t, i, 8)), 1, 15))::BIGINT)
        |    END AS g
        |  FROM norm),
        |fp AS (
        |  SELECT doc_id, CASE WHEN len(g) < 4 THEN CAST([] AS BIGINT[])
        |    ELSE list_sort(list_distinct(list_transform(
        |      generate_series(1, len(g) - 4 + 1),
        |      j -> list_min(g[j : j + 3])))) END AS f
        |  FROM grams)
        |SELECT doc_id, CAST(len(f) AS INT) AS n_fingerprints,
        |  md5(coalesce(array_to_string(f, ','), '')) AS fp_md5
        |FROM fp ORDER BY doc_id""".stripMargin,

    "q_image_phash" -> (ImagePhashCtes +
      "\nSELECT asset_id, phash FROM ph ORDER BY asset_id"),

    "q_image_neardup" -> (ImagePhashCtes + """,
      |banded AS (
      |  SELECT asset_id, phash, b.band,
      |    CASE WHEN b.band < 8
      |      THEN (phash >> (b.band * 7)) & 127
      |      ELSE (phash >> 56) & 255 END AS key
      |  FROM ph CROSS JOIN
      |    (SELECT unnest(generate_series(0, 8)) AS band) b),
      |cand AS (
      |  SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
      |    CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key
      |   AND a.asset_id < b.asset_id)
      |SELECT asset_a, asset_b, hamming FROM cand
      |WHERE hamming <= 8 ORDER BY asset_a, asset_b""".stripMargin),

    "q_multimodal_features" -> ("WITH " + FeaturesCte +
      "\nSELECT asset_id, media_type, n_bytes, content_hash, width, height, " +
      "n_frames\nFROM feat ORDER BY asset_id"),

    "q_frame_sample" -> ("WITH " + FeaturesCte +
      """
        |SELECT asset_id, media_type, n_frames, frame_idx,
        |       md5(content_hash || ':' || frame_idx) AS frame_stub
        |FROM (
        |  SELECT asset_id, media_type, n_frames, content_hash,
        |    unnest(list_distinct(list_transform(generate_series(0, 3),
        |      i -> CAST(floor(i * n_frames / 4) AS INT)))) AS frame_idx
        |  FROM feat WHERE media_type IN ('video', 'audio'))
        |ORDER BY asset_id, frame_idx""".stripMargin),

    "q_quantize_int8" ->
      """WITH base AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |mm AS (
        |  SELECT vec_id, label, v,
        |         list_min(v) AS vmin, list_max(v) AS vmax FROM base),
        |q AS (
        |  SELECT vec_id, label, v, vmin, vmax,
        |    CASE WHEN vmax = vmin THEN CAST(1 AS DOUBLE)
        |         ELSE (vmax - vmin) / 255 END AS scale
        |  FROM mm)
        |SELECT vec_id, label,
        |  CAST(round(vmin * 1000000) AS BIGINT) AS vmin_micro,
        |  CAST(round(vmax * 1000000) AS BIGINT) AS vmax_micro,
        |  CAST(list_sum(list_transform(v,
        |    x -> CAST(round((x - vmin) / scale) - 128 AS BIGINT))) AS BIGINT)
        |    AS qsum
        |FROM q ORDER BY vec_id""".stripMargin)
}
