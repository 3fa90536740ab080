package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.SpanDedup

/** Persistent token-gram index for INCREMENTAL exact-substring dedup at
  * ingestion: each arriving batch's duplicated SPANS are found against
  * everything ever ingested by probing a persisted gram table — never by
  * rescanning or re-tokenizing the corpus — and the batch's new grams
  * are registered for the next batch. This is the span-level member of
  * the incremental-dedup family: [[FingerprintIndex]] catches byte-exact
  * document repeats, [[NearDupIndex]] catches lightly-edited document
  * copies, and this catches VERBATIM REGIONS (boilerplate, license
  * headers, quoted passages) that recur inside otherwise-novel
  * documents — the batch-local [[graft.operators.SpanDedup]] sees none
  * of them when the other copy arrived weeks earlier. (The reference has
  * no dedup beyond response-level id dedup,
  * `api/datalake_api/querier.py:153-163`; this is part of the
  * training-data-pipeline surface the engine adds on top.)
  *
  * Stored rows: (k, doc_id, bucket) — one row per DISTINCT w-gram md5,
  * owned by the smallest document id that first registered it,
  * partitioned into `buckets` md5-prefix cells. Honest cost note: an
  * exact-substring index is O(corpus tokens) keys — ~40 bytes per token
  * position, the same order as Lee et al. 2022's 8-bytes-per-token
  * suffix array, and unlike the document-level indexes it is NOT tiny
  * relative to the corpus. What makes it workable at 100 TB is that no
  * operation ever reads all of it: a batch probe/ingest reads ONLY the
  * bucket partitions its own gram keys land in, then Bloom-prefilters
  * that scan down to the batch's possible matches (see
  * [[prunedHistory]] — the layer that keeps per-batch cost proportional
  * to the batch once bucket pruning saturates), ships 32-char keys
  * (never text), and the within-batch legs aggregate map-side first.
  *
  * A batch position is flagged duplicated when its gram
  *   - occurs in >= 2 distinct documents of the batch itself (the
  *     batch-local [[SpanDedup]] criterion), or
  *   - exists in history under a DIFFERENT owner document.
  * The owner-inequality is what makes whole-batch replays (crash retry,
  * at-least-once delivery) emit the IDENTICAL spans: a replayed batch
  * finds its grams owned by its own docs — no self-hits, the
  * within-batch leg re-derives the rest — and registers nothing (empty
  * anti-join => no commit). Replay stability is per whole batch, the
  * at-least-once delivery unit; re-ingesting a single doc of an old
  * batch on its own is a different stream, not a replay.
  *
  * Concurrency: versioned-manifest table ([[ManifestLog]]) — ingest
  * writes an immutable bucket-partitioned data dir and advances the
  * manifest through the commit-CAS retry loop, like the record/latest/
  * fingerprint stores. Spans are computed against the PINNED pre-ingest
  * snapshot, so recomputing the returned DataFrame after the commit
  * yields the same rows.
  */
final class GramIndex(spark: SparkSession, path: String,
    w: Int = 8,
    buckets: Int = 256,
    keepVersions: Int = 3,
    committer: Option[ManifestCommitter] = None,
    bloomMaxKeys: Long = 4000000L,
    bloomMinHistoryRatio: Long = 8L) {

  require(w >= 1, s"w must be >= 1, got $w")
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  require(bloomMaxKeys >= 0, s"bloomMaxKeys must be >= 0, got $bloomMaxKeys")
  require(bloomMinHistoryRatio >= 0,
    s"bloomMinHistoryRatio must be >= 0, got $bloomMinHistoryRatio")

  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private lazy val f = Fs.fs(spark, path)

  private def bucketCol(k: Column): Column =
    pmod(conv(substring(k, 1, 8), 16, 10).cast("long"), lit(buckets))
      .cast("int")

  private def configMarker = new Path(path, "_gramindex")

  /** Persist-or-validate (buckets, w): the stored partitioning is only
    * consultable with the modulus it was written under, and a different
    * w changes gram IDENTITY — probing an index built at another width
    * would silently miss every historical duplicate. */
  /** Validate (write paths: or create) the parameter marker.
    * `createIfMissing = false` is the READ-ONLY contract for [[probe]]:
    * probing a virgin store must not pin the PROBER's parameters as the
    * store's permanent identity — that locks out a differently-tuned
    * writer arriving later — and must work on a read-only filesystem. */
  private def ensureConfig(createIfMissing: Boolean = true): Unit = {
    val want = s"buckets=$buckets;w=$w"
    val stored =
      if (createIfMissing) Fs.ensureMarker(f, configMarker, want)
      else Fs.readMarker(f, configMarker).getOrElse(want)
    require(stored == want,
      s"index at $path was created with '$stored'; opened with '$want' " +
        "— a width/bucket mismatch silently misses historical duplicates")
  }

  private def requireIntegralId(batch: DataFrame, idCol: String): Unit =
    batch.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"idCol '$idCol' must be an integral type, got $t")
    }

  def exists: Boolean = log.hasAny

  /** Pre-touch the live snapshot's filesystem metadata (list cell
    * leaves + read parquet footers, driver-side) so a fresh streaming
    * driver's first batch doesn't pay the cold listing/footer cost
    * mid-batch; also seeds the footer row-count cache behind the bloom
    * ratio gate. Optional — batch-1 latency only, never correctness.
    * Returns the committed rows. */
  def warm(): Long =
    try log.rowCount()
    catch { case scala.util.control.NonFatal(_) => 0L }

  /** The committed gram table: (k, doc_id, bucket). */
  def grams: DataFrame = log.resolve() match {
    case None => log.emptyDf(GramIndex.schema)
    case Some((_, entries)) => log.readEntries(entries, GramIndex.schema)
  }

  /** Batch gram rows (doc_id, pos, k) via the shared [[SpanDedup]]
    * tokenization — stored keys and probe keys can never drift. */
  private def batchGrams(batch: DataFrame, textCol: String,
      idCol: String): DataFrame =
    SpanDedup.grams(batch.filter(col(textCol).isNotNull), w, textCol, idCol)

  /** History rows pruned to what this batch can possibly match, in two
    * no-false-negative layers:
    *
    *  1. BUCKET pruning — read only the md5-prefix partitions the
    *     batch's keys land in (the collected bucket ids are <=
    *     `buckets` ints). Decisive for tiny batches, but it SATURATES:
    *     a batch of ~`buckets`×ln(`buckets`) distinct keys already
    *     touches every bucket with high probability, after which
    *     pruning reads the whole index.
    *  2. BLOOM pruning — a [[graft.operators.BloomBits]] filter built
    *     over the batch's distinct gram keys, applied to the pruned
    *     scan BEFORE the probe join. History rows it drops have keys
    *     provably absent from the batch, so neither the span join nor
    *     the ingest anti-join can miss anything; survivors are the true
    *     matches plus ~1% false positives (10 bits/key). This is what
    *     keeps a bounded micro-batch's probe cost proportional to the
    *     BATCH rather than the history once bucket pruning saturates —
    *     the filtered history leg usually lands back under the
    *     broadcast threshold, so neither side exchanges. Skipped when
    *     the batch's distinct keys exceed `bloomMaxKeys` (a
    *     corpus-sized backfill probing half the corpus at once: the
    *     filter literal would be tens of MB and history survivors
    *     wouldn't shrink — the shuffle join IS the right plan there;
    *     measured in PROFILE.md round-9), and below
    *     `bloomMinHistoryRatio` × the batch's keys of ESTIMATED
    *     touched-history rows (footer-derived committed rows, cached
    *     per immutable dir; metadata only): building the filter costs three
    *     extra batch-side jobs, constant in history, which only pays
    *     once the history leg it shrinks is the dominant term —
    *     measured at 63× ratio as 9.6× less exchange (the
    *     cluster-dominant cost), while at ratio ≈1 (the battery's
    *     split-corpus shape) the build would be pure overhead, so the
    *     gate keeps it off. The per-bucket distinct-key counts come
    *     from the same one aggregation that collects the touched
    *     bucket ids. */
  private def prunedHistory(g: DataFrame,
      snapshot: Option[(Long, Map[String, Seq[String]])]): DataFrame =
    snapshot match {
      case None => log.emptyDf(GramIndex.schema)
      case Some((_, entries)) =>
        val perBucket = g
          .select(bucketCol(col("k")).as("__bucket"), col("k"))
          .groupBy(col("__bucket"))
          .agg(count_distinct(col("k")).as("__n"))
          .collect()
        val touched = perBucket.map(_.getInt(0)).toSeq
        val nKeys = perBucket.map(_.getLong(1)).sum
        val pruned = log.readEntries(entries, GramIndex.schema)
          .filter(col("bucket").isInCollection(touched))
        val estTouchedRows =
          if (touched.isEmpty) 0L
          else GramIndex.estRows(log) * touched.size / buckets
        if (nKeys > 0 && nKeys <= bloomMaxKeys &&
            estTouchedRows >= bloomMinHistoryRatio * nKeys) {
          // nKeys IS the exact distinct count (per-bucket distinct
          // sums, bucket a pure function of k) — skip the sizing action
          val bloom = graft.operators.Bloom.buildWithKnownCount(
            g, "k", nKeys)
          pruned.filter(bloom.mightContain(col("k")))
        } else pruned
    }

  /** Maximal duplicated spans of `g`'s positions against history +
    * within-batch (see class doc for the flag criterion). */
  private def spansAgainst(g: DataFrame, history: DataFrame): DataFrame = {
    val withinDup = g.groupBy(col("k"))
      .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select(col("k"))
    val withinHits = g.join(withinDup, Seq("k")).select("doc_id", "pos")
    val historyHits = g
      .join(history.select(col("k"), col("doc_id").as("__owner")), Seq("k"))
      .filter(col("__owner") =!= col("doc_id"))
      .select("doc_id", "pos")
    SpanDedup.mergeSpans(
      withinHits.unionByName(historyHits).distinct(), w)
  }

  /** Duplicated spans for `batch` against everything ever ingested,
    * WITHOUT registering the batch (the read-only contamination check —
    * e.g. screening an eval set against the training corpus). */
  def probe(batch: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    requireIntegralId(batch, idCol)
    ensureConfig(createIfMissing = false)
    // pin the batch grams ONCE: prunedHistory's bucket collect, the
    // bloom build, and the span join would otherwise each re-tokenize
    // and re-hash the whole batch (the NearDupIndex.batchBands
    // one-signature-computation discipline)
    val g = batchGrams(batch, textCol, idCol).transform(graft.operators.Checkpoints.pin(_))
    spansAgainst(g, prunedHistory(g, log.resolve()))
  }

  /** Duplicated spans for `batch` against history + within-batch, AND
    * register the batch's new grams (owner = smallest batch doc
    * carrying each gram) in one atomic manifest commit. Returns the
    * spans, computed against the pinned pre-ingest snapshot. */
  def ingest(batch: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    requireIntegralId(batch, idCol)
    ensureConfig()
    // pin the batch grams ONCE — four consumers (prunedHistory's
    // bucket collect, the bloom build, the span join, the newGrams
    // write) would otherwise each re-tokenize and re-hash the batch
    val g = batchGrams(batch, textCol, idCol).transform(graft.operators.Checkpoints.pin(_))
    val snapshot = log.resolve()
    val history = prunedHistory(g, snapshot)
    val spans = spansAgainst(g, history)

    val newGrams = g
      .groupBy(col("k")).agg(min(col("doc_id")).cast("long").as("doc_id"))
      .join(history.select(col("k")), Seq("k"), "left_anti")
      .withColumn("bucket", bucketCol(col("k")))
    val dirName = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    newGrams
      .select(col("k"), col("doc_id"), col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(log.dataPath(dirName).toString)
    val cells = log.listCells(dirName, GramIndex.LevelPrefixes)
    if (cells.isEmpty) f.delete(log.dataPath(dirName), true)
    else log.commitRetry(RecordStore.appendMutate(cells, dirName))
    spans
  }

  /** Rewrite fragmented bucket cells into fresh single-dir cells,
    * collapsing racing-writer duplicate keys to the min owner — the
    * same OPTIMIZE-style maintenance as [[FingerprintIndex.compact]].
    * Micro-batch ingestion needs this periodically: every commit adds
    * one data dir and snapshot reads union one scan per live dir.
    * Returns the number of cells rewritten. */
  def compact(filesPerPartition: Int = 1): Int = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val resolved = log.resolve()
    if (resolved.isEmpty) return 0
    val (_, snapshot) = resolved.get
    val fragmented = snapshot.filter { case (cell, dirs) =>
      dirs.map(countParquet(_, cell)).sum > filesPerPartition
    }
    if (fragmented.isEmpty) return 0
    val newDir = log.newDataDirName(
      log.currentVersion.getOrElse(0L) + 1, tag = "compact")
    log.readEntries(fragmented, GramIndex.schema)
      .groupBy(col("k"), col("bucket"))
      .agg(min(col("doc_id")).as("doc_id"))
      .withColumn("__salt", pmod(xxhash64(col("k")), lit(filesPerPartition)))
      .repartition(math.max(fragmented.size * filesPerPartition, 1),
        col("bucket"), col("__salt"))
      .sortWithinPartitions(col("k"))
      .drop("__salt")
      .select(col("k"), col("doc_id"), col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(log.dataPath(newDir).toString)
    @volatile var yielded = Set.empty[String]
    log.commitRetry { current =>
      val (entries, y) =
        RecordStore.compactMutate(snapshot, fragmented.keySet, newDir)(current)
      yielded = y
      entries
    }
    if (yielded.size == fragmented.size)
      f.delete(log.dataPath(newDir), true)
    fragmented.size - yielded.size
  }

  private def countParquet(dir: String, cell: String): Int = {
    val leaf = new Path(log.cellBase(dir), cell)
    if (!f.exists(leaf)) 0
    else f.listStatus(leaf).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Index economics from filesystem metadata only (no data scan):
    * live data dirs, referenced bucket cells, parquet file count, and
    * total stored bytes. The index is honestly O(corpus tokens) — this
    * is the gauge that makes the constant visible (bytes ÷ corpus
    * tokens ≈ the per-token overhead; the spec pins it at tens of
    * bytes, same order as Lee et al. 2022's 8-bytes-per-token suffix
    * array) and that [[compactIfNeeded]] consults for its live-dirs
    * trigger. */
  def stats(): GramIndex.Stats = {
    val s = log.storeStats()
    GramIndex.Stats(s.liveDirs, s.cells, s.files, s.bytes)
  }

  /** Maintenance policy for continuous micro-batch ingestion: run
    * [[compact]] only once the number of LIVE data dirs exceeds
    * `maxLiveDirs` (every commit adds one dir; snapshot reads union one
    * scan per live dir, so unbounded dirs means unbounded read fan-in).
    * Returns the number of cells rewritten (0 = under threshold or
    * nothing fragmented). Call it after ingests the way
    * [[RecordStore.compact]] is scheduled — cheap to call every batch,
    * pays only past the threshold. */
  def compactIfNeeded(maxLiveDirs: Int = 8,
      filesPerPartition: Int = 1): Int = {
    require(maxLiveDirs >= 1, "maxLiveDirs must be >= 1")
    if (stats().liveDirs > maxLiveDirs) compact(filesPerPartition) else 0
  }

  /** See [[ManifestLog.vacuum]] / [[ManifestLog.vacuumOrphans]]. */
  def vacuum(): Unit = log.vacuum()
  def vacuumOrphans(olderThanMs: Long): Seq[String] =
    log.vacuumOrphans(olderThanMs)
}

object GramIndex {
  /** Filesystem-level index economics; see [[GramIndex.stats]]. */
  final case class Stats(liveDirs: Int, cells: Int, files: Long,
      bytes: Long)

  /** Committed gram rows for the bloom-prefilter ratio gate: the REAL
    * footer-derived count ([[ManifestLog.rowCount]], cached per
    * immutable dir so steady state pays one footer read per new
    * commit), falling back to stored bytes ÷ [[BytesPerGramRow]] only
    * if a footer is unreadable — the estimate is gate-only either way
    * (off by 2× shifts the crossover, never correctness). */
  private[store] def estRows(log: ManifestLog): Long =
    try log.rowCountBudgeted("", ManifestLog.DefaultFooterBudget)
    catch { case scala.util.control.NonFatal(_) =>
      log.storeStats().bytes / BytesPerGramRow }

  /** Fallback-only bytes-per-gram-row (snappy parquet of a 32-char
    * key + doc_id + bucket; 277 MB / 7.4M rows at the 64× profile) —
    * used by [[estRows]] only when parquet footers cannot be read. */
  val BytesPerGramRow: Long = 38L

  val LevelPrefixes: Seq[String] = Seq("bucket=")
  val schema: StructType = StructType(Seq(
    StructField("k", StringType),
    StructField("doc_id", LongType),
    StructField("bucket", IntegerType)))
}
