package graft.store

import graft.core.{DatalakeRecord, Metadata}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-row shape of a metadata document (snake_case to match the wire
  * format of the reference, `README.md:105-115`). */
final case class MetadataRow(
    version: Int,
    start: Long,
    end: Option[Long],
    where: String,
    what: String,
    work_id: Option[String],
    path: String,
    id: String,
    hash: String)

/** Spark-row shape of one index record (one per file × day-bucket).
  *
  * Replaces the reference's DynamoDB row (`record.py:51-65`): the composite
  * `time_index_key = "<bucket>:<what>"` becomes the (time_bucket, what)
  * partition pair, so time queries are partition-pruned scans.
  */
final case class RecordRow(
    version: Int,
    url: String,
    time_bucket: Long,
    what: String,
    where: String,
    work_id: Option[String],
    create_time: Long,
    size: Long,
    metadata: MetadataRow)

object RecordRow {
  def fromCore(r: DatalakeRecord): RecordRow =
    RecordRow(r.version, r.url, r.timeBucket, r.what, r.where, r.workId,
      r.createTime, r.size, fromMeta(r.metadata))

  def fromMeta(m: Metadata): MetadataRow =
    MetadataRow(m.version, m.start, m.end, m.where, m.what, m.workId,
      m.path, m.id, m.hash)

  def toMeta(m: MetadataRow): Metadata =
    Metadata(m.version, m.start, m.end, m.where, m.what, m.work_id,
      m.path, m.id, m.hash)
}

/** Partitioned-Parquet record table replacing {DynamoDB primary index +
  * work-id GSI} of the reference (`README.md:154-202`), stored as a
  * versioned-manifest table (see [[ManifestLog]]) so appends and
  * compaction are snapshot-isolated commits — a reader concurrent with
  * either resolves a complete committed manifest, never a directory
  * mid-rewrite (the flaw class the old temp-dir-and-swap compaction had).
  *
  * Layout: each commit writes an immutable data dir whose inner tree is
  * partitioned by (`time_bucket`, `what`) — the reference's
  * `time_index_key` *is* the partition leaf. The manifest maps each
  * `time_bucket=…/what=…` CELL to the ordered data dirs holding its
  * rows; an append adds one dir to the touched cells, a compaction
  * supersedes a cell's dir list with one rewritten dir. This both
  * prunes time queries to the touched day-buckets and spreads writes
  * across whats (the reference's hot-key-avoidance rationale,
  * `README.md:189-202`, holds at 100 TB: one day × one what is a
  * handful of files, compactable independently). Work-id queries scan
  * with a pushed-down `work_id` predicate; [[WorkIdIndex]] is the
  * secondary bucketed copy for point lookups.
  */
final class RecordStore(spark: SparkSession, path: String,
    workIdIndex: Option[WorkIdIndex] = None,
    keepVersions: Int = 3,
    committer: Option[ManifestCommitter] = None) {
  import spark.implicits._

  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private lazy val f = Fs.fs(spark, path)

  /** Append records idempotently: within-batch duplicate (id, time_bucket)
    * pairs collapse to one row, mirroring the dup-tolerant DynamoDB put
    * (`storage.py:64-73` — same key overwrites). */
  def append(records: Seq[DatalakeRecord]): Unit =
    appendDs(records.map(RecordRow.fromCore).toDS())

  def appendDs(ds: Dataset[RecordRow]): Unit =
    appendDf(ds.toDF(), dedupAgainstExisting = false)

  /** Append with optional cross-batch idempotence: when
    * `dedupAgainstExisting`, rows whose (time_bucket, id) already exist are
    * dropped via an anti-join that only reads the bucket partitions touched
    * by this batch (partition-pruned, so the cost is bounded by batch span,
    * not table size — the 30-bucket ingest cap guarantees that). This is
    * the replay-safety the reference gets from DynamoDB's idempotent put
    * (`storage.py:64-73`) under at-least-once delivery.
    *
    * Commit shape: the batch is written ONCE into a writer-unique data
    * dir, then the manifest pointer is advanced through the commit-CAS
    * retry loop — on a lost race only the (tiny) manifest is recomputed,
    * never the data files, because an append's content does not depend
    * on the base version. */
  def appendDf(df: DataFrame, dedupAgainstExisting: Boolean): Unit = {
    log.migrateLegacyIfNeeded(RecordStore.LevelPrefixes)
    val deduped = df
      .withColumn("__dedup_id", col("metadata.id"))
      .dropDuplicates("time_bucket", "__dedup_id")
    val toWrite =
      if (dedupAgainstExisting && exists) {
        val buckets = deduped.select(min("time_bucket"), max("time_bucket"))
          .collect().head
        if (buckets.isNullAt(0)) deduped
        else {
          val existing = records
            .filter(col("time_bucket")
              .between(buckets.getLong(0), buckets.getLong(1)))
            .select(col("time_bucket"),
              col("metadata.id").as("__dedup_id"))
          deduped.join(existing, Seq("time_bucket", "__dedup_id"), "left_anti")
        }
      } else deduped
    // with a work-id index configured the batch plan is consumed TWICE
    // (the parquet write below, then the index append) — pin it so the
    // dedup anti-join against the record table runs once, not per
    // consumer (the LatestStore.upsert merge-input discipline)
    val finalRows = {
      val rows = toWrite.drop("__dedup_id")
      if (workIdIndex.isDefined) rows.transform(graft.operators.Checkpoints.pin(_)) else rows
    }
    val dirName = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    finalRows
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("time_bucket", "what")
      .parquet(log.dataPath(dirName).toString)
    val cells = log.listCells(dirName, RecordStore.LevelPrefixes)
    if (cells.isEmpty) {
      // empty batch (or everything deduped away): nothing to commit
      f.delete(log.dataPath(dirName), true)
      return
    }
    // every writer maintains the secondary index — hooking here (not in
    // individual callers) keeps the index consistent for push, uploader,
    // and streaming alike. Index append comes BEFORE the record commit:
    // a crash between them then leaves only a harmless duplicate-
    // tolerated index entry that the replay repeats, whereas the old
    // commit-then-index order could never be repaired — the replay
    // dedups the already-committed rows to an empty batch and early-
    // returns before ever reaching the index append, so lookup() missed
    // those rows forever.
    workIdIndex.foreach(_.append(finalRows))
    log.commitRetry(RecordStore.appendMutate(cells, dirName))
  }

  def exists: Boolean =
    log.hasAny || log.legacyCells(RecordStore.LevelPrefixes).nonEmpty

  /** Full table as DataFrame; partition columns are restored to their
    * logical types. See [[ManifestLog.readEntries]] for the scan shape. */
  def records: DataFrame = log.resolve() match {
    case None =>
      if (log.legacyCells(RecordStore.LevelPrefixes).nonEmpty)
        spark.read
          .schema(RecordStore.schema)
          .option("basePath", path)
          .parquet(path)
      else log.emptyDf(RecordStore.schema)
    case Some((_, entries)) => log.readEntries(entries, RecordStore.schema)
  }

  private def countParquet(dir: String, cell: String): Int = {
    val leaf = new Path(log.cellBase(dir), cell)
    if (!f.exists(leaf)) 0
    else f.listStatus(leaf).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Compact fragmented cells: streaming ingest appends one small file
    * per micro-batch per (bucket, what); this rewrites each cell whose
    * live file count exceeds `filesPerPartition` into (at most)
    * `filesPerPartition` files in a fresh data dir and commits a
    * manifest superseding those cells' dir lists. Readers concurrent
    * with the compaction keep resolving complete snapshots (old
    * manifests and their dirs survive `keepVersions` commits); appends
    * concurrent with it are preserved, and a RACING compaction of the
    * same cell is detected and yielded to, by [[RecordStore.compactMutate]]
    * in the commit loop. Cost follows fragmented cells, not table size.
    * (On Delta/Iceberg this is OPTIMIZE.) Returns the number of cells
    * this call actually rewrote. */
  def compact(filesPerPartition: Int = 1): Int = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    log.migrateLegacyIfNeeded(RecordStore.LevelPrefixes)
    val resolved = log.resolve()
    if (resolved.isEmpty) return 0
    val (_, snapshot) = resolved.get
    val fragmented = snapshot.filter { case (cell, dirs) =>
      dirs.map(countParquet(_, cell)).sum > filesPerPartition
    }
    if (fragmented.isEmpty) return 0
    val newDir = log.newDataDirName(
      log.currentVersion.getOrElse(0L) + 1, tag = "compact")
    // sort the rewrite by (where, start): parquet row-group min/max
    // stats then let where-prefix and interval queries skip row groups
    // inside a partition — the poor-man's Z-order, for free during the
    // rewrite compaction already pays for. repartition on (cell key,
    // salt) puts each cell's rows in `filesPerPartition` tasks -> that
    // many files per cell dir.
    log.readEntries(fragmented, RecordStore.schema)
      .withColumn("__salt",
        pmod(xxhash64(col("metadata.id")), lit(filesPerPartition)))
      .repartition(math.max(fragmented.size * filesPerPartition, 1),
        col("time_bucket"), col("what"), col("__salt"))
      .sortWithinPartitions(col("where"), col("metadata.start"))
      .drop("__salt")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("time_bucket", "what")
      .parquet(log.dataPath(newDir).toString)
    @volatile var yielded = Set.empty[String]
    log.commitRetry { current =>
      val (entries, y) =
        RecordStore.compactMutate(snapshot, fragmented.keySet, newDir)(current)
      yielded = y
      entries
    }
    if (yielded.size == fragmented.size)
      // every cell lost to a racing compaction: our dir is fully
      // unreferenced — reclaim it now rather than waiting for the sweep
      f.delete(log.dataPath(newDir), true)
    fragmented.size - yielded.size
  }

  /** Table economics from filesystem metadata only — see
    * [[ManifestLog.storeStats]]. */
  def stats(): ManifestLog.StoreStats = log.storeStats()

  /** Run [[compact]] only once live data dirs exceed `maxLiveDirs` —
    * the shared manifested-store scheduling policy; cheap to call after
    * every append. */
  def compactIfNeeded(maxLiveDirs: Int = 8,
      filesPerPartition: Int = 1): Int = {
    require(maxLiveDirs >= 1, "maxLiveDirs must be >= 1")
    if (stats().liveDirs > maxLiveDirs) compact(filesPerPartition) else 0
  }

  /** Offline reclamation of data dirs left by writers that crashed
    * between data-write and manifest-commit. See
    * [[ManifestLog.vacuumOrphans]]. */
  def vacuumOrphans(olderThanMs: Long): Seq[String] =
    log.vacuumOrphans(olderThanMs)

  /** Resolvable snapshot versions, oldest first (retention =
    * `keepVersions` commits). */
  def versions: Seq[Long] = log.versions

  /** Time travel: the table exactly as committed at `version` — every
    * manifest is a complete immutable snapshot, so a training pipeline
    * can pin one and re-read IDENTICAL data regardless of concurrent
    * appends/compactions (within the retention window; a vacuumed
    * version throws FileNotFound). */
  def recordsAt(version: Long): DataFrame =
    log.readEntries(log.readManifest(version), RecordStore.schema)
}

/** Optional secondary copy of the record table laid out for work-id
  * lookups — the Spark equivalent of the reference's `work-id-index` GSI
  * (README.md:183-202), manifested like its primary. Rows are
  * repartitioned by a short work_id prefix and written partitioned by it
  * so a work-id query reads a partition-pruned slice instead of scanning
  * every time bucket. Null work_ids are dropped (the reference's random
  * `null<id>` sentinel exists precisely because such rows are never
  * queried by work_id).
  */
final class WorkIdIndex(spark: SparkSession, path: String,
    prefixLen: Int = 2,
    keepVersions: Int = 3,
    committer: Option[ManifestCommitter] = None) {

  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private lazy val f = Fs.fs(spark, path)

  def exists: Boolean =
    log.hasAny || log.legacyCells(WorkIdIndex.LevelPrefixes).nonEmpty

  private def withPrefix(df: DataFrame): DataFrame =
    df.filter(col("work_id").isNotNull)
      .withColumn("work_id_prefix", substring(col("work_id"), 0, prefixLen))

  /** (Re)build from the record table into one fresh data dir, committed
    * as a full replacement: every prefix cell points at the new dir
    * only (plus any dirs appended by writers racing the rebuild, which
    * the commit mutate keeps — their rows may transiently duplicate
    * ours, which work-id READS tolerate by design: the querier dedups
    * by id within a page exactly like the reference's GSI reads). A
    * RACING rebuild is recognized by its tagged dir name and yielded
    * to ([[WorkIdIndex.rebuildMutate]]): exactly one replacement wins,
    * never a doubled index. */
  def rebuild(store: RecordStore): Unit = {
    log.migrateLegacyIfNeeded(WorkIdIndex.LevelPrefixes)
    val snapshot = log.resolve().map(_._2).getOrElse(Map.empty)
    val newDir = log.newDataDirName(
      log.currentVersion.getOrElse(0L) + 1, tag = "rebuild")
    withPrefix(store.records)
      .repartition(col("work_id_prefix"))
      .sortWithinPartitions(col("work_id"), col("what"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("work_id_prefix")
      .parquet(log.dataPath(newDir).toString)
    val cells = log.listCells(newDir, WorkIdIndex.LevelPrefixes)
    // empty source (no non-null work_ids): the rebuild still commits, so
    // a stale index empties out instead of keeping superseded entries
    if (cells.isEmpty) f.delete(log.dataPath(newDir), true)
    @volatile var yielded = false
    log.commitRetry { current =>
      val (entries, y) =
        WorkIdIndex.rebuildMutate(snapshot, cells, newDir)(current)
      yielded = y
      entries
    }
    if (yielded && cells.nonEmpty) f.delete(log.dataPath(newDir), true)
  }

  /** Incremental maintenance: append one ingest batch's rows (the
    * streaming path — a full rebuild per batch would scan the whole
    * record table). Bucket-duplicate rows are fine: work-id queries
    * dedup by id within a page exactly like the reference's GSI reads. */
  def append(batch: DataFrame): Unit = {
    log.migrateLegacyIfNeeded(WorkIdIndex.LevelPrefixes)
    val dirName = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    withPrefix(batch)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("work_id_prefix")
      .parquet(log.dataPath(dirName).toString)
    val cells = log.listCells(dirName, WorkIdIndex.LevelPrefixes)
    if (cells.isEmpty) { f.delete(log.dataPath(dirName), true); return }
    log.commitRetry(RecordStore.appendMutate(cells, dirName))
  }

  def lookup(workId: String, what: String): DataFrame = {
    val table = log.resolve() match {
      case Some((_, entries)) => log.readEntries(entries, WorkIdIndex.schema)
      case None if log.legacyCells(WorkIdIndex.LevelPrefixes).nonEmpty =>
        spark.read
          .schema(WorkIdIndex.schema)
          .option("basePath", path)
          .parquet(path)
      case None => log.emptyDf(WorkIdIndex.schema)
    }
    table
      .filter(col("work_id_prefix") === workId.take(prefixLen) &&
        col("work_id") === workId && col("what") === what)
      .drop("work_id_prefix")
  }

  /** See [[ManifestLog.vacuumOrphans]]. */
  def vacuumOrphans(olderThanMs: Long): Seq[String] =
    log.vacuumOrphans(olderThanMs)
}

object RecordStore {
  /** Partition-directory walk for this table's cells. */
  private[store] val LevelPrefixes = Seq("time_bucket=", "what=")

  /** Commit transform for an append that wrote `cells` into `dirName`:
    * the new dir joins each touched cell's list; everything else rides
    * along. Append content never depends on the base version, so a
    * lost race recomputes only this map. */
  private[store] def appendMutate(cells: Seq[String], dirName: String)(
      entries: Map[String, Seq[String]]): Map[String, Seq[String]] =
    entries ++ cells.map(c =>
      c -> (entries.getOrElse(c, Seq.empty) :+ dirName))

  /** Commit transform for a compaction that rewrote `fragmented` cells
    * (their dir lists as of `snapshot`) into `newDir`. A cell some of
    * whose snapshot dirs are no longer referenced was superseded by a
    * RACING compaction — superseding it again would double its rows
    * (both rewrites contain them), so that cell YIELDS to the current
    * state and our rewrite of it goes unreferenced. Dirs added to a
    * cell after the snapshot are concurrent appends: their rows are not
    * in our rewrite, so they are preserved alongside it. Returns (new
    * entries, yielded cells). Pure — unit-tested directly against
    * crafted race states. */
  private[store] def compactMutate(
      snapshot: Map[String, Seq[String]],
      fragmented: Set[String],
      newDir: String)(current: Map[String, Seq[String]])
      : (Map[String, Seq[String]], Set[String]) = {
    val yielded = fragmented.filter(c =>
      snapshot.getOrElse(c, Seq.empty)
        .diff(current.getOrElse(c, Seq.empty)).nonEmpty)
    val updates = (fragmented -- yielded).map { c =>
      c -> (newDir +: current.getOrElse(c, Seq.empty)
        .diff(snapshot.getOrElse(c, Seq.empty)))
    }
    (current ++ updates, yielded)
  }

  val metadataSchema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = true),
    StructField("where", StringType, nullable = false),
    StructField("what", StringType, nullable = false),
    StructField("work_id", StringType, nullable = true),
    StructField("path", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("hash", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("time_bucket", LongType, nullable = false),
    StructField("what", StringType, nullable = false),
    StructField("where", StringType, nullable = false),
    StructField("work_id", StringType, nullable = true),
    StructField("create_time", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("metadata", metadataSchema, nullable = false)))
}

object WorkIdIndex {
  private[store] val LevelPrefixes = Seq("work_id_prefix=")

  /** Commit transform for a full rebuild into `newDir` (tagged
    * "rebuild" in its name): every cell of the new layout points at the
    * new dir plus post-snapshot appends; stale cells drop. If ANOTHER
    * rebuild's dir (recognized by tag, not present in our snapshot)
    * already sits in `current`, ours is concurrent with a replacement
    * that already landed — committing over it would duplicate every
    * indexed row, so the whole rebuild yields. Returns (new entries,
    * yielded). Pure — unit-tested against crafted race states. */
  private[store] def rebuildMutate(
      snapshot: Map[String, Seq[String]],
      cells: Seq[String],
      newDir: String)(current: Map[String, Seq[String]])
      : (Map[String, Seq[String]], Boolean) = {
    val snapshotDirs = snapshot.values.flatten.toSet
    val racingRebuild = current.values.flatten.exists(d =>
      d.contains("-rebuild-") && d != newDir && !snapshotDirs.contains(d))
    if (racingRebuild) (current, true)
    else {
      val keys = (current.keySet ++ cells).toSeq
      val entries = keys.flatMap { c =>
        val addedSince = current.getOrElse(c, Seq.empty)
          .diff(snapshot.getOrElse(c, Seq.empty))
        val dirs =
          (if (cells.contains(c)) Seq(newDir) else Seq.empty) ++ addedSince
        if (dirs.isEmpty) None else Some(c -> dirs)
      }.toMap
      (entries, false)
    }
  }

  /** Record schema plus the prefix partition column. */
  val schema: StructType =
    RecordStore.schema.add(StructField("work_id_prefix", StringType))
}
