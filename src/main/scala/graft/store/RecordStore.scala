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

  private val root = new Path(path)
  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private def f = Fs.fs(spark, path)

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
    migrateLegacyIfNeeded()
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
    val finalRows = toWrite.drop("__dedup_id")
    val dirName = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    finalRows
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("time_bucket", "what")
      .parquet(log.dataPath(dirName).toString)
    val cells = listCells(dirName)
    if (cells.isEmpty) {
      // empty batch (or everything deduped away): nothing to commit
      f.delete(log.dataPath(dirName), true)
      return
    }
    log.commitRetry { entries =>
      entries ++ cells.map(c => c -> (entries.getOrElse(c, Seq.empty) :+ dirName))
    }
    // every writer maintains the secondary index — hooking here (not in
    // individual callers) keeps the index consistent for push, uploader,
    // and streaming alike
    workIdIndex.foreach(_.append(finalRows))
  }

  def exists: Boolean = log.hasAny || legacyCells.nonEmpty

  /** Full table as DataFrame; partition columns are restored to their
    * logical types. One scan per live data dir (cells listed explicitly,
    * so a dir's superseded leaves are never read), unioned — filters and
    * partition pruning push into every branch, and compaction bounds the
    * fan-in. */
  def records: DataFrame = log.resolve() match {
    case None =>
      if (legacyCells.nonEmpty)
        spark.read
          .schema(RecordStore.schema)
          .option("basePath", path)
          .parquet(path)
      else emptyTable
    case Some((_, entries)) => readEntries(entries)
  }

  private def emptyTable: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      RecordStore.schema)

  /** Data-dir name "." references the table root itself: a pre-manifest
    * partitioned tree migrated in place (a pure manifest commit — no
    * file moves, so the migration is crash- and race-safe). */
  private def cellBase(dir: String): Path =
    if (dir == ".") root else log.dataPath(dir)

  private def readEntries(entries: Map[String, Seq[String]]): DataFrame = {
    val dirCells: Seq[(String, Seq[String])] = entries.toSeq
      .flatMap { case (cell, dirs) => dirs.map(_ -> cell) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .toSeq.sortBy(_._1)
    val scans = dirCells.map { case (dir, cells) =>
      val base = cellBase(dir)
      val leaves = cells.map(c => new Path(base, c).toString)
      spark.read
        .schema(RecordStore.schema)
        .option("basePath", base.toString)
        .parquet(leaves: _*)
    }
    if (scans.isEmpty) emptyTable else scans.reduce(_ unionByName _)
  }

  /** Relative `time_bucket=…/what=…` leaf paths under `dir`, exactly as
    * the partitioned write escaped them — cell keys never need parsing,
    * only joining back onto a base path. */
  private def listCells(dir: String): Seq[String] = {
    val base = cellBase(dir)
    if (!f.exists(base)) Nil
    else for {
      bucketDir <- f.listStatus(base).toSeq
      if bucketDir.isDirectory &&
        bucketDir.getPath.getName.startsWith("time_bucket=")
      whatDir <- f.listStatus(bucketDir.getPath).toSeq
      if whatDir.isDirectory && whatDir.getPath.getName.startsWith("what=")
    } yield bucketDir.getPath.getName + "/" + whatDir.getPath.getName
  }

  private def legacyCells: Seq[String] =
    if (log.hasAny) Nil else listCells(".")

  /** One-time adoption of a pre-manifest partitioned tree: commit
    * version 1 referencing the existing leaves in place (dir "."). A
    * lost CAS means another writer already migrated — equally fine. */
  private def migrateLegacyIfNeeded(): Unit = {
    val cells = legacyCells
    if (cells.nonEmpty)
      log.tryCommit(1L, cells.map(_ -> Seq(".")).toMap)
  }

  private def countParquet(dir: String, cell: String): Int = {
    val leaf = new Path(cellBase(dir), cell)
    if (!f.exists(leaf)) 0
    else f.listStatus(leaf).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Compact fragmented cells: streaming ingest appends one small file
    * per micro-batch per (bucket, what); this rewrites each cell whose
    * live file count exceeds `filesPerPartition` into a single fresh
    * data dir and commits a manifest superseding those cells' dir lists.
    * Readers concurrent with the compaction keep resolving complete
    * snapshots (old manifests and their dirs survive `keepVersions`
    * commits); appends concurrent with it are preserved by the
    * snapshot-diff in the commit loop. Cost follows fragmented cells,
    * not table size. (On Delta/Iceberg this is OPTIMIZE.) Returns the
    * number of cells rewritten. */
  def compact(filesPerPartition: Int = 1): Int = {
    migrateLegacyIfNeeded()
    val resolved = log.resolve()
    if (resolved.isEmpty) return 0
    val (_, snapshot) = resolved.get
    val fragmented = snapshot.filter { case (cell, dirs) =>
      dirs.map(countParquet(_, cell)).sum > filesPerPartition
    }
    if (fragmented.isEmpty) return 0
    val newDir = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    // sort the rewrite by (where, start): parquet row-group min/max
    // stats then let where-prefix and interval queries skip row groups
    // inside a partition — the poor-man's Z-order, for free during the
    // rewrite compaction already pays for. repartition on the cell key
    // puts each cell's rows in one task -> one file per cell dir.
    readEntries(fragmented)
      .repartition(fragmented.size, col("time_bucket"), col("what"))
      .sortWithinPartitions(col("where"), col("metadata.start"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("time_bucket", "what")
      .parquet(log.dataPath(newDir).toString)
    log.commitRetry { current =>
      current ++ fragmented.keys.map { c =>
        // keep any dirs appended to this cell AFTER our source snapshot:
        // their rows are not in the rewrite, so superseding them would
        // silently drop a concurrent append (the race the snapshot-diff
        // closes)
        val addedSince =
          current.getOrElse(c, Seq.empty).diff(snapshot.getOrElse(c, Seq.empty))
        c -> (newDir +: addedSince)
      }
    }
    fragmented.size
  }

  /** Offline reclamation of data dirs left by writers that crashed
    * between data-write and manifest-commit. See
    * [[ManifestLog.vacuumOrphans]]. */
  def vacuumOrphans(olderThanMs: Long): Seq[String] =
    log.vacuumOrphans(olderThanMs)
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

  private val root = new Path(path)
  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private def f = Fs.fs(spark, path)

  def exists: Boolean = log.hasAny || legacyCells.nonEmpty

  private def cellBase(dir: String): Path =
    if (dir == ".") root else log.dataPath(dir)

  private def listCells(dir: String): Seq[String] = {
    val base = cellBase(dir)
    if (!f.exists(base)) Nil
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("work_id_prefix="))
      .map(_.getPath.getName)
  }

  private def legacyCells: Seq[String] =
    if (log.hasAny) Nil else listCells(".")

  private def migrateLegacyIfNeeded(): Unit = {
    val cells = legacyCells
    if (cells.nonEmpty)
      log.tryCommit(1L, cells.map(_ -> Seq(".")).toMap)
  }

  private def withPrefix(df: DataFrame): DataFrame =
    df.filter(col("work_id").isNotNull)
      .withColumn("work_id_prefix", substring(col("work_id"), 0, prefixLen))

  /** (Re)build from the record table into one fresh data dir, committed
    * as a full replacement: every prefix cell points at the new dir
    * only (plus any dirs appended by writers racing the rebuild, which
    * the snapshot-diff keeps). Readers never see the old and new
    * layouts mixed. */
  def rebuild(store: RecordStore): Unit = {
    migrateLegacyIfNeeded()
    val snapshot = log.resolve().map(_._2).getOrElse(Map.empty)
    val newDir = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    withPrefix(store.records)
      .repartition(col("work_id_prefix"))
      .sortWithinPartitions(col("work_id"), col("what"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("work_id_prefix")
      .parquet(log.dataPath(newDir).toString)
    val cells = listCells(newDir)
    // empty source (no non-null work_ids): the rebuild still commits, so
    // a stale index empties out instead of keeping superseded entries
    if (cells.isEmpty) f.delete(log.dataPath(newDir), true)
    log.commitRetry { current =>
      val keys = (current.keySet ++ cells).toSeq
      keys.flatMap { c =>
        val addedSince =
          current.getOrElse(c, Seq.empty).diff(snapshot.getOrElse(c, Seq.empty))
        val dirs = (if (cells.contains(c)) Seq(newDir) else Seq.empty) ++ addedSince
        if (dirs.isEmpty) None else Some(c -> dirs)
      }.toMap
    }
  }

  /** Incremental maintenance: append one ingest batch's rows (the
    * streaming path — a full rebuild per batch would scan the whole
    * record table). Bucket-duplicate rows are fine: work-id queries
    * dedup by id within a page exactly like the reference's GSI reads. */
  def append(batch: DataFrame): Unit = {
    migrateLegacyIfNeeded()
    val dirName = log.newDataDirName(log.currentVersion.getOrElse(0L) + 1)
    withPrefix(batch)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("work_id_prefix")
      .parquet(log.dataPath(dirName).toString)
    val cells = listCells(dirName)
    if (cells.isEmpty) { f.delete(log.dataPath(dirName), true); return }
    log.commitRetry { entries =>
      entries ++ cells.map(c => c -> (entries.getOrElse(c, Seq.empty) :+ dirName))
    }
  }

  private def readEntries(entries: Map[String, Seq[String]]): DataFrame = {
    val dirCells: Seq[(String, Seq[String])] = entries.toSeq
      .flatMap { case (cell, dirs) => dirs.map(_ -> cell) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .toSeq.sortBy(_._1)
    val scans = dirCells.map { case (dir, cells) =>
      val base = cellBase(dir)
      val leaves = cells.map(c => new Path(base, c).toString)
      spark.read
        .schema(WorkIdIndex.schema)
        .option("basePath", base.toString)
        .parquet(leaves: _*)
    }
    scans.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        WorkIdIndex.schema))
  }

  def lookup(workId: String, what: String): DataFrame = {
    val table = log.resolve() match {
      case Some((_, entries)) => readEntries(entries)
      case None if legacyCells.nonEmpty =>
        spark.read
          .schema(WorkIdIndex.schema)
          .option("basePath", path)
          .parquet(path)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          WorkIdIndex.schema)
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
  /** Record schema plus the prefix partition column. */
  val schema: StructType =
    RecordStore.schema.add(StructField("work_id_prefix", StringType))
}
