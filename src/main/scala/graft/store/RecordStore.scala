package graft.store

import graft.core.{DatalakeRecord, Metadata}
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
  * work-id GSI} of the reference (`README.md:154-202`).
  *
  * Layout: partitioned by (`time_bucket`, `what`) — the reference's
  * `time_index_key` *is* the partition directory. This both prunes time
  * queries to the touched day-buckets and spreads writes across whats
  * (the reference's hot-key-avoidance rationale, `README.md:189-202`,
  * holds at 100 TB: one day × one what is a handful of files, compactable
  * independently). Work-id queries scan with a pushed-down `work_id`
  * predicate; at large scale a Z-order or secondary bucketed copy can be
  * added without changing this API.
  */
final class RecordStore(spark: SparkSession, path: String,
    workIdIndex: Option[WorkIdIndex] = None) {
  import spark.implicits._

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
    * (`storage.py:64-73`) under at-least-once delivery. */
  def appendDf(df: DataFrame, dedupAgainstExisting: Boolean): Unit = {
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
    finalRows
      .write
      .mode(SaveMode.Append)
      .partitionBy("time_bucket", "what")
      .parquet(path)
    // every writer maintains the secondary index — hooking here (not in
    // individual callers) keeps the index consistent for push, uploader,
    // and streaming alike
    workIdIndex.foreach(_.append(finalRows))
  }

  def exists: Boolean = Fs.exists(spark, path)

  /** Full table as DataFrame; partition columns are restored to their
    * logical types. */
  def records: DataFrame =
    spark.read
      .schema(RecordStore.schema)
      .option("basePath", path)
      .parquet(path)

  /** Compact fragmented partitions: streaming ingest appends one small
    * file per micro-batch per (bucket, what); this rewrites each touched
    * partition to `filesPerPartition` files. Only partitions whose file
    * count exceeds the target are rewritten — the scan is partition-
    * pruned, so compaction cost follows ingest-touched partitions, not
    * table size. All directory manipulation goes through the Hadoop FS
    * API (see [[Fs]]): rewrite into a dot-prefixed temp dir, then a
    * backup-checked swap — a crash mid-swap leaves either the old or the
    * new partition in place, never neither. (On Delta/Iceberg this is
    * OPTIMIZE.)
    */
  def compact(filesPerPartition: Int = 1): Int = {
    import org.apache.hadoop.fs.Path
    val f = Fs.fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return 0
    // clear temp/backup dirs from interrupted runs first (dot-prefixed,
    // so Spark partition discovery never sees them as partitions)
    for {
      bucketDir <- f.listStatus(root).toSeq if bucketDir.isDirectory
      stale <- f.listStatus(bucketDir.getPath)
      n = stale.getPath.getName
      if (n.startsWith(".") && n.endsWith(".compact")) || n.endsWith(".old")
    } f.delete(stale.getPath, true)
    val fragmented =
      for {
        bucketDir <- f.listStatus(root).toSeq
        if bucketDir.isDirectory &&
          bucketDir.getPath.getName.startsWith("time_bucket=")
        whatDir <- f.listStatus(bucketDir.getPath).toSeq
        if whatDir.isDirectory && whatDir.getPath.getName.startsWith("what=")
        files = f.listStatus(whatDir.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        if files > filesPerPartition
      } yield (
        bucketDir.getPath.getName.stripPrefix("time_bucket=").toLong,
        whatDir.getPath.getName.stripPrefix("what="),
        whatDir.getPath)
    fragmented.foreach { case (bucket, what, dir) =>
      val part = records
        .filter(col("time_bucket") === bucket && col("what") === what)
        .drop("time_bucket", "what")
      val tmp = new Path(dir.getParent, "." + dir.getName + ".compact")
      // sort the rewrite by (where, start): parquet row-group min/max
      // stats then let where-prefix and interval queries skip row groups
      // inside a partition — the poor-man's Z-order, for free during the
      // rewrite compaction already pays for
      part.coalesce(filesPerPartition)
        .sortWithinPartitions(col("where"), col("metadata.start"))
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      Fs.swap(spark, tmp.toString, dir.toString)
      Fs.dropWriterArtifacts(spark, dir.toString)
    }
    fragmented.size
  }
}

/** Optional secondary copy of the record table laid out for work-id
  * lookups — the Spark equivalent of the reference's `work-id-index` GSI
  * (README.md:183-202). Rows are repartitioned by work_id and written
  * bucketed-by-sort so a work-id query reads a partition-pruned slice
  * instead of scanning every time bucket. Null work_ids are dropped (the
  * reference's random `null<id>` sentinel exists precisely because such
  * rows are never queried by work_id).
  */
final class WorkIdIndex(spark: SparkSession, path: String,
    prefixLen: Int = 2) {

  def exists: Boolean = Fs.exists(spark, path)

  /** (Re)build from the record table: partition by a short work_id prefix
    * (bounded directory fan-out even with millions of work ids), sort by
    * (work_id, what) within files for row-group skipping. */
  def rebuild(store: RecordStore): Unit = {
    store.records
      .filter(col("work_id").isNotNull)
      .withColumn("work_id_prefix",
        substring(col("work_id"), 0, prefixLen))
      .repartition(col("work_id_prefix"))
      .sortWithinPartitions(col("work_id"), col("what"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("work_id_prefix")
      .parquet(path)
  }

  /** Incremental maintenance: append one ingest batch's rows (the
    * streaming path — a full rebuild per batch would scan the whole
    * record table). Bucket-duplicate rows are fine: work-id queries
    * dedup by id within a page exactly like the reference's GSI reads. */
  def append(batch: DataFrame): Unit =
    batch
      .filter(col("work_id").isNotNull)
      .withColumn("work_id_prefix", substring(col("work_id"), 0, prefixLen))
      .write.mode(SaveMode.Append)
      .partitionBy("work_id_prefix")
      .parquet(path)

  def lookup(workId: String, what: String): DataFrame =
    // explicit schema: an index whose batches all had null work_ids is an
    // empty directory, which schema inference cannot read
    spark.read
      .schema(WorkIdIndex.schema)
      .option("basePath", path)
      .parquet(path)
      .filter(col("work_id_prefix") === workId.take(prefixLen) &&
        col("work_id") === workId && col("what") === what)
      .drop("work_id_prefix")
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
