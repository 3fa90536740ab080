package graft.streaming

import graft.core._
import graft.store.{LatestStore, MetadataRow, RecordRow, RecordStore}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Per-message ingestion telemetry (`ingester.py:27-65`, README.md:264-306):
  * `{version, status: success|error, start, duration, records[]}`. */
final case class ReportRecord(
    url: String,
    size: Long,
    create_time: Long,
    metadata: MetadataRow)

final case class IngesterReport(
    version: Int,
    status: String,
    start: Long,
    duration: Double,
    records: Seq[ReportRecord],
    message: Option[String])

/** `fatal` carries an UNSAFE exception's rendering: the reference
  * publishes the error report in `finally` and THEN re-raises
  * (`ingester.py:88-99`) — so the poison pill must cross the executor
  * boundary as data, be reported, and only then stop the stream. */
final case class IngestResult(
    records: Seq[RecordRow],
    report: IngesterReport,
    fatal: Option[String] = None)

/** Message handler reproducing `Ingester.handler` (`ingester.py:88-114`):
  * parse the notification, dispatch per event (Put/CompleteMultipartUpload
  * ⇒ add, Copy ⇒ update — identical for an idempotent store, other names ⇒
  * UnsupportedS3Event, `s3:TestEvent` ⇒ no-op), resolve each url through
  * the content store, and expand into per-bucket records.
  *
  * SAFE exceptions (bad notification/event/metadata/time-range/missing
  * file, `ingester.py:16-25`) produce an error report and the stream
  * continues; anything else re-raises (poison-pill stops the stream).
  */
final class Ingester(
    contentStore: ContentStore,
    clock: () => Long = () => System.currentTimeMillis())
  extends Serializable {

  def handle(notificationJson: String): IngestResult = {
    val startMs = clock()
    val collected = scala.collection.mutable.LinkedHashMap.empty[String, RecordRow]
    try {
      val n = S3Notification.parse(notificationJson)
      n.events.foreach { e =>
        if (!S3Notification.EventsWithRecords.contains(e.eventName))
          throw new UnsupportedS3Event(
            s"Datalake does not support S3 publish event type ${e.eventName}.")
        val (meta, size, createTime) = contentStore.fetch(e.s3Url)
        DatalakeRecord.listFromMetadata(meta, e.s3Url, createTime, size)
          .foreach(r => collected(r.url + "#" + r.timeBucket) =
            RecordRow.fromCore(r))
      }
      IngestResult(collected.values.toSeq,
        IngesterReport(0, "success", startMs,
          (clock() - startMs) / 1000.0, reportRecords(collected), None))
    } catch {
      // the reference's handler reports EVERY exception (error status +
      // message, `finally: self._report(ir)`) and re-raises only the
      // unsafe ones — so both arms build the same error report; the
      // unsafe arm additionally marks the result fatal so
      // [[StreamingIngester.processBatch]] can re-raise AFTER the
      // report is persisted (previously an unsafe exception produced no
      // report at all and dropped the earlier events' records)
      case e: Exception =>
        // events handled before the failing one keep their records — the
        // reference stores each record as it goes, so an error part-way
        // through a multi-event message leaves the earlier files indexed
        IngestResult(collected.values.toSeq,
          IngesterReport(0, "error", startMs, (clock() - startMs) / 1000.0,
            reportRecords(collected),
            // str(e) semantics: getMessage is null for e.g. a bare NPE,
            // and Some(null) would emit a null message field where the
            // reference always reports text
            Some(Option(e.getMessage).getOrElse(e.toString))),
          fatal = if (Ingester.isSafe(e)) None else Some(e.toString))
    }
  }

  /** Report lists each distinct url once, LAST occurrence winning
    * (`ingester.py:35-36` — `self.records[r['url']] = r` is a dict
    * overwrite, so a Put followed by a Copy of the same url reports the
    * rewrite's size/metadata, matching what the store keeps). */
  private def reportRecords(
      collected: scala.collection.mutable.LinkedHashMap[String, RecordRow])
    : Seq[ReportRecord] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, ReportRecord]
    collected.values.foreach { r =>
      seen(r.url) = ReportRecord(r.url, r.size, r.create_time, r.metadata)
    }
    seen.values.toSeq
  }
}

object Ingester {
  /** `SAFE_EXCEPTIONS` (`ingester.py:16-25`). */
  def isSafe(e: Throwable): Boolean = e match {
    case _: InvalidS3Notification | _: InvalidS3Event |
         _: UnsupportedTimeRange | _: NoSuchDatalakeFile |
         _: InvalidDatalakeMetadata | _: UnsupportedS3Event => true
    case _ => false
  }
}

/** Structured Streaming replacement for the SQS-driven pipeline
  * (`ingester.py:131-137` + `queue.py:50-78`): a file source watches a
  * notification directory (one JSON document per file — the reference's
  * inotify/SQS delivery unit), each micro-batch parses + expands records
  * on the executors, and `foreachBatch` writes the records table, merges
  * the latest table, and appends the report side-output. The reference's
  * at-least-once + idempotent-put contract becomes dedup-on-append +
  * monotone latest MERGE, which is replay-safe (T3, strictly stronger).
  */
/** @param compactEvery when > 0, run `recordStore.compact()` after
  *        every N ingested batches: each micro-batch appends one small
  *        file per touched (bucket, what) cell, and without periodic
  *        compaction a long-running stream fragments the table (and
  *        widens the per-dir scan union). Safe inline because the
  *        compaction commit is snapshot-isolated and yields to racing
  *        writers; readers concurrent with it keep resolving complete
  *        snapshots. The reference never needed this — DynamoDB has no
  *        files — so it is an operational knob, not reference parity. */
final class StreamingIngester(
    spark: SparkSession,
    contentStore: ContentStore,
    recordStore: RecordStore,
    latestStore: Option[LatestStore] = None,
    reportPath: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis(),
    compactEvery: Int = 0) {

  import spark.implicits._

  private val ingester = new Ingester(contentStore, clock)
  private val batchesSinceCompact = new java.util.concurrent.atomic.AtomicLong

  /** One ingest batch: records + latest + report in one pass.
    *
    * `batchTag` keys the report side-output: with a tag (the streaming
    * path passes the foreachBatch batch id) each batch's reports land
    * in their own overwritten `batch=<tag>` dir, so an at-least-once
    * REPLAY rewrites the same reports instead of appending a second
    * copy — the records/latest stores were always replay-convergent,
    * but an Append report sink double-counted. Untagged calls
    * ([[drainQueue]], whose redeliveries have no stable batch identity)
    * write a unique `batch=queue-<uuid>` dir — the whole report tree
    * stays one uniform partitioned layout Spark can read in a single
    * `read.json(reportPath)` (a tree started by the pre-`batch=` code
    * is upgraded in place first: [[migrateLegacyReports]] moves its
    * flat root files into `batch=legacy/`) — and keep
    * Append-equivalent semantics: a
    * crash between processBatch and queue-delete may duplicate reports
    * there, records never.
    *
    * A FATAL (unsafe-exception) result follows the reference's
    * publish-then-raise contract (`ingester.py:88-99`): everything the
    * batch collected is written and its error report persisted, THEN
    * the poison pill stops the stream — nothing is deleted or
    * checkpointed, so the message redelivers. */
  def processBatch(batch: Dataset[String],
      batchTag: Option[String] = None): Unit = {
    val ing = ingester
    val results = batch.map(ing.handle).persist()
    try {
      val records = results.flatMap(_.records)
      recordStore.appendDf(records.toDF(), dedupAgainstExisting = true)
      latestStore.foreach(_.upsert(records.toDF()))
      reportPath.foreach { p =>
        migrateLegacyReports(p)
        val reports = results.map(_.report)
        batchTag match {
          case Some(t) => reports.write.mode(SaveMode.Overwrite)
            .json(s"$p/batch=$t")
          case None =>
            // Uniform partition-style layout (ADVICE r10): Spark cannot
            // read a directory mixing data files at the root with
            // batch=<id> subdirs ("conflicting directory structures"),
            // so queue drains get their own batch=queue-<uuid> dir
            // instead of appending flat files. The dir is fresh, so
            // Overwrite≡Append; redeliveries still have no stable batch
            // identity, so a crash between processBatch and queue-delete
            // may duplicate reports (as the old Append did) — records
            // never. Read the report tree with
            // `spark.read.json(s"$reportPath/batch=*")`.
            reports.write.mode(SaveMode.Overwrite)
              .json(s"$p/batch=queue-${java.util.UUID.randomUUID()}")
        }
      }
      val fatal = results.flatMap(_.fatal.toSeq).take(1)
      fatal.headOption.foreach { msg =>
        throw new IllegalStateException(
          s"unsafe ingest exception (reported, message NOT consumed): $msg")
      }
    } finally results.unpersist()
    if (compactEvery > 0 &&
        batchesSinceCompact.incrementAndGet() % compactEvery == 0)
      recordStore.compact()
  }

  // migrate-once latch: the listing costs one RPC per report write and
  // the root only needs checking until it is known clean. The latch is
  // set only AFTER a migration completes — latching on entry would make
  // one failed rename permanently skip migration for this instance, and
  // the next write would create the exact mixed flat+batch= layout the
  // migration exists to prevent.
  private val legacyReportsChecked =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Upgrade a report tree written by the pre-`batch=` code: that code
    * appended part files FLAT at the report root, and Spark refuses to
    * read a directory mixing root data files with `batch=<id>` subdirs
    * ("conflicting directory structures"). On the first write of each
    * ingester instance, any regular file still sitting at the root is
    * MOVED into `batch=legacy/` — same rows, one uniform partitioned
    * layout, `spark.read.json(reportPath)` works across the upgrade.
    * Hidden files (`_SUCCESS`, `.*.crc`) move too: Spark readers ignore
    * them wherever they sit, and a clean root keeps the layout
    * self-describing. Rename, not copy — atomic per file on any
    * sane filesystem, and a crash mid-migration just leaves fewer flat
    * files for the next attempt. */
  private def migrateLegacyReports(p: String): Unit = {
    if (legacyReportsChecked.get()) return
    legacyReportsChecked.synchronized {
      if (legacyReportsChecked.get()) return
      val hconf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(hconf)
      if (fs.exists(root)) {
        val flat = fs.listStatus(root).filter(_.isFile)
        if (flat.nonEmpty) {
          val legacy = new org.apache.hadoop.fs.Path(root, "batch=legacy")
          fs.mkdirs(legacy)
          flat.foreach { f =>
            val dest =
              new org.apache.hadoop.fs.Path(legacy, f.getPath.getName)
            if (!fs.rename(f.getPath, dest))
              // throws WITHOUT latching: the batch fails, and the next
              // processBatch retries the migration (rename is atomic per
              // file, so a partial pass just leaves fewer flat files)
              throw new IllegalStateException(
                s"report-layout migration failed: could not move " +
                  s"${f.getPath} to $dest — a root mixing flat files " +
                  s"with batch= dirs is unreadable; move the flat files " +
                  s"into $legacy manually and retry")
          }
        }
      }
      legacyReportsChecked.set(true)
    }
  }

  /** Drain a [[NotificationQueue]] through the Spark ingest path with the
    * reference's at-least-once contract (`sqs_queue.py:52-66`): claim up
    * to `maxBatch` messages, process them as ONE Spark batch (records +
    * latest + report in the same pass), and delete the claims only after
    * the batch commits. A crash mid-batch deletes nothing — every message
    * redelivers after its visibility timeout, and the store's
    * anti-join/monotone-merge idempotence makes the replay a no-op.
    * Returns the number of messages processed before the queue stayed
    * empty for `idleTimeoutMs`. */
  def drainQueue(
      queue: NotificationQueue,
      maxBatch: Int = 100,
      idleTimeoutMs: Long = 1000L): Int = {
    var total = 0
    var continue = true
    while (continue) {
      val claimed = queue.receiveBatch(maxBatch, idleTimeoutMs)
      if (claimed.isEmpty) continue = false
      else {
        processBatch(spark.createDataset(claimed.map(_.body)))
        claimed.foreach(m => queue.delete(m.handle))
        total += claimed.size
      }
    }
    total
  }

  /** Start the stream over a directory of notification JSON files. */
  def start(
      notificationDir: String,
      checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .option("wholetext", "true")
      .text(notificationDir)
      .as[String]
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[String], id: Long) =>
        processBatch(batch, Some(id.toString)))
    // AvailableNow ⇒ drain-then-stop (the reference's listen(timeout) test
    // mode, `queue.py:52-66`); default ⇒ continuous micro-batches.
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
