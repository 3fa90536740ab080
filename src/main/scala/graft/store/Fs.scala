package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem helpers for the store layer: every table mutation
  * goes through the FS API so the same code runs on `file://`, HDFS,
  * and object-store connectors — `java.io.File` only works on a local
  * disk and its `renameTo` fails silently.
  *
  * Durability now comes from the manifest-commit protocol
  * ([[ManifestLog]] + [[ManifestCommitter]]): data dirs are immutable
  * (created once, garbage-collected later, never renamed), and the only
  * rename anywhere is the manifest's own rename-as-commit — the layout
  * that stays correct even on object stores without atomic directory
  * operations.
  */
private[graft] object Fs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Read-or-create a small exclusive config marker, returning the
    * stored content (existing, or `want` if this caller created it) —
    * the persist-or-validate discipline every bucketed store pins its
    * layout parameters with. Two racing creators resolve through the
    * exclusive create (the loser re-reads the winner's value); a
    * PERSISTENT create failure (read-only filesystem, permissions)
    * surfaces after a bounded number of attempts instead of recursing
    * until StackOverflowError. */
  def ensureMarker(f: FileSystem, marker: Path, want: String): String = {
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      if (f.exists(marker)) {
        val in = f.open(marker)
        val stored = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim
        finally in.close()
        // An empty read is a concurrent creator's create→write window
        // (create() makes the path visible before the bytes land), not a
        // value: returning "" would fail callers' parse (toInt) or read
        // as a spurious mismatch. Retry within the attempt budget; a
        // marker that is STILL empty after 5 looks is corrupt and
        // surfaces as the loud IOException below.
        if (stored.nonEmpty) return stored
        // 50/100/150/200/250 ms: ~750 ms of total patience for the
        // concurrent creator — a loaded box can delay its write thread
        // well past the first retry, and giving up early turns a benign
        // race into a spurious open failure
        Thread.sleep(50L * attempts)
      } else {
        try {
          val out = f.create(marker, false)
          try out.write(want.getBytes("UTF-8")) finally out.close()
          return want
        } catch { case e: java.io.IOException => if (attempts >= 5) throw e }
      }
    }
    throw new java.io.IOException(
      s"cannot read or create marker $marker (empty or unwritable after 5 attempts)")
  }

  /** Read an existing marker WITHOUT creating it — the read-only-caller
    * half of the [[ensureMarker]] discipline: a probe of a virgin store
    * must not pin ITS parameters as the store's identity (that would
    * lock out the tuned writer that arrives later) and must work on a
    * read-only filesystem. Returns None when the marker does not exist;
    * retries the empty-read window exactly like ensureMarker. */
  def readMarker(f: FileSystem, marker: Path): Option[String] = {
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      if (!f.exists(marker)) return None
      val in = f.open(marker)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim
      finally in.close()
      if (stored.nonEmpty) return Some(stored)
      Thread.sleep(50L * attempts)
    }
    throw new java.io.IOException(
      s"marker $marker still empty after 5 reads — corrupt?")
  }

  /** Atomically replace a config marker's content: write a temp file
    * beside it, then rename-with-overwrite into place (FileContext's
    * OVERWRITE rename — atomic on local disk and HDFS; an object store
    * without atomic rename degrades to best-effort, which is fine for
    * the one caller: a legacy-marker UPGRADE whose failure just means
    * the next open re-validates the legacy form). Never throws — an
    * upgrade must not fail an open that already validated. */
  def replaceMarker(spark: SparkSession, marker: Path, content: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new Path(marker.getParent,
      marker.getName + ".tmp-" + java.util.UUID.randomUUID())
    try {
      val f = marker.getFileSystem(conf)
      val out = f.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      try org.apache.hadoop.fs.FileContext.getFileContext(marker.toUri, conf)
        .rename(tmp, marker, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      catch { case e: Exception =>
        // the write landed but the swap didn't: remove the temp (one
        // leaked file per failed attempt otherwise) before reporting
        try f.delete(tmp, false) catch { case _: Exception => () }
        throw e
      }
    } catch {
      // an interrupt is not a filesystem failure: restore the flag so
      // the caller's cancellation still lands
      case _: InterruptedException => Thread.currentThread().interrupt()
      // best-effort by contract, but never SILENT: an environment where
      // the upgrade can never land (no rename support, permission
      // asymmetry) should say so once per attempt, not hide it
      case e: Exception =>
        System.err.println(
          s"[fs] marker upgrade for $marker did not land " +
            s"(will re-validate legacy next open): $e")
    }
  }

  /** Sum of parquet footer record counts + file bytes for `parts`,
    * read driver-side on the common pool — footer opens are IO-bound
    * round trips (~ms each), so the walk is ~cores× parallel. The one
    * footer-reading loop in the codebase ([[ManifestLog.rowCount]] and
    * [[graft.operators.CellIndex]]'s `warm` both ride it). */
  def footerRows(conf: org.apache.hadoop.conf.Configuration,
      parts: Array[org.apache.hadoop.fs.FileStatus]): (Long, Long) = {
    val rows = new java.util.concurrent.atomic.AtomicLong()
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    java.util.Arrays.stream(parts).parallel().forEach { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try rows.addAndGet(r.getRecordCount) finally r.close()
      bytes.addAndGet(st.getLen)
    }
    (rows.get(), bytes.get())
  }
}
