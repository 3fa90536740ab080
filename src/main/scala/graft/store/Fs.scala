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
      if (f.exists(marker)) {
        val in = f.open(marker)
        return try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim
        finally in.close()
      }
      attempts += 1
      try {
        val out = f.create(marker, false)
        try out.write(want.getBytes("UTF-8")) finally out.close()
        return want
      } catch { case e: java.io.IOException => if (attempts >= 5) throw e }
    }
    throw new java.io.IOException(s"cannot read or create marker $marker")
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
