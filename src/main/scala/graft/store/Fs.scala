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
