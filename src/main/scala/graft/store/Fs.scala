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
}
