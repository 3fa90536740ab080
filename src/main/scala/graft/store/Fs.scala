package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem helpers for the store layer: every table mutation
  * (compaction swap, latest-table rewrite) goes through the FS API so the
  * same code runs on `file://`, HDFS, and object-store connectors —
  * `java.io.File` only works on a local disk and its `renameTo` fails
  * silently.
  *
  * The swap protocol is crash-safe on rename-capable filesystems: the
  * rewritten data lands in a dot-prefixed temp dir (invisible to Spark
  * partition discovery), the live dir is renamed aside to `.old` (not
  * deleted), the temp dir is promoted, and only then is the backup
  * removed. Every rename's return value is checked; a failed promotion
  * restores the backup and throws, so the table is never lost. On S3-like
  * stores without atomic rename the same sequencing still never deletes
  * the only copy before the replacement is fully in place — the
  * transactional upgrade path is a Delta/Iceberg commit, which slots in
  * behind the same interface.
  */
private[store] object Fs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Promote `tmp` over `live` with a `.old` backup. `tmp` must exist. */
  def swap(spark: SparkSession, tmp: String, live: String): Unit = {
    val f = fs(spark, live)
    val tmpP = new Path(tmp)
    val liveP = new Path(live)
    val backup = new Path(live + ".old")
    if (f.exists(backup) && !f.delete(backup, true))
      throw new java.io.IOException(s"cannot clear stale backup $backup")
    val hadLive = f.exists(liveP)
    if (hadLive && !f.rename(liveP, backup))
      throw new java.io.IOException(s"cannot move $liveP aside to $backup")
    if (!f.rename(tmpP, liveP)) {
      // restore the previous table before failing — never leave no table
      if (hadLive) f.rename(backup, liveP)
      throw new java.io.IOException(s"cannot promote $tmpP to $liveP")
    }
    if (hadLive) f.delete(backup, true)
  }

  /** Remove Spark writer artifacts that would confuse partition discovery
    * after a directory is spliced into a partitioned table. */
  def dropWriterArtifacts(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    f.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      if (n == "_SUCCESS" || n.endsWith(".crc")) f.delete(st.getPath, false)
    }
  }
}
