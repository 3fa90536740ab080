package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Table readers for the battery queries.
  *
  * The driver's test parquet ships as one single-row-group file per table,
  * which Spark cannot split — every scan would be one task regardless of
  * `maxPartitionBytes`. `read` re-parallelizes only when the source arrives
  * with fewer partitions than half the cores; on a real deployment (many
  * files / row groups per table) the condition is false and no extra
  * exchange is added. The probe (`df.rdd.getNumPartitions`) forces
  * physical planning, so its verdict is cached per path — one probe per
  * table per JVM, not per query.
  */
object Tables {

  private val boostCache = TrieMap.empty[String, Boolean]

  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = s.read.parquet(path)
    val cores = s.sparkContext.defaultParallelism
    val boost = boostCache.getOrElseUpdate(path,
      df.rdd.getNumPartitions < cores / 2)
    if (boost) df.repartition(cores) else df
  }
}
