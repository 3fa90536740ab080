package graft.store

import graft.SparkSuite
import graft.core.{DatalakeRecord, Metadata}
import org.apache.spark.sql.functions.col

class StoreMaintenanceSpec extends SparkSuite {

  val day: Long = DatalakeRecord.TimeBucketSizeMs

  def meta(i: Int, what: String = "w", workId: Option[String] = None): Metadata =
    Metadata(0, 500L * day + i, None, "here", what, workId,
      "/var/x.log", f"$i%032x", "h")

  test("compact merges per-partition small files without changing rows") {
    val store = new RecordStore(spark, tmpDir("cmp") + "/t")
    // 5 appends → 5 small files in the same (bucket, what) partition
    for (i <- 1 to 5)
      store.append(DatalakeRecord.listFromMetadata(
        meta(i), s"file:///$i", 1L, 2L))
    val before = store.records.orderBy(col("metadata.id")).collect()
    val dir = new java.io.File(
      store.records.inputFiles.head.stripPrefix("file:")).getParentFile
    assert(dir.listFiles().count(_.getName.endsWith(".parquet")) === 5)

    val compacted = store.compact(filesPerPartition = 1)
    assert(compacted === 1)
    assert(dir.listFiles().count(_.getName.endsWith(".parquet")) === 1)
    val after = store.records.orderBy(col("metadata.id")).collect()
    assert(after.toSeq === before.toSeq)
    // store remains appendable + queryable after the swap
    store.append(DatalakeRecord.listFromMetadata(meta(6), "file:///6", 1L, 2L))
    assert(store.records.count() === 6)
  }

  test("compact leaves already-compact partitions untouched") {
    val store = new RecordStore(spark, tmpDir("cmp2") + "/t")
    store.append((1 to 3).flatMap(i =>
      DatalakeRecord.listFromMetadata(meta(i), s"file:///$i", 1L, 2L)))
    assert(store.compact() === 0)
  }

  test("work-id index rebuild + pruned lookup") {
    val store = new RecordStore(spark, tmpDir("widx") + "/t")
    val withIds = (1 to 20).flatMap { i =>
      DatalakeRecord.listFromMetadata(
        meta(i, what = "job", workId = Some(s"w${i % 4}-id")), s"file:///$i", 1L, 2L)
    }
    val nulls = DatalakeRecord.listFromMetadata(
      meta(99, what = "job"), "file:///99", 1L, 2L)
    store.append(withIds ++ nulls)

    val idx = new WorkIdIndex(spark, tmpDir("widx2") + "/idx")
    idx.rebuild(store)
    val hit = idx.lookup("w1-id", "job").collect()
    assert(hit.map(_.getAs[org.apache.spark.sql.Row]("metadata")
      .getAs[String]("id")).sorted ===
      (1 to 20).filter(_ % 4 == 1).map(i => f"$i%032x").sorted)
    // null work_ids are not indexed
    assert(idx.lookup("w0-id", "job").count() === 5)

    // the querier takes the indexed path and returns identical pages
    val qIndexed = new graft.query.ArchiveQuerier(store, workIdIndex = Some(idx))
    val qPlain = new graft.query.ArchiveQuerier(store)
    val a = qIndexed.queryByWorkId("w2-id", "job").records.map(_.metadata.id)
    val b = qPlain.queryByWorkId("w2-id", "job").records.map(_.metadata.id)
    assert(a === b)
    assert(a.nonEmpty)

    // the index scan is partition-pruned to ONE work_id_prefix dir —
    // the GSI-equivalent locality claim, asserted at the plan level
    val lookupPlan = idx.lookup("w1-id", "job").queryExecution.sparkPlan
    val prunedScans = lookupPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.partitionFilters.exists(_.toString.contains("work_id_prefix")) => f
    }
    assert(prunedScans.nonEmpty, s"no prefix-pruned scan in:\n$lookupPlan")
    assert(prunedScans.head.selectedPartitions.partitionCount === 1,
      "expected exactly one work_id_prefix partition read")
  }
}
