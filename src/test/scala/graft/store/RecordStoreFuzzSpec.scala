package graft.store

import graft.SparkSuite
import graft.core.{DatalakeRecord, Metadata}
import org.apache.spark.sql.functions.col

/** Model-based fuzz for the manifested record table: a random
  * interleaving of idempotent appends (with replayed duplicates),
  * compactions, and orphan sweeps must always agree with a trivial
  * in-memory model keyed on (time_bucket, id) first-write-wins — and
  * every pinned snapshot version must keep re-reading its exact model
  * state. Catches manifest bookkeeping errors (lost dirs, double
  * references, bad supersede) that targeted tests can miss. */
class RecordStoreFuzzSpec extends SparkSuite {

  val day: Long = DatalakeRecord.TimeBucketSizeMs

  test("random append/compact/vacuum interleavings match the model") {
    val rng = new scala.util.Random(41)
    val store = new RecordStore(spark, tmpDir("rsfuzz") + "/t",
      keepVersions = 2)
    // model: (time_bucket, id) -> url of the FIRST write
    var model = Map.empty[(Long, String), String]
    // snapshots: version -> model state at that commit
    var snapshots = Vector.empty[(Long, Map[(Long, String), String])]

    def randomBatch(): Seq[DatalakeRecord] =
      (0 until (1 + rng.nextInt(4))).flatMap { _ =>
        val i = rng.nextInt(12) // small id space forces replay collisions
        val bucket = 500L + rng.nextInt(3)
        DatalakeRecord.listFromMetadata(
          Metadata(0, bucket * day + i, None, "here", "w", None,
            "/var/x.log", f"$i%032x", "h"),
          s"file:///b$bucket/i$i/${rng.nextInt(1000)}", 1L, 2L)
      }
        // within-batch key-unique: dropDuplicates keeps an ARBITRARY row
        // within one batch, which a deterministic model can't mirror;
        // cross-batch replays (different random urls) still exercise the
        // anti-join's first-write-wins
        .groupBy(r => (r.timeBucket, r.metadata.id))
        .map(_._2.head).toSeq

    def observed(df: org.apache.spark.sql.DataFrame)
        : Map[(Long, String), String] =
      df.select(col("time_bucket"), col("metadata.id"), col("url"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap

    for (step <- 1 to 18) {
      rng.nextInt(5) match {
        case 0 | 1 | 2 =>
          val batch = randomBatch()
          val session = spark
          import session.implicits._
          store.appendDf(batch.map(RecordRow.fromCore).toDS().toDF(),
            dedupAgainstExisting = true)
          // model: first write per (bucket, id) wins — within-batch
          // dropDuplicates keeps an arbitrary row, so make batches
          // within-key-unique by folding left like the store does
          batch.foreach { r =>
            val k = (r.timeBucket, r.metadata.id)
            if (!model.contains(k)) model += k -> r.url
          }
        case 3 =>
          store.compact(filesPerPartition = 1 + rng.nextInt(2))
        case 4 =>
          // fresh-but-unreferenced dirs don't exist mid-test (no
          // concurrent writers), so a zero-age sweep must reclaim
          // nothing that any snapshot still reads
          store.vacuumOrphans(0L)
      }
      assert(observed(store.records) === model, s"divergence at step $step")
      if (store.versions.nonEmpty)
        snapshots :+= (store.versions.last, model)
      // every still-resolvable pinned snapshot re-reads ITS state
      val live = store.versions.toSet
      snapshots = snapshots.filter { case (v, _) => live(v) }
      for ((v, m) <- snapshots)
        assert(observed(store.recordsAt(v)) === m,
          s"snapshot v$v diverged at step $step")
    }
    assert(model.nonEmpty)
  }
}
