package graft.store

import graft.SparkSuite
import graft.core.{DatalakeRecord, Metadata}
import org.apache.spark.sql.DataFrame

/** Model-based fuzz for the versioned latest table: a random sequence of
  * upsert batches (random keys, random starts/create_times, duplicate
  * keys within batches, replayed batches) must leave the table equal to
  * a trivial in-memory model of the monotone merge — per key, the max of
  * (start, create_time, id) ever upserted. Exercises the bucket-scoped
  * incremental merge, manifest commits, vacuum, and replay-safety in one
  * property. */
class LatestStoreFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val day = DatalakeRecord.TimeBucketSizeMs

  private def row(what: String, where: String, start: Long,
      createTime: Long): RecordRow =
    RecordRow.fromCore(DatalakeRecord.listFromMetadata(
      Metadata(0, start, None, where, what, None, "/var/x.log",
        f"${math.abs(41 * start + what.hashCode).toLong}%032x", "h"),
      s"file:///$what/$where/$start", createTime, 2L).head)

  test("random upsert sequences converge to the per-key monotone max") {
    val rng = new scala.util.Random(2024)
    val dir = tmpDir("lat-fuzz") + "/t"
    val store = new LatestStore(spark, dir, nBuckets = 4, keepVersions = 2)
    val keys = (1 to 12).map(i => (s"what${i % 5}", s"where$i"))
    // model: key -> (start, create_time, id) lexicographic max
    val model = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long, String)]

    var lastBatch: Seq[RecordRow] = Nil
    for (round <- 1 to 15) {
      val batch: Seq[RecordRow] =
        if (round % 5 == 0 && lastBatch.nonEmpty) lastBatch // exact replay
        else (1 to (1 + rng.nextInt(6))).map { _ =>
          val (what, where) = keys(rng.nextInt(keys.size))
          row(what, where, (100 + rng.nextInt(50)) * day,
            rng.nextInt(1000).toLong)
        }
      lastBatch = batch
      batch.foreach { r =>
        val k = (r.what, r.where)
        val cand = (r.metadata.start, r.create_time, r.metadata.id)
        val cur = model.get(k)
        if (cur.forall(c => Ordering[(Long, Long, String)].lt(c, cand)))
          model(k) = cand
      }
      store.upsert(batch.toDS().toDF())
    }

    val got = store.latest.collect().map { r =>
      val m = r.getAs[org.apache.spark.sql.Row]("metadata")
      (r.getAs[String]("what"), r.getAs[String]("where")) ->
        ((m.getAs[Long]("start"), r.getAs[Long]("create_time"),
          m.getAs[String]("id")))
    }.toMap
    assert(got === model.toMap)
    // invariant: exactly one row per key ever
    assert(store.latest.count() === model.size.toLong)
  }
}
