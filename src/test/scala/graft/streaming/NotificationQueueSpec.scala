package graft.streaming

import graft.SparkSuite
import graft.core.Metadata
import graft.store.RecordStore

/** Spark drain path over the queue transport — the at-least-once ingest
  * into the idempotent store. The transport-level SQS semantics (claim,
  * visibility timeout, redelivery, racing consumers) are pinned by
  * [[NotificationQueueContract]] / [[DirNotificationQueueSpec]]. */
class NotificationQueueSpec extends SparkSuite {

  private def queue(visMs: Long = 30000L): DirNotificationQueue =
    new DirNotificationQueue(tmpDir("queue"), visibilityTimeoutMs = visMs)

  test("drainQueue ingests a batch and redelivery is a store no-op") {
    val dir = tmpDir("qingest")
    val meta = Metadata.build(Map(
      "what" -> "qlog", "where" -> "qhost", "work_id" -> null,
      "start" -> Long.box(1430000000000L), "end" -> Long.box(1430003600000L),
      "path" -> "/var/log/q.log", "hash" -> "deadbeef",
      "id" -> "fe1ed1e0beef4e06b0d3b2b1e5d1c001"))
    val url = "s3://datalake-test/q/qlog"
    val cs = new FakeContentStore(Map(url -> meta.json))
    val store = new RecordStore(spark, s"$dir/records")
    val ingester = new StreamingIngester(spark, cs, store)

    def notif: String = {
      val msg = ("""{"Records": [{"eventVersion": "2.0", """ +
        """"eventName": "ObjectCreated:Put", """ +
        """"s3": {"bucket": {"name": "datalake-test"}, """ +
        """"object": {"key": "q/qlog"}}}]}""")
        .replace("\"", "\\\"")
      s"""{"Type": "Notification", "Message": "$msg"}"""
    }

    val q = queue()
    q.send(notif)
    assert(ingester.drainQueue(q, idleTimeoutMs = 300L) === 1)
    val afterFirst = store.records.count()
    assert(afterFirst > 0)

    // the queue is drained — nothing left to claim
    assert(q.receive(50L).isEmpty)

    // redelivery (same notification again): at-least-once upstream,
    // exactly-once in the store
    q.send(notif)
    assert(ingester.drainQueue(q, idleTimeoutMs = 300L) === 1)
    assert(store.records.count() === afterFirst)
  }

  test("compactEvery keeps a long-running ingest's cell defragmented") {
    val dir = tmpDir("qcompact")
    def metaFor(i: Int) = Metadata.build(Map(
      "what" -> "qlog", "where" -> s"host$i", "work_id" -> null,
      "start" -> Long.box(1430000000000L + i), "end" -> null,
      "path" -> s"/var/log/q$i.log", "hash" -> "deadbeef",
      "id" -> f"fe1ed1e0beef4e06b0d3b2b1e5d1c0$i%02d"))
    val urls = (1 to 4).map(i => s"s3://datalake-test/q/qlog$i" -> metaFor(i).json)
    val cs = new FakeContentStore(urls.toMap)
    val store = new RecordStore(spark, s"$dir/records")
    // compact after every 2nd batch
    val ingester = new StreamingIngester(spark, cs, store, compactEvery = 2)
    def notif(i: Int): String = {
      val msg = (s"""{"Records": [{"eventVersion": "2.0", """ +
        s""""eventName": "ObjectCreated:Put", """ +
        s""""s3": {"bucket": {"name": "datalake-test"}, """ +
        s""""object": {"key": "q/qlog$i"}}}]}""")
        .replace("\"", "\\\"")
      s"""{"Type": "Notification", "Message": "$msg"}"""
    }
    val q = queue()
    // one message per batch (maxBatch = 1) -> 4 batches into ONE cell
    for (i <- 1 to 4) {
      q.send(notif(i))
      assert(ingester.drainQueue(q, maxBatch = 1, idleTimeoutMs = 200L) === 1)
    }
    assert(store.records.count() === 4)
    // 4 single-file appends would leave 4 files; the two compactions
    // (after batches 2 and 4) collapse the cell back to one
    assert(store.records.inputFiles.length === 1,
      s"expected a compacted cell, got ${store.records.inputFiles.length} files")
  }
}
