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
}
