package graft.streaming

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Behavior contract every [[NotificationQueue]] adapter must satisfy —
  * the reference's SQS semantics (`sqs_queue.py`): long-poll receive,
  * visibility timeout, redelivery on consumer death, delete only after
  * handling, exactly-one-claim under racing consumers. Run against
  * [[DirNotificationQueue]] here; a real SQS adapter extends this with
  * its own `newQueue()` (against moto/localstack or a test queue) and
  * must pass unchanged.
  */
abstract class NotificationQueueContract extends AnyFunSuite {

  /** A fresh, empty queue per test with the given visibility timeout. */
  def newQueue(visibilityTimeoutMs: Long = 30000L): NotificationQueue

  test("send/receive/delete round-trip; claimed messages are invisible") {
    val q = newQueue()
    q.send("""{"n":1}""")
    val m = q.receive(200L)
    assert(m.map(_.body) === Some("""{"n":1}"""))
    // claimed: a second consumer sees nothing
    assert(q.receive(50L).isEmpty)
    q.delete(m.get.handle)
    assert(q.receive(50L).isEmpty) // deleted: gone for good
  }

  test("messages deliver oldest-first") {
    val q = newQueue()
    (1 to 5).foreach(i => q.send(s"msg-$i"))
    val got = Iterator.continually(q.receive(50L))
      .takeWhile(_.isDefined).flatten.map(_.body).toSeq
    assert(got === (1 to 5).map(i => s"msg-$i"))
  }

  test("visibility timeout: unacked message redelivers") {
    val q = newQueue(visibilityTimeoutMs = 150L)
    q.send("crashy")
    val first = q.receive(100L)
    assert(first.map(_.body) === Some("crashy"))
    // consumer "crashes" (no delete): invisible until the deadline, then back
    assert(q.receive(20L).isEmpty)
    val again = q.receive(2000L)
    assert(again.map(_.body) === Some("crashy"))
    q.delete(again.get.handle)
    assert(q.receive(200L).isEmpty) // redelivered handle deletes cleanly
  }

  test("drain handles each message once and deletes after the handler") {
    val q = newQueue()
    (1 to 7).foreach(i => q.send(s"m$i"))
    val seen = mutable.Buffer.empty[String]
    val n = q.drain(seen += _, timeoutMs = Some(100L))
    assert(n === 7)
    assert(seen.sorted === (1 to 7).map(i => s"m$i").sorted)
    assert(q.receive(50L).isEmpty)
  }

  test("drain: a throwing handler leaves the message for redelivery") {
    val q = newQueue(visibilityTimeoutMs = 150L)
    q.send("poison")
    intercept[RuntimeException](
      q.drain(_ => throw new RuntimeException("boom"), Some(100L)))
    // not deleted: after the visibility timeout it drains fine
    var second = 0
    val n = q.drain(_ => second += 1, Some(2000L))
    assert(n === 1 && second === 1)
  }

  test("racing consumers: every message claimed exactly once") {
    val q = newQueue()
    val total = 40
    (1 to total).foreach(i => q.send(s"r$i"))
    val pool = Executors.newFixedThreadPool(4)
    val claimed = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val done = new CountDownLatch(4)
    (1 to 4).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          Iterator.continually(q.receive(100L)).takeWhile(_.isDefined)
            .flatten.foreach { m => claimed.add(m.body); q.delete(m.handle) }
          done.countDown()
        }
      })
    }
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    val bodies = claimed.asScala.toSeq
    assert(bodies.size === total) // nothing lost
    assert(bodies.distinct.size === total) // nothing double-claimed
  }

  test("receiveBatch claims up to max, leaves the rest visible") {
    val q = newQueue()
    (1 to 9).foreach(i => q.send(s"b$i"))
    val batch = q.receiveBatch(4, 100L)
    assert(batch.size === 4)
    assert(batch.map(_.body) === (1 to 4).map(i => s"b$i"))
    // unclaimed messages stay visible for the next batch
    val rest = q.receiveBatch(100, 100L)
    assert(rest.map(_.body) === (5 to 9).map(i => s"b$i"))
    assert(q.receiveBatch(10, 50L).isEmpty)
  }
}

/** The contract run against the directory-backed transport. */
class DirNotificationQueueSpec extends NotificationQueueContract {
  def newQueue(visibilityTimeoutMs: Long): NotificationQueue =
    new DirNotificationQueue(
      java.nio.file.Files.createTempDirectory("nqc").toString,
      visibilityTimeoutMs = visibilityTimeoutMs)
}
