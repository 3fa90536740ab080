package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** At-least-once notification queue with the reference's SQS contract
  * (`ingester/datalake_ingester/sqs_queue.py`): long-poll receive, a
  * visibility timeout during which a claimed message is hidden from other
  * consumers, redelivery when the consumer dies without deleting, and
  * delete-only-after-successful-handling. */
trait NotificationQueue {
  /** One claimed message: `handle` is what [[delete]] needs. */
  final case class Message(handle: String, body: String)

  def send(body: String): Unit
  /** Claim the next visible message, waiting up to `waitMs` (long poll). */
  def receive(waitMs: Long): Option[Message]
  /** Claim up to `max` visible messages in one pass (SQS
    * `MaxNumberOfMessages`); waits up to `waitMs` only while empty.
    * Default is a receive loop — transports override with a cheaper
    * single-snapshot claim. */
  def receiveBatch(max: Int, waitMs: Long): Seq[Message] =
    receive(waitMs).toSeq.flatMap { first =>
      first +: Iterator.continually(receive(0L))
        .take(max - 1).takeWhile(_.isDefined).flatten.toSeq
    }
  /** Acknowledge successful handling — the message will never redeliver. */
  def delete(handle: String): Unit

  /** `SQSQueue.drain` (`sqs_queue.py:52-66`): invoke `handler` per
    * message, deleting each only after the handler returns. A handler
    * that throws leaves its message in flight — it redelivers after the
    * visibility timeout, exactly SQS's crash story. With a `timeout` the
    * drain returns once the queue stays empty for that long (the
    * reference's test mode); without one it polls forever. */
  def drain(handler: String => Unit, timeoutMs: Option[Long] = None): Int = {
    var handled = 0
    var continue = true
    while (continue) {
      receive(timeoutMs.getOrElse(20000L)) match {
        case Some(m) =>
          handler(m.body)
          delete(m.handle)
          handled += 1
        case None =>
          if (timeoutMs.isDefined) continue = false
      }
    }
    handled
  }
}

/** Directory-backed [[NotificationQueue]] — the sandbox has no SQS, so the
  * transport is a directory of one-file-per-message; the claim/redeliver
  * protocol is the part with SQS semantics and is what the spec exercises:
  *
  *   - a message is a `*.json` file (atomic create via temp + move)
  *   - claiming renames it to `<name>.inflight.<deadlineMs>` — the rename
  *     is the atomic arbiter between racing consumers (exactly one wins)
  *   - an in-flight file whose deadline passed is visible again and gets
  *     re-claimed with a fresh deadline (redelivery)
  *   - delete removes the claimed file; a consumer that crashes before
  *     deleting loses nothing — its message redelivers
  *
  * Swapping in real SQS is implementing the three primitives over the AWS
  * SDK; every consumer (drain loops, [[StreamingIngester.drainQueue]])
  * only sees the trait.
  */
final class DirNotificationQueue(
    dir: String,
    visibilityTimeoutMs: Long = 30000L,
    pollIntervalMs: Long = 25L) extends NotificationQueue {

  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    p
  }

  private val sendSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def send(body: String): Unit = {
    // ts + per-process sequence: single-producer sends keep their order
    // even within one millisecond (SQS itself only best-efforts this)
    val name = f"${System.currentTimeMillis()}%013d-${sendSeq.getAndIncrement()}%06d-${UUID.randomUUID().toString.take(8)}.json"
    val tmp = root.resolve(s".tmp-$name")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  private val Inflight = """(.+\.json)\.inflight\.(\d+)""".r

  /** Fresh messages plus expired in-flight ones, oldest first. */
  private def visible(now: Long): Seq[Path] = {
    val listing = Files.list(root)
    try listing.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".tmp-")) false
        else n match {
          case Inflight(_, deadline) => deadline.toLong <= now
          case _ => n.endsWith(".json")
        }
      }
      .toSeq.sortBy(_.getFileName.toString)
    finally listing.close()
  }

  /** Try to claim one listed path; None when a racing consumer won. */
  private def claim(p: Path, now: Long): Option[Message] = {
    val base = p.getFileName.toString match {
      case Inflight(orig, _) => orig
      case other => other
    }
    val claimed = root.resolve(s"$base.inflight.${now + visibilityTimeoutMs}")
    try {
      // rename is atomic: of N racing consumers exactly one succeeds
      Files.move(p, claimed, StandardCopyOption.ATOMIC_MOVE)
      Some(Message(claimed.getFileName.toString,
        new String(Files.readAllBytes(claimed), StandardCharsets.UTF_8)))
    } catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.nio.file.FileAlreadyExistsException => None // lost the race
    }
  }

  def receive(waitMs: Long): Option[Message] =
    receiveBatch(1, waitMs).headOption

  /** One directory snapshot claims the whole batch — not a listing (and
    * sort) per message, which is O(batch × dirsize) on a deep queue. */
  override def receiveBatch(max: Int, waitMs: Long): Seq[Message] = {
    val giveUp = System.currentTimeMillis() + waitMs
    while (true) {
      val now = System.currentTimeMillis()
      val out = visible(now).iterator
        .map(claim(_, now)).flatten.take(max).toSeq
      if (out.nonEmpty) return out
      if (System.currentTimeMillis() >= giveUp) return Nil
      Thread.sleep(pollIntervalMs)
    }
    Nil
  }

  def delete(handle: String): Unit =
    Files.deleteIfExists(root.resolve(handle))
}
