package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSuite {

  test("watermarked hourly counts over a drained stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = StreamOps.hourlyCounts(df)
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly_out").start()
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((t(0, 10), "click"), (t(0, 40), "click"), (t(0, 50), "view"))
    q.processAllAvailable()
    // advance event time far past the watermark so hour 0 finalizes
    input.addData((t(9, 0), "click"))
    q.processAllAvailable()
    val out = spark.table("hourly_out")
      .select($"hour_start", $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    q.stop()
    assert(out === Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 00:00:00.0", "view", 1L)))
  }

  test("streaming dedup suppresses in-window duplicates, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Int)]
    val df = input.toDF().toDF("ts", "doc_key", "payload")
    val q = StreamOps.streamingDedup(df, Seq("doc_key"), watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // duplicates inside the watermark window: suppressed
    input.addData((t(0, 0), "a", 1), (t(0, 1), "a", 2), (t(0, 2), "b", 3))
    q.processAllAvailable()
    input.addData((t(0, 3), "a", 4), (t(0, 4), "b", 5), (t(0, 5), "c", 6))
    q.processAllAvailable()
    // advance the watermark far past the first window: key state for a/b/c
    // is dropped, so a re-arrival of "a" is a NEW row (the documented
    // late-data contract — state is bounded, not historical)
    input.addData((t(2, 0), "z", 7))
    q.processAllAvailable()
    input.addData((t(2, 1), "a", 8))
    q.processAllAvailable()
    val out = spark.table("dedup_out")
      .select($"doc_key", $"payload").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    q.stop()
    assert(out === Set(("a", 1), ("b", 3), ("c", 6), ("z", 7), ("a", 8)))
  }

  test("streaming curation: dedup + redact + quality + sampling on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text", "lang")
    val q = StreamOps.streamingCuration(df, stratumCol = "lang",
      rates = Map.empty, defaultPct = 100, minWords = 5,
      watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("curated_out").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val longText = "contact me at alice@example.org about the " +
      "quarterly report draft please"
    input.addData(
      (t(0), 1L, longText, "en"),          // kept, email redacted
      (t(2), 3L, "too short", "en"),       // quality-filtered
      (t(3), 4L, "a completely different sentence with many words inside", "en"))
    q.processAllAvailable()
    // the duplicate arrives in a LATER micro-batch: doc 1 is already in
    // the dedup state, so suppression is deterministic (within one batch
    // the surviving duplicate would be an ordering accident)
    input.addData((t(1), 2L, longText, "en"))
    q.processAllAvailable()
    val out = spark.table("curated_out")
      .select($"doc_id", $"redacted", $"n_emails").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    q.stop()
    assert(out.map(_._1).sorted === Array(1L, 4L))
    val doc1 = out.find(_._1 == 1L).get
    assert(doc1._2.contains("<EMAIL>") && !doc1._2.contains("alice@"))
    assert(doc1._3 === 1)
  }

  test("streaming scrub: strip + NFC + blocklist ahead of the curation " +
    "chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text", "lang")
    val q = StreamOps.streamingScrub(df,
      boilerplate = Seq("SUBSCRIBE to our newsletter"),
      stratumCol = "lang", rates = Map.empty, defaultPct = 100,
      minWords = 5, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_out").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // decomposed é (e + U+0301) wrapped in markup, plus a boilerplate line
    val decomposed = "<p>the nice cafe\u0301 on the corner serves " +
      "breakfast</p>\nSUBSCRIBE to our newsletter"
    // the same text, composed (U+00E9), different markup: after strip +
    // NFC the bytes are identical, so the dedup hash must collapse them
    val composed = "<div>the nice caf\u00e9 on the corner serves " +
      "breakfast</div>"
    input.addData(
      (t(0), 1L, decomposed, "en"),
      (t(2), 3L, "<b>tiny</b>", "en")) // quality-filtered after strip
    q.processAllAvailable()
    input.addData((t(1), 2L, composed, "en")) // later batch: deterministic
    q.processAllAvailable()
    val out = spark.table("scrub_out")
      .select($"doc_id", $"redacted").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    q.stop()
    assert(out.map(_._1).toSeq === Seq(1L))
    val text1 = out.head._2
    // markup and the boilerplate line are gone; the é is composed
    assert(text1 === "the nice caf\u00e9 on the corner serves breakfast")
  }

  test("curateWithHistory suppresses duplicates beyond any watermark " +
    "window via the fingerprint index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text", "lang")
    val idxDir = java.nio.file.Files.createTempDirectory("fpidx-stream")
    val idx = new graft.store.FingerprintIndex(spark, idxDir.toString,
      buckets = 8)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("fpidx-ckpt")
    val q = StreamOps.curateWithHistory(df, idx,
      boilerplate = Seq.empty, checkpointDir = ckpt.toString,
      minWords = 3) { (out, _) =>
      emitted ++= out.select($"doc_id").collect().map(_.getLong(0))
    }
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val text = "an original document body here"
    input.addData((t(0), 1L, text, "en"))
    q.processAllAvailable()
    // the duplicate arrives in a much later micro-batch — there is NO
    // watermark state to age out; suppression comes from the durable
    // index. A decomposed-unicode spelling of the same text dedups too
    // (fingerprints are taken post-NFC).
    input.addData((t(30), 2L, text, "en"),
      (t(31), 3L, "completely different new content", "en"))
    q.processAllAvailable()
    q.stop()
    assert(emitted.sorted.toSeq === Seq(1L, 3L))
    assert(idx.fingerprints.count() === 2)
  }

  test("curateWithNearDupHistory suppresses lightly-edited copies of " +
    "history the exact index cannot see") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text", "lang")
    val exact = new graft.store.FingerprintIndex(spark,
      java.nio.file.Files.createTempDirectory("ndh-fp").toString, buckets = 8)
    val near = new graft.store.NearDupIndex(spark,
      java.nio.file.Files.createTempDirectory("ndh-nd").toString, buckets = 8)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("ndh-ckpt")
    val q = StreamOps.curateWithNearDupHistory(df, exact, near,
      boilerplate = Seq.empty, checkpointDir = ckpt.toString,
      minWords = 3) { (out, _) =>
      emitted ++= out.select($"doc_id").collect().map(_.getLong(0))
    }
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen sleepy penguins waddle across the frozen antarctic " +
      "shelf carrying small wooden crates of pickled herring toward " +
      "the waiting ship anchored beyond the ridge"
    input.addData((t(0), 1L, base, "en"))
    q.processAllAvailable()
    // a much later micro-batch: a byte-exact repeat (exact leg), a
    // lightly-EDITED copy (near-dup leg — different bytes, so the
    // fingerprint index passes it), and a genuinely new doc
    input.addData(
      (t(30), 2L, base, "en"),
      (t(31), 3L, base.replace("fox", "zesty"), "en"),
      (t(32), 4L, "completely different subject matter entirely about " +
        "orbital mechanics delta-v budgets and transfer windows", "en"))
    q.processAllAvailable()
    q.stop()
    assert(emitted.sorted.toSeq === Seq(1L, 4L))
    // the edited copy's verdict is persisted, naming the history canonical
    val verdict = near.assignments
      .filter($"doc_id" === 3L).select($"canonical_id").collect()
    assert(verdict.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("stateful sessionization emits closed sessions incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionizeStream(input.toDS(), gapMs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()

    // session 1: three events within the gap
    input.addData(SessionEvent(1L, 1L, 0L), SessionEvent(1L, 2L, 500L),
      SessionEvent(1L, 3L, 900L))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() === 0) // still open

    // a far-future event closes session 1 and opens session 2
    input.addData(SessionEvent(1L, 4L, 10000L))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[SessionOut].collect()
    q.stop()
    assert(closed.toSeq === Seq(SessionOut(1L, 0L, 900L, 3L)))
  }

  test("sessionization: a late cross-batch event never rewinds the " +
    "session end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionizeStream(input.toDS(), gapMs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_late").start()
    input.addData(SessionEvent(1L, 1L, 1000L))
    q.processAllAvailable()
    // LATE event (batches are sorted internally, not against each
    // other): within gap of the session, but older than its last event
    input.addData(SessionEvent(1L, 2L, 500L))
    q.processAllAvailable()
    // within gap of the REAL last event (1000) but not of the late one
    // (500): a rewound lastTs would wrongly close the session here
    // with session_end=500 — earlier than an event it contains
    input.addData(SessionEvent(1L, 3L, 1600L))
    q.processAllAvailable()
    assert(spark.table("sessions_late").count() === 0,
      "the session must still be open — no spurious split")
    input.addData(SessionEvent(1L, 4L, 99000L)) // far future closes it
    q.processAllAvailable()
    val closed = spark.table("sessions_late").as[SessionOut].collect()
    q.stop()
    // the late 500 is the session's new FIRST event (batch sessionize
    // over {500, 1000, 1600} at gap 1000 yields one session [500, 1600])
    assert(closed.toSeq === Seq(SessionOut(1L, 500L, 1600L, 3L)))
  }

  test("sessionization: a late event OLDER than the open session's " +
    "reach closes as its own session — never folded into a session " +
    "that starts after it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionizeStream(input.toDS(), gapMs = 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_old").start()
    input.addData(SessionEvent(1L, 1L, 1000L), SessionEvent(1L, 2L, 1080L))
    q.processAllAvailable()
    // ts=100: "within gap of lastTs"? 100-1080 = -980 <= 100 — the naive
    // merge test passes, but the event is 900ms before session_start,
    // beyond the session's backward reach (start - gap = 900)
    input.addData(SessionEvent(1L, 3L, 100L))
    q.processAllAvailable()
    val early = spark.table("sessions_old").as[SessionOut].collect()
    assert(early.toSeq === Seq(SessionOut(1L, 100L, 100L, 1L)),
      "the too-old event must close as its own single-event session")
    input.addData(SessionEvent(1L, 4L, 99000L))
    q.processAllAvailable()
    val all = spark.table("sessions_old").as[SessionOut].collect()
    q.stop()
    // the open session was untouched by the too-old event: when it
    // finally closes it spans only its own events — exactly the batch
    // twin's sessions over {100, 1000, 1080} at gap 100
    assert(all.toSet === Set(
      SessionOut(1L, 100L, 100L, 1L), SessionOut(1L, 1000L, 1080L, 2L)))
  }

  test("scoreStream: batch-trained char-LM gates a stream, parity with " +
    "the batch score for fully-seen documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 8L).map(i => (i, prose)).toDF("doc_id", "text")
    val model = graft.operators.Curation.charLmModelMap(corpus)
    // batch reference: every doc shares the text, so one avg_micro
    val batchAvg = graft.operators.Curation.charLmScore(corpus)
      .select($"avg_micro").head().getLong(0)

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    // threshold between gibberish (mostly-OOV bigrams -> near 0) and
    // prose (batch-level score)
    val q = StreamOps.scoreStream(df, model, minAvgMicro = batchAvg / 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("scored_out").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData(
      (t0, 1L, prose),                   // fully seen -> exact batch score
      (t0, 2L, "zq xv qj vx jz wq kx"),  // OOV transitions -> gated
      (t0, 3L, "THE  QUICK\tBROWN FOX")) // normalization folds case/ws
    q.processAllAvailable()
    val out = spark.table("scored_out")
      .select($"doc_id", $"avg_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    q.stop()
    assert(out.keySet === Set(1L, 3L))
    // parity: the streaming scorer reproduces the batch avg_micro
    // exactly for a document whose bigrams were all seen in training
    assert(out(1L) === batchAvg)
  }

  test("scoreStream parity holds on edge whitespace: Spark's trim " +
    "strips spaces only, so a trailing newline scores one extra " +
    "trailing-space bigram on BOTH sides") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 8L).map(i => (i, prose)).toDF("doc_id", "text")
    val model = graft.operators.Curation.charLmModelMap(corpus)
    // "\n" survives Spark trim and collapses to a trailing space —
    // Java String.trim would strip it and diverge (the bug this pins)
    val edgy = Seq((1L, prose + "\n"), (2L, "\t " + prose + " \r\n"))
      .toDF("doc_id", "text")
    // batch-side reference: the BATCH normalization chain (Spark trim +
    // explicit whitespace-class collapse + charBigrams) scored under
    // the SAME trained model the stream ships
    val want = edgy.select($"doc_id", explode(
      graft.functions.functions.charBigrams(
        regexp_replace(lower(trim($"text")),
          "[ \\t\\n\\x0B\\f\\r]+", " "))).as("g"))
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        val gs = rows.map(_.getString(1)).toSeq
        id -> gs.map(g => model.getOrElse(g, 0L)).sum / gs.length
      }
    val got = StreamOps.scoreStream(edgy, model, minAvgMicro = 0L)
      .select($"doc_id", $"avg_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want,
      "stream and batch scores must stay bit-equal on edge whitespace")
  }

  test("hllStream: 64-rows-per-group state converges to exactly the " +
    "batch sketch of everything seen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val df = input.toDF().toDF("source", "word")
    val q = StreamOps.hllStream(df, Seq("source"), "word")
      .writeStream.outputMode("update")
      .format("memory").queryName("hll_out").start()
    val batch1 = (0 until 500).map(i => ("web", s"w$i")) ++
      (0 until 200).map(i => ("books", s"b$i"))
    // batch 2 overlaps batch 1 (duplicates must not move the sketch)
    val batch2 = (300 until 900).map(i => ("web", s"w$i")) ++
      (0 until 200).map(i => ("books", s"b$i"))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    // the live register table: latest value per key — registers only
    // grow, so max over the update sink's emissions is the current state
    val streamed = spark.table("hll_out")
      .groupBy($"source", $"bucket").agg(max($"register").as("register"))
    val expected = graft.operators.Hll
      .registers((batch1 ++ batch2).toDF("source", "word"),
        Seq("source"), "word")
    assert(
      streamed.orderBy($"source", $"bucket").collect().toSeq ===
        expected.orderBy($"source", $"bucket").collect().toSeq)
    // state never exceeds 64 rows per group
    assert(streamed.groupBy($"source").count()
      .filter($"count" > 64).isEmpty)
    // and the running estimate reads straight off the live table
    val est = graft.operators.Hll.indicator(streamed, Seq("source"))
      .select($"source",
        graft.operators.Hll.estimateMicro($"hll_indicator").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    q.stop()
    assert(math.abs(est("web") - 900.0) / 900.0 < 0.4, est.toString)
    assert(math.abs(est("books") - 200.0) / 200.0 < 0.4, est.toString)
  }

  test("cmsStream: d*w-cells state converges to exactly the batch " +
    "sketch of everything seen; live point estimates read off it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val df = input.toDF().toDF("g", "term")
    val q = StreamOps.cmsStream(df, Seq("g"), "term")
      .writeStream.outputMode("update")
      .format("memory").queryName("cms_out").start()
    val batch1 = Seq.fill(300)(("web", "hot")) ++
      (0 until 100).map(i => ("web", s"t$i"))
    val batch2 = Seq.fill(200)(("web", "hot")) ++
      (50 until 150).map(i => ("web", s"t$i"))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    // counters only grow, so the latest emission per cell is its max
    val streamed = spark.table("cms_out")
      .groupBy($"g", $"row", $"col").agg(max($"counter").as("counter"))
    val expected = graft.operators.Cms
      .registers((batch1 ++ batch2).toDF("g", "term"), Seq("g"), "term")
    assert(
      streamed.orderBy($"row", $"col").collect().toSeq ===
        expected.orderBy($"row", $"col").collect().toSeq)
    assert(streamed.count() <=
      graft.operators.Cms.Depth * graft.operators.Cms.Width)
    // live heavy-hitter estimate: "hot" appeared 500 times total
    val est = graft.operators.Cms.estimate(
      streamed.drop("g"), Seq("hot").toDF("term"), "term")
      .collect().head.getLong(1)
    q.stop()
    assert(est >= 500L && est <= 700L, s"hot estimate $est")
  }

  test("semanticIngestStream: paraphrase-level dedup against all vector " +
    "history; sink sees exactly the appended survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = new graft.operators.CellIndex(spark,
      java.nio.file.Files.createTempDirectory("sis-idx").toString)
    idx.buildLearned(Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 0f, 1f, 0f)).toDF("vec_id", "embedding"),
      k = 2, iters = 1)
    val input = MemoryStream[(Long, Array[Float])]
    val df = input.toDF().toDF("vec_id", "embedding")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("sis-ckpt")
    val q = StreamOps.semanticIngestStream(df, idx,
      checkpointDir = ckpt.toString, thresholdMicro = 900000L) { (out, _) =>
      emitted ++= out.select($"vec_id").collect().map(_.getLong(0))
    }
    // batch 1: a near-dup of history vector 0 (dropped) + a novel
    // direction (appended)
    input.addData((10L, Array(1f, 0.01f, 0f, 0f)),
      (11L, Array(0f, 1f, 0f, 0f)))
    q.processAllAvailable()
    // batch 2: a near-dup of BATCH-1's survivor — caught against the
    // history the previous micro-batch just appended — plus a novel one
    input.addData((20L, Array(0.01f, 1f, 0f, 0f)),
      (21L, Array(0f, 0f, 0f, 1f)))
    q.processAllAvailable()
    q.stop()
    assert(emitted.sorted.toSeq === Seq(11L, 21L))
  }

  test("kmvStream: k-longs-per-group state converges to exactly the " +
    "batch sketch of everything seen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val df = input.toDF().toDF("g", "term")
    val latest =
      scala.collection.concurrent.TrieMap.empty[String, Seq[Long]]
    val q = StreamOps.kmvStream(df, Seq("g"), "term", k = 16)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          latest(r.getString(0)) = r.getSeq[Long](1))
      }.start()
    val batch1 = (0 until 300).map(i => ("a", s"t$i")) ++
      (0 until 50).map(i => ("b", s"u$i"))
    val batch2 = (200 until 600).map(i => ("a", s"t$i")) ++
      (0 until 300).map(i => ("b", s"u$i"))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val expected = graft.operators.Kmv
      .sketch((batch1 ++ batch2).toDF("g", "term"), Seq("g"), "term", k = 16)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(latest("a") === expected("a"))
    assert(latest("b") === expected("b"))
    assert(latest.values.forall(_.size <= 16), "state bounded at k")
  }

  test("scrubSpansWithHistory excises historical duplicate regions; " +
    "fully-duplicated docs drop; novel docs pass untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val grams = new graft.store.GramIndex(spark,
      java.nio.file.Files.createTempDirectory("ssh-grams").toString,
      w = 8, buckets = 8)
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssh-ckpt")
    val q = StreamOps.scrubSpansWithHistory(df, grams,
      checkpointDir = ckpt.toString, minKeptTokens = 2) { (out, _) =>
      emitted ++= out.select($"doc_id", $"n_kept", $"scrubbed_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    val run = (1 to 8).map(i => s"s$i").mkString(" ")
    input.addData((1L, s"$run tail1 tail2 tail3"))
    q.processAllAvailable()
    // a much later micro-batch: a doc QUOTING the 8-run (region
    // excised, novel head kept), a full copy of doc 1 (every position
    // covered -> dropped), and a novel doc (untouched)
    input.addData(
      (2L, s"head1 head2 $run"),
      (3L, s"$run tail1 tail2 tail3"),
      (4L, "n1 n2 n3 n4 n5 n6 n7 n8 n9"))
    q.processAllAvailable()
    q.stop()
    val byDoc = emitted.toList.groupBy(_._1)
    assert(byDoc(1L) ===
      List((1L, 11L, s"$run tail1 tail2 tail3")), "first copy untouched")
    assert(byDoc(2L) === List((2L, 2L, "head1 head2")),
      "quoted region excised, novel head kept")
    assert(!byDoc.contains(3L), "full duplicate excised whole")
    assert(byDoc(4L) === List((4L, 9L, "n1 n2 n3 n4 n5 n6 n7 n8 n9")))
    // both batches registered their novel grams
    assert(grams.grams.count() > 0)
  }

  // ---- curateAllWithHistory: gate + four history granularities -------

  private val CurateBase = "the quick brown fox jumps over the lazy dog " +
    "while seventeen sleepy penguins waddle across the frozen antarctic " +
    "shelf carrying small wooden crates of pickled herring toward the " +
    "waiting ship anchored beyond the ridge"
  // run tokens are 4+ chars so docs quoting the run still clear the
  // gate's mean-word-length floor (3 chars/word)
  private val CurateRun = (1 to 8).map(i => s"run$i").mkString(" ")
  private val CurateDoc2 = s"opening words here $CurateRun closing words"
  // spec gate: word-count floor low enough for the short test docs,
  // stopword rule off (several intentionally stopword-free docs must
  // reach the store legs); the fixed Gopher ratio rules stay live
  private val CurateGate = GateConfig(
    minWords = 2L, maxWords = 500L, minStopwords = 0)

  private case class CurateStores(
      exact: graft.store.FingerprintIndex,
      near: graft.store.NearDupIndex,
      grams: graft.store.GramIndex,
      cell: graft.operators.CellIndex)

  private def freshCurateStores(): CurateStores = {
    import spark.implicits._
    val st = unbuiltCurateStores()
    // training vectors sit ~45° from every test embedding (cos 0.707,
    // far under the 0.9 threshold) so they never flag test docs
    st.cell.buildLearned(Seq(
      900L -> Array(0.7f, 0.7f, 0f, 0f),
      901L -> Array(0f, 0f, 0.7f, 0.7f)).toDF("vec_id", "embedding"),
      k = 2, iters = 1)
    st
  }

  /** Stores with an UNBUILT semantic index — the lazy-bootstrap path
    * (the quantizer trains inside the first batch). */
  private def unbuiltCurateStores(): CurateStores = {
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    CurateStores(
      new graft.store.FingerprintIndex(spark, tmp("cah-fp"), buckets = 8),
      new graft.store.NearDupIndex(spark, tmp("cah-nd"), buckets = 8),
      new graft.store.GramIndex(spark, tmp("cah-gr"), w = 8, buckets = 8),
      new graft.operators.CellIndex(spark, tmp("cah-cell")))
  }

  private def curateSeed = Seq(
    (1L, CurateBase, Array(1f, 0f, 0f, 0f)),
    (2L, CurateDoc2, Array(0f, 0f, 1f, 0f)))

  // the victim batch exercises every suppression granularity:
  //  10 = byte-exact copy of doc 1        -> dropped at the exact leg
  //  11 = lightly-edited copy of doc 1    -> dropped at the near-dup leg
  //  12 = novel head + doc 2's verbatim 8-run -> region excised, emitted
  //  13 = novel text, paraphrase embedding of doc 2 -> dropped semantic
  //  14 = fully novel                     -> emitted untouched
  //  15 = one-word junk                   -> dropped at the GATE
  //       (never reaches any index — no fingerprint/band/gram/vector)
  private def curateVictim = Seq(
    (10L, CurateBase, Array(0.9f, 0.1f, 0f, 0f)),
    (11L, CurateBase.replace("fox", "zesty"), Array(0.9f, 0f, 0.1f, 0f)),
    (12L, s"nov1 nov2 nov3 nov4 $CurateRun", Array(0f, 1f, 0f, 0f)),
    (13L, "entirely different prose about orbital transfer windows",
      Array(0.01f, 0f, 1f, 0f)),
    (14L, "mason turbine valley copper lantern meadow drift harbor " +
      "stone petal", Array(0f, 0f, 0f, 1f)),
    (15L, "tiny", Array(0.3f, 0.3f, 0.3f, 0.3f)))

  private def curateProcess(st: CurateStores, rows: Seq[(Long, String,
      Array[Float])], kill: Option[String],
      gateDrops: scala.collection.mutable.ArrayBuffer[(Long, String)] =
        scala.collection.mutable.ArrayBuffer.empty)
      : Seq[(Long, Long, String)] = {
    import spark.implicits._
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    StreamOps.curateAllBatch(
      rows.toDF("doc_id", "text", "embedding"),
      st.exact, st.near, st.grams, st.cell,
      boilerplate = Seq.empty, minKeptTokens = 3,
      thresholdMicro = 900000L, nprobe = 1,
      gate = Some(CurateGate),
      gateSink = (gd, _) => gateDrops ++= gd.filter($"keep" === 0)
        .select($"doc_id", $"reasons").collect()
        .map(r => (r.getLong(0), r.getString(1))),
      onStage = s => if (kill.contains(s))
        throw new RuntimeException(s"injected crash after $s commit"),
      batchId = 0L) {
      (df, _) =>
        out ++= df.select($"doc_id", $"n_kept", $"scrubbed_text")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    out.sortBy(_._1).toSeq
  }

  private def curateState(st: CurateStores) = {
    import spark.implicits._
    (st.exact.fingerprints.collect().map(_.toString).sorted.toSeq,
      st.near.assignments.select($"doc_id", $"canonical_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      st.grams.grams.select($"k", $"doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq,
      st.cell.vectors.select($"vec_id")
        .collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("curateAllWithHistory: one stream, five stages — gate, exact, " +
    "edited, quoted-region, paraphrase") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val st = freshCurateStores()
    val input = MemoryStream[(Long, String, Array[Float])]
    val df = input.toDF().toDF("doc_id", "text", "embedding")
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val gateRows =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("cah-ckpt")
    val q = StreamOps.curateAllWithHistory(df, st.exact, st.near,
      st.grams, st.cell, boilerplate = Seq.empty,
      checkpointDir = ckpt.toString, minKeptTokens = 3,
      thresholdMicro = 900000L, gate = Some(CurateGate),
      gateSink = (gd, _) => gateRows ++= gd
        .select($"doc_id", $"keep", $"reasons").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))) { (out, _) =>
      emitted ++= out.select($"doc_id", $"n_kept", $"scrubbed_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    input.addData(curateSeed: _*)
    q.processAllAvailable()
    assert(emitted.map(_._1).sorted.toSeq === Seq(1L, 2L))
    emitted.clear(); gateRows.clear()
    input.addData(curateVictim: _*)
    q.processAllAvailable()
    q.stop()
    assert(emitted.map(_._1).sorted.toSeq === Seq(12L, 14L),
      s"wrong survivors: $emitted")
    val doc12 = emitted.find(_._1 == 12L).get
    assert(doc12._2 === 4L && doc12._3 === "nov1 nov2 nov3 nov4",
      "doc 2's quoted region must be excised from doc 12")
    // the gate saw the whole batch (keeps AND drops) with reasons —
    // the frame a per-batch curationReport aggregates
    assert(gateRows.sortBy(_._1).toSeq === Seq(
      (10L, 1, ""), (11L, 1, ""), (12L, 1, ""), (13L, 1, ""),
      (14L, 1, ""), (15L, 0, "too_few_words")),
      s"gate frame wrong: $gateRows")
    // the gate-dropped doc reached NO index: no fingerprint, no band
    // assignment, no grams, no vector
    assert(st.exact.fingerprints.filter($"doc_id" === 15L).count() === 0)
    assert(st.near.assignments.filter($"doc_id" === 15L).count() === 0)
    assert(st.grams.grams.filter($"doc_id" === 15L).count() === 0)
    assert(st.cell.vectors.filter($"vec_id" === 15L).count() === 0)
    // each index registered its own granularity's verdicts
    assert(st.near.assignments.filter($"doc_id" === 11L)
      .select($"canonical_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(st.cell.vectors.filter($"vec_id" === 13L).count() === 0)
  }

  test("curateAllWithHistory kill-point matrix: a crash between ANY two " +
    "stage commits replays to identical store states and emissions") {
    // baseline: no crash
    val base = freshCurateStores()
    curateProcess(base, curateSeed, None)
    val dropsBase =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val emitBase = curateProcess(base, curateVictim, None, dropsBase)
    val stateBase = curateState(base)
    assert(emitBase.map(_._1) === Seq(12L, 14L))
    assert(dropsBase.toSeq === Seq((15L, "too_few_words")),
      "the gate must book exactly the one-word junk doc")

    // "sink" = the crash lands AFTER the sink write, BEFORE the
    // checkpoint commit — the output-idempotence kill point the
    // epoch-id plumbing exists for (CurateSpec proves the file-level
    // rewrite; here the matrix proves emission/store convergence)
    for (kill <- Seq("gate", "exact", "neardup", "spans", "semantic",
        "sink")) {
      val st = freshCurateStores()
      curateProcess(st, curateSeed, None)
      val e = intercept[RuntimeException] {
        curateProcess(st, curateVictim, Some(kill))
      }
      assert(e.getMessage.contains(kill))
      // the retry: same batch, stages up to `kill` already effected
      // (the gate commits nothing — its replay case is re-derivation)
      val drops = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val emitReplay = curateProcess(st, curateVictim, None, drops)
      assert(emitReplay === emitBase,
        s"kill@$kill: replay emission diverged")
      assert(drops.toSeq === dropsBase.toSeq,
        s"kill@$kill: replay gate drops diverged")
      assert(curateState(st) === stateBase,
        s"kill@$kill: store states diverged")
      // and a SECOND full replay (crash after sink, before the offset
      // commit) is also a clean no-op emission-wise
      assert(curateProcess(st, curateVictim, None) === emitBase,
        s"kill@$kill: post-recovery replay diverged")
    }
  }

  test("lazy quantizer bootstrap: trains on SURVIVORS only (no phantom " +
    "vectors for gate-dropped docs) and converges under crashes on " +
    "either side of the first build") {
    import spark.implicits._
    // doc 3 is gate-dropped junk whose embedding is FAR from the
    // survivors' — if the bootstrap registered it, doc 20 below (whose
    // embedding is nearly doc 3's but unlike any survivor's) would be
    // suppressed by a vector no kept document owns
    val batch = curateSeed :+ ((3L, "tiny", Array(0f, 0.7f, 0.7f, 0f)))
    val later = Seq((20L, "completely fresh prose about tidal harbor " +
      "lanterns and copper fittings", Array(0f, 0.72f, 0.69f, 0f)))

    val base = unbuiltCurateStores()
    val baseOut = curateProcess(base, batch, None)
    assert(baseOut.map(_._1) === Seq(1L, 2L))
    assert(base.cell.exists, "first batch must have built the quantizer")
    assert(base.cell.vectors.select($"vec_id").collect().map(_.getLong(0))
      .sorted === Array(1L, 2L),
      "only post-upstream survivors may register — a phantom vector " +
        "for the gate-dropped doc would suppress future near-matches")
    assert(curateProcess(base, later, None).map(_._1) === Seq(20L),
      "doc 20 shares no survivor's embedding and must be kept")

    // crash BEFORE the build (after the spans commit): no generation
    // exists yet; the replay trains once and converges to the baseline
    val st1 = unbuiltCurateStores()
    intercept[RuntimeException] { curateProcess(st1, batch, Some("spans")) }
    assert(!st1.cell.exists, "crash before the semantic leg: no build")
    assert(curateProcess(st1, batch, None) === baseOut)
    // crash AFTER the semantic commit: build + ingest landed; the
    // replay skips the build (exists) and is a pure vec_id replay
    val st2 = unbuiltCurateStores()
    intercept[RuntimeException] {
      curateProcess(st2, batch, Some("semantic"))
    }
    assert(st2.cell.exists, "crash after the semantic commit: built")
    assert(curateProcess(st2, batch, None) === baseOut)
    assert(st2.cell.stats().generations === 1,
      "a replay must never retrain a committed quantizer")
    // both crash paths land on the baseline's exact store state
    for (st <- Seq(st1, st2)) {
      curateProcess(st, later, None)
      assert(curateState(st) === curateState(base))
    }
  }

  test("maintenanceEvery: the live maintenance loop compacts every " +
    "store between batches and changes nothing but the layout") {
    import spark.implicits._
    val third = Seq(
      (20L, "granite harbor mill stone beacon orchard valley bridge " +
        "copper meadow", Array(0f, 0f, 0f, 0.9f)),
      (21L, CurateBase, Array(0.9f, 0f, 0f, 0.1f))) // exact dup of doc 1
    // single-bucket text stores: every commit lands in the ONE cell, so
    // each sweep deterministically finds it fragmented and compacts
    // (with the default 8/256 buckets a toy corpus may never collide
    // two commits in one cell, leaving compaction a legitimate no-op)
    def oneBucketStores(): CurateStores = {
      import spark.implicits._
      def tmp(p: String) =
        java.nio.file.Files.createTempDirectory(p).toString
      val cell = new graft.operators.CellIndex(spark, tmp("mnt-cell"))
      cell.buildLearned(Seq(
        900L -> Array(0.7f, 0.7f, 0f, 0f),
        901L -> Array(0f, 0f, 0.7f, 0.7f)).toDF("vec_id", "embedding"),
        k = 2, iters = 1)
      CurateStores(
        new graft.store.FingerprintIndex(spark, tmp("mnt-fp"), buckets = 1),
        new graft.store.NearDupIndex(spark, tmp("mnt-nd"), buckets = 1),
        new graft.store.GramIndex(spark, tmp("mnt-gr"), w = 8, buckets = 1),
        cell)
    }
    // baseline: three batches, nobody maintains
    val base = oneBucketStores()
    val emitBase = Seq(curateSeed, curateVictim, third)
      .map(b => curateProcess(base, b, None))
    // maintained: same batches, a full sweep after every one — the
    // curateAllWithHistory maintenanceEvery=1 schedule, with
    // maxLiveDirs=1 so compaction actually fires from batch 2 on
    val st = oneBucketStores()
    val emitMaint = Seq(curateSeed, curateVictim, third).map { b =>
      val e = curateProcess(st, b, None)
      StreamOps.maintainAll(st.exact, st.near, st.grams, st.cell,
        maxLiveDirs = 1)
      e
    }
    assert(emitMaint === emitBase,
      "maintenance between batches must not change any emission")
    assert(curateState(st) === curateState(base),
      "maintenance must not change any store's logical content")
    // and it really did rewrite the layout down to the bound, where
    // the unmaintained twin accumulated one live dir per commit
    assert(base.exact.stats().liveDirs > 1)
    assert(st.exact.stats().liveDirs === 1)
    assert(st.grams.stats().liveDirs === 1)
    assert(st.near.stats().liveDirs === 1)
    assert(st.cell.stats().maxFilesPerCell === 1)
    // generation pruning: each CellIndex compaction publishes a FULL
    // rewritten copy of the index — without the sweep's vacuum, the
    // loop leaks one copy per compaction, unbounded
    assert(st.cell.stats().generations <= 3,
      s"maintainAll must prune expired generations: ${st.cell.stats()}")
  }

  test("curateAllWithHistory warmOnStart + maintenanceEvery fire " +
    "through the streaming entry; 'maintain' lands on onStage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val st = freshCurateStores()
    val input = MemoryStream[(Long, String, Array[Float])]
    val df = input.toDF().toDF("doc_id", "text", "embedding")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    val ckpt = java.nio.file.Files.createTempDirectory("cah-maint-ckpt")
    val q = StreamOps.curateAllWithHistory(df, st.exact, st.near,
      st.grams, st.cell, boilerplate = Seq.empty,
      checkpointDir = ckpt.toString, minKeptTokens = 3,
      thresholdMicro = 900000L, gate = Some(CurateGate),
      onStage = stages += _, warmOnStart = true,
      maintenanceEvery = 1) { (out, _) =>
      emitted ++= out.select($"doc_id").collect().map(_.getLong(0))
    }
    input.addData(curateSeed: _*)
    q.processAllAvailable()
    input.addData(curateVictim: _*)
    q.processAllAvailable()
    q.stop()
    assert(emitted.sorted.toSeq === Seq(1L, 2L, 12L, 14L))
    assert(stages.count(_ == "maintain") === 2,
      s"one sweep per batch expected: $stages")
    assert(stages.takeRight(1) === Seq("maintain"),
      "maintenance runs AFTER the sink")
  }

  test("qualityGateStream: per-batch gate matches the batch operator " +
    "exactly; sink sees keeps and drops with reasons") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("qgs-ckpt")
    val q = StreamOps.qualityGateStream(df, ckpt.toString,
      GateConfig(minWords = 3L, maxWords = 500L)) { (out, _) =>
      got ++= out.select($"doc_id", $"keep", $"reasons").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    }
    val rows = Seq(
      (1L, "the results have been consistent with the plan and that " +
        "is to be expected of the data"),
      (2L, "too short"),
      (3L, ("the data of note " * 20).trim))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val want = graft.operators.Curation.qualityGate(
      rows.toDF("doc_id", "text"), minWords = 3L, maxWords = 500L)
      .select($"doc_id", $"keep", $"reasons").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got.sortBy(_._1).toSeq === want.sortBy(_._1),
      "stream gate must equal the batch gate row for row")
    assert(got.exists(r => r._1 == 1L && r._2 == 1))
    assert(got.exists(r => r._1 == 2L && r._3.contains("too_few_words")))
    assert(got.exists(r => r._1 == 3L && r._3.contains("repetition")))
  }

  test("streaming leak gate: gate/exact/near-dup/span/semantic drains " +
    "leave no persisted non-checkpoint frames") {
    // VERDICT r12 #4: LeakFreeBatterySpec covers the 121 BATCH queries,
    // but the r12 leak find (winnowPairs' corpus-order checkpoint) was
    // in operator code reached via STREAMING. Drain each pipeline entry
    // point, then assert the LeakFreeBatterySpec contract: after stop(),
    // getPersistentRDDs may hold only locally-checkpointed blocks (the
    // sanctioned frame-freezing tool, reclaimed by the ContextCleaner);
    // a bare .persist() surviving a drain is a leak that lives until
    // the streaming driver dies — days, at 1000-executor scale.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def cleanSlate(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    def assertNoLeak(label: String): Unit = {
      val leaked = spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
      assert(leaked.isEmpty, s"$label drain leaked ${leaked.size} " +
        s"persisted non-checkpoint RDD(s): " +
        leaked.map(_.name).mkString(", "))
    }
    def ckpt(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    cleanSlate()
    locally { // gate
      val input = MemoryStream[(Long, String)]
      val q = StreamOps.qualityGateStream(
        input.toDF().toDF("doc_id", "text"), ckpt("leak-gate"),
        CurateGate) { (out, _) => out.count(); () }
      input.addData((1L, CurateBase), (2L, "tiny"))
      q.processAllAvailable(); q.stop()
      assertNoLeak("gate")
    }

    cleanSlate()
    locally { // exact history
      val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
      val idx = new graft.store.FingerprintIndex(spark,
        ckpt("leak-fp"), buckets = 8)
      val q = StreamOps.curateWithHistory(
        input.toDF().toDF("ts", "doc_id", "text", "lang"), idx,
        boilerplate = Seq.empty, checkpointDir = ckpt("leak-fp-ck"),
        minWords = 3) { (out, _) => out.count(); () }
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((t0, 1L, CurateBase, "en"), (t0, 2L, CurateBase, "en"))
      q.processAllAvailable(); q.stop()
      assertNoLeak("exact")
    }

    cleanSlate()
    locally { // near-dup history
      val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
      val exact = new graft.store.FingerprintIndex(spark,
        ckpt("leak-nd-fp"), buckets = 8)
      val near = new graft.store.NearDupIndex(spark,
        ckpt("leak-nd"), buckets = 8)
      val q = StreamOps.curateWithNearDupHistory(
        input.toDF().toDF("ts", "doc_id", "text", "lang"), exact, near,
        boilerplate = Seq.empty, checkpointDir = ckpt("leak-nd-ck"),
        minWords = 3) { (out, _) => out.count(); () }
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((t0, 1L, CurateBase, "en"),
        (t0, 2L, CurateBase.replace("fox", "zesty"), "en"))
      q.processAllAvailable(); q.stop()
      assertNoLeak("near-dup")
    }

    cleanSlate()
    locally { // span + semantic (the full five-stage pipeline, with the
      // between-batch maintenance sweep — compaction must not pin either)
      val st = freshCurateStores()
      val input = MemoryStream[(Long, String, Array[Float])]
      val q = StreamOps.curateAllWithHistory(
        input.toDF().toDF("doc_id", "text", "embedding"),
        st.exact, st.near, st.grams, st.cell, boilerplate = Seq.empty,
        checkpointDir = ckpt("leak-all-ck"), minKeptTokens = 3,
        thresholdMicro = 900000L, gate = Some(CurateGate),
        maintenanceEvery = 1) { (out, _) => out.count(); () }
      input.addData(curateSeed: _*)
      q.processAllAvailable()
      input.addData(curateVictim: _*)
      q.processAllAvailable()
      q.stop()
      assertNoLeak("span+semantic")
    }
    cleanSlate()
  }
}
