package graft.store

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** Store maintenance CONCURRENT with live streaming ingest — the seam
  * the round-9 audit flagged as argued-but-unproven: `compactIfNeeded`
  * and vacuum run from a second handle (a separate maintenance process
  * in production) while micro-batches are mid-flight against the same
  * FingerprintIndex / GramIndex. The claims under test:
  *
  *  1. no batch ever fails: a reader pins a snapshot at resolve time
  *     and `keepVersions` retains its data dirs across the commits a
  *     concurrent compaction lands;
  *  2. no rows are lost and no verdict changes: emissions and final
  *     index state are bit-identical to a maintenance-free run of the
  *     SAME batch sequence;
  *  3. the `keepVersions` reader window is exactly what protects a
  *     pinned snapshot — it survives keepVersions-1 further commits
  *     and only a commit beyond that can sweep its dirs.
  */
class MaintenanceUnderStreamingSpec extends SparkSuite {

  private val S = (1 to 8).map(i => s"s$i").mkString(" ") // shared 8-run

  /** Batch b: one exact repeat of batch 0's doc, one fresh doc carrying
    * the shared run (a cross-batch span), one unique doc. */
  private def batch(b: Int): DataFrame = {
    import spark.implicits._
    Seq(
      (b * 10L, "the common recrawled document body"),
      (b * 10L + 1, s"u${b}_a u${b}_b $S u${b}_c u${b}_d"),
      (b * 10L + 2, (0 until 12).map(j => s"only${b}_$j").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private def runBatches(fp: FingerprintIndex, gm: GramIndex,
      nBatches: Int, between: () => Unit = () => ())
      : (Seq[Seq[Long]], Seq[Seq[(Long, Long, Long)]]) = {
    val fpEmitted = Seq.newBuilder[Seq[Long]]
    val gmEmitted = Seq.newBuilder[Seq[(Long, Long, Long)]]
    (0 until nBatches).foreach { b =>
      val canon = fp.ingestResolved(batch(b))
      fpEmitted += canon.select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      gmEmitted += gm.ingest(canon).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      between()
    }
    (fpEmitted.result(), gmEmitted.result())
  }

  test("compactIfNeeded + vacuum from a second handle while batches " +
    "are in flight: no failed batch, emissions and final state " +
    "identical to a maintenance-free run") {
    val N = 6
    // oracle: same batches, nobody compacts
    val oFp = new FingerprintIndex(spark, tmpDir("mfp-oracle"), buckets = 8)
    val oGm = new GramIndex(spark, tmpDir("mgm-oracle"), w = 8, buckets = 8)
    val (wantFp, wantGm) = runBatches(oFp, oGm, N)

    val fpDir = tmpDir("mfp-live"); val gmDir = tmpDir("mgm-live")
    val fp = new FingerprintIndex(spark, fpDir, buckets = 8)
    val gm = new GramIndex(spark, gmDir, w = 8, buckets = 8)
    // the maintenance "process": separate handles on the same paths,
    // looping as aggressively as the scheduler allows
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var running = true
    @volatile var compactions = 0
    val maint = new Thread(() => {
      val fpM = new FingerprintIndex(spark, fpDir, buckets = 8)
      val gmM = new GramIndex(spark, gmDir, w = 8, buckets = 8)
      while (running && failures.isEmpty) {
        try {
          compactions += fpM.compactIfNeeded(maxLiveDirs = 2)
          compactions += gmM.compactIfNeeded(maxLiveDirs = 2)
          fpM.vacuumOrphans(olderThanMs = 3600L * 1000)
          gmM.vacuumOrphans(olderThanMs = 3600L * 1000)
        } catch { case t: Throwable => failures.add(t) }
      }
    })
    maint.start()
    val got =
      try runBatches(fp, gm, N)
      finally { running = false; maint.join(60000) }
    assert(failures.isEmpty,
      s"maintenance thread failed: ${Option(failures.peek())}")
    assert(compactions > 0,
      "the interleaving must actually exercise compaction, not no-ops")
    assert(got._1 === wantFp,
      "per-batch canonical emissions must not change under maintenance")
    assert(got._2 === wantGm,
      "per-batch span emissions must not change under maintenance")
    assert(fp.fingerprints.collect().map(_.toString).sorted.toSeq ===
      oFp.fingerprints.collect().map(_.toString).sorted.toSeq)
    assert(gm.grams.collect().map(_.toString).sorted.toSeq ===
      oGm.grams.collect().map(_.toString).sorted.toSeq)
  }

  test("keepVersions IS the pinned-reader window: a snapshot survives " +
    "keepVersions-1 further commits, then its dirs are reclaimed") {
    import spark.implicits._
    val dir = tmpDir("pin")
    val idx = new GramIndex(spark, dir, w = 8, buckets = 4) // keepVersions=3
    (0 until 3).foreach(b => idx.ingest(Seq((b.toLong,
      (0 until 20).map(j => s"t${b}_$j").mkString(" ")))
      .toDF("doc_id", "text")))
    // a long-running reader: resolves the v3 snapshot NOW, reads later
    val pinned = idx.grams
    val want = pinned.count()
    // commit 1 past the pin: a compaction that supersedes every dir the
    // pin references — the dirs stay because v2/v3 still reference them
    assert(idx.compact() > 0)
    assert(pinned.count() === want, "pinned snapshot survives commit +1")
    // commit 2 past the pin
    idx.ingest(Seq((100L, (0 until 20).map(j => s"x$j").mkString(" ")))
      .toDF("doc_id", "text"))
    assert(pinned.count() > 0, "pinned snapshot survives commit +2")
    // commit 3: v3 expires; no retained manifest references the pinned
    // dirs any more, so vacuum reclaims them and the stale reader —
    // older than the whole retention window — now fails, visibly, not
    // with silently missing rows
    idx.ingest(Seq((101L, (0 until 20).map(j => s"y$j").mkString(" ")))
      .toDF("doc_id", "text"))
    intercept[Exception] { pinned.count() }
    // the index itself (a FRESH resolve, what every batch does) is fine
    assert(idx.grams.count() > 0)
  }

  test("vacuumOrphans aborts — reclaiming NOTHING — while any manifest " +
    "is unreadable, instead of treating it as referencing nothing") {
    import spark.implicits._
    val dir = tmpDir("orphan-guard")
    val idx = new GramIndex(spark, dir, w = 8, buckets = 4)
    idx.ingest(Seq((1L, (0 until 20).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text"))
    val f = Fs.fs(spark, dir)
    // an unreadable "manifest": a DIRECTORY whose name matches the
    // manifest pattern — versions lists it, open() throws
    val corrupt = new org.apache.hadoop.fs.Path(
      dir + "/manifests/v0000000099.txt")
    f.mkdirs(corrupt)
    // a genuine crashed-writer orphan the sweep would otherwise reclaim
    val orphan = new org.apache.hadoop.fs.Path(
      dir + "/data/v0000000050-deadbeef")
    f.mkdirs(orphan)
    assert(idx.vacuumOrphans(olderThanMs = -1000L) === Nil,
      "one unreadable manifest must abort the whole sweep: the LIVE " +
        "snapshot's dirs would otherwise look orphaned")
    assert(f.exists(orphan), "nothing may be deleted on abort")
    f.delete(corrupt, true)
    assert(idx.vacuumOrphans(olderThanMs = -1000L)
      === Seq("v0000000050-deadbeef"),
      "with every manifest readable the true orphan is reclaimed")
    assert(idx.grams.count() > 0, "live data intact throughout")
  }
}
