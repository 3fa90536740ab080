package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable incremental sketch maintenance: per-load sketch cells
  * ([[graft.operators.Hll]] registers, [[graft.operators.Cms]] counters,
  * or [[graft.operators.Kmv]] minima) appended through the versioned
  * manifest log, merged on read by each family's merge law. This turns
  * the sketch docs' "disjoint loads union for free" claim into a stored
  * artifact: a continuously-ingesting pipeline keeps live distinct
  * counts / frequencies / pairwise-overlap estimates over ALL history
  * by appending a few hundred tiny rows per batch — the corpus itself
  * is scanned exactly once, by the batch that loaded it.
  *
  * Replay semantics are where the three families genuinely differ, so
  * the store makes them explicit instead of papering over them:
  *   - HLL (register max) and KMV (k-min of union) merges are
  *     IDEMPOTENT — re-merging a batch's cells is algebraically
  *     harmless;
  *   - CMS (counter sum) is NOT — a re-merged batch double-counts.
  * [[ingest]] therefore tracks committed `batchId`s (encoded in the
  * immutable data-dir names, and carried through [[compact]] in a
  * `batches.txt` marker) and makes a replayed ingest a no-op for ALL
  * kinds — exactly-once effect under at-least-once delivery, the
  * [[FingerprintIndex]] discipline. Batch ids are the caller's load
  * identifiers (foreachBatch epoch ids, file manifests) and are
  * assumed unique per logical load; two RACING writers of the same id
  * degrade to a rare double-merge for CMS only (the same race window
  * every sum-based store has without a global lock).
  *
  * Scale shape: a batch appends ≤ groups × cells rows (64 / d·w / k per
  * group); [[read]] unions one scan per live data dir — run [[compact]]
  * periodically to fold history into one merged dir so read cost stays
  * bounded as batches accumulate.
  */
final class SketchStore(spark: SparkSession, path: String,
    kind: SketchStore.Kind,
    k: Int = graft.operators.Kmv.DefaultK,
    keepVersions: Int = 3,
    committer: Option[ManifestCommitter] = None) {

  import SketchStore._

  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private lazy val f = Fs.fs(spark, path)

  def exists: Boolean = log.hasAny

  /** Batch ids already merged into the store (dir-name tags plus the
    * ids a compaction folded in via its `batches.txt` marker). Ids are
    * in [[SketchStore.tag]] form — compare tags, not raw ids. */
  def committedBatches: Set[String] = log.resolve() match {
    case None => Set.empty
    case Some((_, entries)) => batchesIn(entries)
  }

  private def batchesIn(entries: Map[String, Seq[String]]): Set[String] = {
      val dirs = entries.values.flatten.toSet
      dirs.flatMap { dir =>
        val parts = dir.split("-")
        val fromTag =
          if (parts.length == 3 && parts(1) != CompactTag) Set(parts(1))
          else Set.empty[String]
        val marker = new Path(log.dataPath(dir), "batches.txt")
        val fromMarker =
          if (f.exists(marker)) {
            val in = f.open(marker)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().filter(_.nonEmpty).toSet
            finally in.close()
          } else Set.empty[String]
        fromTag ++ fromMarker
      }
  }

  /** Normalize an operator-shaped frame to stored cells. */
  private def toCells(cells: DataFrame): DataFrame = kind match {
    case HllKind => cells.select(col("group").cast("string").as("group"),
      col("bucket").cast("int").as("a"), lit(0).as("b"),
      col("register").cast("long").as("v"))
    case CmsKind => cells.select(col("group").cast("string").as("group"),
      col("row").cast("int").as("a"), col("col").cast("int").as("b"),
      col("counter").cast("long").as("v"))
    case KmvKind => cells.select(col("group").cast("string").as("group"),
      posexplode(col("kmv")).as(Seq("a", "v")))
      .select(col("group"), col("a").cast("int").as("a"), lit(0).as("b"),
        col("v").cast("long").as("v"))
  }

  /** Append one load's sketch cells under `batchId`. The frame must be
    * the operator's shape with its group column renamed to `group`:
    * HLL (group, bucket, register), CMS (group, row, col, counter),
    * KMV (group, kmv). Returns false (and commits nothing) when
    * `batchId` was already merged — the replay-safe path that keeps
    * CMS sums exact under at-least-once delivery. */
  def ingest(cells: DataFrame, batchId: String): Boolean = {
    val tag = SketchStore.tag(batchId)
    val legacy = SketchStore.legacyTag(batchId)
    // accept BOTH tag forms as "already committed": stores written before
    // the collision-free tag format carry plain sanitize-form dir tags,
    // which can never equal the new tags — without this, an at-least-once
    // replay of a pre-upgrade batch id would re-ingest and double-count
    // CMS/HLL cells, breaking the store's exactness contract
    val done = committedBatches
    if (done.contains(tag) || done.contains(legacy)) return false
    val dirName = log.newDataDirName(
      log.currentVersion.getOrElse(0L) + 1, tag = tag)
    toCells(cells)
      .withColumn("bucket", pmod(xxhash64(col("group")), lit(Buckets))
        .cast("int"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(log.dataPath(dirName).toString)
    val leaves = log.listCells(dirName, LevelPrefixes)
    if (leaves.isEmpty) { f.delete(log.dataPath(dirName), true); return true }
    @volatile var skipped = false
    log.commitRetry { current =>
      // re-check under the commit loop: a racing writer of the SAME
      // batch id that committed first turns this commit into a no-op.
      // Full batchesIn (dir-name tags AND compaction batches.txt
      // markers), not just name tags: the racer's dir may ALREADY have
      // been folded by a compaction between its commit and ours, in
      // which case only the marker still carries its batch id
      val present = batchesIn(current)
        .exists(b => b == tag || b == legacy)
      if (present) { skipped = true; current }
      else RecordStore.appendMutate(leaves, dirName)(current)
    }
    if (skipped) { f.delete(log.dataPath(dirName), true); false }
    else true
  }

  /** The live merged sketch, operator-shaped: HLL (group, bucket,
    * register) by register max; CMS (group, row, col, counter) by sum;
    * KMV (group, kmv) by k-min of union (the native aggregate re-runs
    * its own merge law over the stored minima). */
  def read(): DataFrame = merged(log.resolve() match {
    case None => log.emptyDf(schema)
    case Some((_, entries)) => log.readEntries(entries, schema)
  })

  private def merged(cells: DataFrame): DataFrame = {
    kind match {
      case HllKind => cells.groupBy(col("group"), col("a").as("bucket"))
        .agg(max(col("v")).cast("int").as("register"))
        .select(col("group"), col("bucket"), col("register"))
      case CmsKind => cells
        .groupBy(col("group"), col("a").as("row"), col("b").as("col"))
        .agg(sum(col("v")).as("counter"))
        .select(col("group"), col("row"), col("col"), col("counter"))
      case KmvKind => cells.groupBy(col("group"))
        .agg(graft.functions.functions.kmvSketch(col("v"), k).as("kmv"))
    }
  }

  /** Fold every live dir into ONE merged dir (read cost back to one
    * scan), carrying the folded batch ids in a `batches.txt` marker so
    * replayed old batches stay no-ops after the fold. Returns the
    * number of dirs folded (0 = nothing to do, or a racing compaction
    * fully superseded this one).
    *
    * Race-safe via [[RecordStore.compactMutate]]: the fold reads and
    * replaces only the PINNED pre-compact snapshot's dirs — an ingest
    * that commits while the fold runs keeps its dirs referenced (its
    * cells and dir-name batch tag both survive), and a cell already
    * superseded by a racing compaction is yielded rather than
    * double-folded. A blanket manifest replacement here would silently
    * drop such a concurrent ingest's data AND its replay guard. */
  def compact(): Int = {
    val resolved = log.resolve()
    if (resolved.isEmpty) return 0
    val (_, snapshot) = resolved.get
    val dirs = snapshot.values.flatten.toSet
    if (dirs.size <= 1) return 0
    val folded = batchesIn(snapshot)
    val newDir = log.newDataDirName(
      log.currentVersion.getOrElse(0L) + 1, tag = CompactTag)
    // merge-on-read result (pinned to the snapshot) re-normalized to
    // cell rows — the merged sketch IS valid cell input (max/sum/k-min
    // are associative)
    toCells(merged(log.readEntries(snapshot, schema)))
      .withColumn("bucket", pmod(xxhash64(col("group")), lit(Buckets))
        .cast("int"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(log.dataPath(newDir).toString)
    val out = f.create(new Path(log.dataPath(newDir), "batches.txt"), true)
    try out.write(folded.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val leaves = log.listCells(newDir, LevelPrefixes).toSet
    // only cells the fold actually rewrote may point at newDir
    val foldable = snapshot.keySet.intersect(leaves)
    @volatile var yielded = Set.empty[String]
    log.commitRetry { current =>
      val (entries, y) =
        RecordStore.compactMutate(snapshot, foldable, newDir)(current)
      yielded = y
      entries
    }
    if (yielded.size == foldable.size) {
      f.delete(log.dataPath(newDir), true); 0
    } else {
      // a PARTIAL yield (a racing compaction took some cells first)
      // leaves the yielded cells' old dirs live — report only what this
      // call actually folded, or a maintenance scheduler gating on the
      // return value concludes the store collapsed when it didn't
      val stillLive = yielded.flatMap(snapshot.getOrElse(_, Nil))
      (dirs -- stillLive).size
    }
  }

  /** Store economics from filesystem metadata only — see
    * [[ManifestLog.storeStats]]. */
  def stats(): ManifestLog.StoreStats = log.storeStats()

  /** Run [[compact]] only once live data dirs exceed `maxLiveDirs` —
    * the [[GramIndex.compactIfNeeded]] scheduling policy; cheap to call
    * after every load. */
  def compactIfNeeded(maxLiveDirs: Int = 8): Int = {
    require(maxLiveDirs >= 1, "maxLiveDirs must be >= 1")
    if (stats().liveDirs > maxLiveDirs) compact() else 0
  }

  /** See [[ManifestLog.vacuum]] / [[ManifestLog.vacuumOrphans]]. */
  def vacuum(): Unit = log.vacuum()
  def vacuumOrphans(olderThanMs: Long): Seq[String] =
    log.vacuumOrphans(olderThanMs)
}

object SketchStore {
  sealed abstract class Kind(val name: String)
  case object HllKind extends Kind("hll")
  case object CmsKind extends Kind("cms")
  case object KmvKind extends Kind("kmv")

  private[store] val CompactTag = "compactfold"
  private[store] val Buckets = 16

  /** Filesystem-safe replay-guard tag for a raw batch id: sanitized
    * prefix + an md5-derived suffix, so DISTINCT raw ids that differ
    * only in punctuation ("load-1" vs "load.1" vs "load_1") can never
    * collide to one tag — a collision would silently refuse the second
    * load's ingest as a replay. Deterministic, so a true replay of the
    * SAME raw id still maps to the same tag. */
  def tag(batchId: String): String = {
    require(batchId.nonEmpty, "batchId must be non-empty")
    val s = batchId.map(c => if (c.isLetterOrDigit) c else '_')
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(batchId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s.take(48) + "_" + md.take(4).map("%02x".format(_)).mkString
  }

  /** The pre-upgrade tag form (plain character sanitize, no md5
    * suffix). Never WRITTEN anymore — only consulted by the replay
    * guard so stores created before the collision-free format keep
    * refusing replays of their already-committed batch ids. */
  def legacyTag(batchId: String): String = {
    require(batchId.nonEmpty, "batchId must be non-empty")
    batchId.map(c => if (c.isLetterOrDigit) c else '_')
  }
  val LevelPrefixes: Seq[String] = Seq("bucket=")
  val schema: StructType = StructType(Seq(
    StructField("group", StringType),
    StructField("a", IntegerType),
    StructField("b", IntegerType),
    StructField("v", LongType),
    StructField("bucket", IntegerType)))
}
