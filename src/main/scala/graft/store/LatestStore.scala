package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Compacted latest table replacing the reference's 1-row-per-
  * `what:where` DynamoDB table (`storage.py:78-137`), stored as a
  * versioned-manifest table (see [[ManifestLog]] for the layout and
  * commit protocol) so readers are never exposed to a partial rewrite
  * and upserts rewrite only the key buckets a batch touches.
  *
  * A manifest maps each key bucket (`kp = pmod(xxhash64(what, where),
  * nBuckets)`) to the data version holding its current rows. The commit
  * CAS goes through the [[ManifestCommitter]] seam — rename-as-commit
  * by default, a [[ConditionalPutCommitter]] (the reference's DynamoDB
  * conditional-put shape) on object stores without fail-if-exists
  * rename.
  *
  * Incremental maintenance: an upsert merges ONLY the buckets present in
  * the batch — one key touches one bucket, so the rewrite is O(batch
  * keys / nBuckets of the table), not O(table). Untouched buckets keep
  * their old manifest entries. Superseded versions beyond `keepVersions`
  * are vacuumed after commit; `keepVersions >= 2` leaves a window for
  * in-flight readers on the previous snapshot.
  */
final class LatestStore(spark: SparkSession, path: String,
    nBuckets: Int = 16, keepVersions: Int = 3,
    committer: Option[ManifestCommitter] = None) {
  import spark.implicits._

  private val root = new Path(path)
  private val log = new ManifestLog(spark, path, keepVersions, committer)
  private lazy val f = Fs.fs(spark, path)

  /** true once any version has been committed (or a pre-manifest flat
    * table sits at the path — see [[legacyFiles]]). */
  def exists: Boolean = log.hasAny || legacyFiles.nonEmpty

  /** Parquet files written flat at `path` by the pre-manifest layout
    * (a whole-table rewrite per upsert). Readable as a snapshot; the
    * first upsert migrates them into version 1 and removes them. */
  private def legacyFiles: Seq[Path] =
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)

  /** bucket -> data-version dir name; manifests store one dir per kp. */
  private def asBuckets(entries: Map[String, Seq[String]]): Map[Int, String] =
    entries.collect { case (k, dirs) if dirs.nonEmpty => k.toInt -> dirs.head }

  private def bucketLeaf(dataVersion: String, kp: Int): String =
    new Path(log.dataPath(dataVersion), s"kp=$kp").toString

  /** `strict = false` (current-snapshot reads) tolerates a leaf
    * vanishing between resolve and scan — the benign race against a
    * concurrent vacuum, where re-resolving would just pick the newer
    * manifest anyway. `strict = true` (pinned time-travel reads) does
    * NOT exist-filter: a pinned snapshot that lost dirs to vacuum must
    * FAIL, never silently return a partial table. */
  private def readBuckets(entries: Map[Int, String], buckets: Iterable[Int],
      strict: Boolean = false): DataFrame = {
    val all = buckets.toSeq.sorted
      .flatMap(b => entries.get(b).map(bucketLeaf(_, b)))
    val leaves = if (strict) all else all.filter(p => f.exists(new Path(p)))
    if (leaves.isEmpty) emptyTable
    else spark.read.schema(RecordStore.schema).parquet(leaves: _*)
  }

  private def emptyTable: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      RecordStore.schema)

  /** Current snapshot (all buckets of the current manifest; a
    * pre-manifest flat table reads as-is until the first upsert
    * migrates it). */
  def latest: DataFrame = log.resolve() match {
    case None =>
      val legacy = legacyFiles
      if (legacy.isEmpty) emptyTable
      else spark.read.schema(RecordStore.schema)
        .parquet(legacy.map(_.toString): _*)
    case Some((_, raw)) =>
      val entries = asBuckets(raw)
      readBuckets(entries, entries.keys)
  }

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("kp",
      pmod(xxhash64(col("what"), col("where")), lit(nBuckets)).cast("int"))

  /** Persist-or-validate `nBuckets` (the [[FingerprintIndex]] marker
    * discipline): an upsert under a different modulus would read the
    * wrong bucket for existing keys and leave TWO live rows for one
    * (what, where) — the invariant the whole table exists to hold.
    * Tables from before this guard are stamped with the opener's value
    * on first upsert (unverifiable retroactively — keep passing what
    * the table was built with, as before). */
  private def ensureBuckets(): Unit = {
    val stored = Fs.ensureMarker(f, new Path(path, "_buckets"),
      nBuckets.toString)
    require(stored.toInt == nBuckets,
      s"latest table at $path was created with $stored buckets; opened " +
        s"with $nBuckets — merges would miss existing keys and break " +
        "the one-row-per-(what, where) invariant")
  }

  /** Monotone upsert: newest (metadata.start, create_time) per (what,
    * where) wins; replay-safe (applying the same batch twice is a no-op).
    * Only buckets containing batch keys are re-merged and rewritten. */
  def upsert(batch: DataFrame): Unit = {
    ensureBuckets()
    val cols = RecordStore.schema.fieldNames.map(col).toSeq
    val bucketed = withBucket(batch.select(cols: _*))
    // per-key batch winners first: bounds the merge input by key count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"what", $"where")
      .orderBy($"metadata.start".desc, $"create_time".desc, $"metadata.id".desc)
    val batchWinners = bucketed
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1).drop("__rn")
      .transform(graft.operators.Checkpoints.pin(_)) // stable across commit retries
    val touched = batchWinners.select("kp").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted // ≤ nBuckets rows
    if (touched.isEmpty) return

    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      if (attempts > 10)
        throw new java.io.IOException(s"upsert lost $attempts commit races under $path")
      val resolved = log.resolve()
      val (baseV, entries) = resolved
        .map { case (v, raw) => (v, asBuckets(raw)) }
        .getOrElse((0L, Map.empty[Int, String]))
      // first-ever commit over a pre-manifest flat table: fold the whole
      // legacy table into version 1 (all its buckets count as touched)
      // and remove the flat files once the commit lands
      val legacy = if (resolved.isEmpty) legacyFiles else Nil
      try {
        val (existing, touchedAll) =
          if (legacy.nonEmpty) {
            val legacyDf = withBucket(spark.read.schema(RecordStore.schema)
              .parquet(legacy.map(_.toString): _*))
            val legacyKps = legacyDf.select("kp").distinct()
              .collect().map(_.getInt(0))
            (legacyDf, (touched ++ legacyKps).distinct.sorted)
          } else
            // STRICT read for a merge: this path READS existing rows to
            // REWRITE them, so a missing referenced leaf must fail the
            // attempt — the non-strict exist-filter (benign for reads,
            // where re-resolving picks the newer manifest) would here
            // commit a table missing every key of the vanished bucket.
            // A leaf of the CURRENT manifest cannot be vacuumed, so this
            // only fires on external deletion or a flaky filesystem —
            // exactly when losing loudly beats losing silently.
            (withBucket(readBuckets(entries, touched, strict = true)), touched)
        val newV = baseV + 1
        // the data dir carries a writer nonce (see ManifestLog.newDataDirName):
        // two racing writers may both target manifest version N, and their
        // Spark write jobs must not collide on one directory
        val newDataVersion = log.newDataDirName(newV)
        val merged = existing.unionByName(batchWinners)
          .withColumn("__rn", row_number().over(w))
          .filter($"__rn" === 1).drop("__rn")
        // one shuffle partition per touched bucket -> one file per kp dir
        merged.repartition(touchedAll.size, col("kp"))
          .write.mode(SaveMode.Overwrite).partitionBy("kp")
          .parquet(log.dataPath(newDataVersion).toString)
        val newEntries = entries ++ touchedAll.map(_ -> newDataVersion)
        committed = log.tryCommit(newV,
          newEntries.map { case (k, d) => k.toString -> Seq(d) })
        if (!committed)
          // lost the race: another writer committed baseV+1 first; drop our
          // orphaned data version and re-merge against the new state
          f.delete(log.dataPath(newDataVersion), true)
        else legacy.foreach(p => f.delete(p, false))
      } catch {
        // the first-ever-commit race over a LEGACY flat table has a
        // second losing mode: the winner deletes the flat files after
        // committing while the loser's merge job is still SCANNING
        // them, so the loser dies with FileNotFound instead of a clean
        // tryCommit=false. If a newer manifest exists, that is exactly
        // what happened — a benign lost race; retry the loop, which
        // now reads the winner's manifest instead of the flat files.
        // Without a newer manifest the failure is real and rethrows.
        case scala.util.control.NonFatal(e)
            if legacy.nonEmpty && log.resolve().exists(_._1 > baseV) =>
          ()
      }
    }
    log.vacuum()
  }

  /** Offline reclamation of data dirs left by writers that crashed
    * between data-write and manifest-commit (never referenced, so never
    * swept by the regular vacuum). See [[ManifestLog.vacuumOrphans]]. */
  def vacuumOrphans(olderThanMs: Long): Seq[String] =
    log.vacuumOrphans(olderThanMs)

  /** Resolvable snapshot versions, oldest first (retention =
    * `keepVersions` commits). */
  def versions: Seq[Long] = log.versions

  /** Time travel: the latest table exactly as committed at `version`
    * (complete immutable snapshot; vacuumed versions throw — reading
    * the manifest or any reclaimed leaf fails loudly rather than
    * returning a silently partial snapshot). */
  def latestAt(version: Long): DataFrame = {
    val entries = asBuckets(log.readManifest(version))
    readBuckets(entries, entries.keys, strict = true)
  }
}
