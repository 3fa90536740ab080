package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Compacted latest table replacing the reference's 1-row-per-
  * `what:where` DynamoDB table (`storage.py:78-137`), stored as a
  * versioned-manifest table so readers are never exposed to a partial
  * rewrite and upserts rewrite only the key buckets a batch touches.
  *
  * Layout:
  * {{{
  * <path>/manifests/v0000000001.txt   # committed via atomic rename
  * <path>/data/v0000000001/kp=3/...   # immutable bucket data files
  * }}}
  *
  * A manifest maps each key bucket (`kp = pmod(xxhash64(what, where),
  * nBuckets)`) to the data version holding its current rows. Commit
  * protocol: write all data files, then write the next manifest to a
  * dot-prefixed temp name and `rename` it into place — rename-as-commit
  * is atomic file creation, so a reader either resolves the old manifest
  * or the new one, never a half-written table (the failure mode of the
  * old backup-then-rename dir swap, where a list between the two renames
  * saw no table at all). Hadoop `rename` refuses an existing destination,
  * which doubles as optimistic concurrency: a racing writer loses the
  * rename, re-reads the table state, and retries its merge — the same
  * conditional-put loop the reference gets from DynamoDB (`storage.py:82`),
  * and the same manifest-log shape Delta/Iceberg use on object stores
  * where directory renames are not atomic (data files here are only ever
  * created and later garbage-collected, never renamed).
  *
  * Incremental maintenance: an upsert merges ONLY the buckets present in
  * the batch — one key touches one bucket, so the rewrite is O(batch
  * keys / nBuckets of the table), not O(table). Untouched buckets keep
  * their old manifest entries. Superseded versions beyond `keepVersions`
  * are vacuumed after commit; `keepVersions >= 2` leaves a window for
  * in-flight readers on the previous snapshot.
  */
final class LatestStore(spark: SparkSession, path: String,
    nBuckets: Int = 16, keepVersions: Int = 3) {
  import spark.implicits._

  private val root = new Path(path)
  private val manifestsDir = new Path(root, "manifests")
  private val dataDir = new Path(root, "data")
  private def f = Fs.fs(spark, path)

  private val ManifestName = """v(\d{10})\.txt""".r

  /** true once any version has been committed (or a pre-manifest flat
    * table sits at the path — see [[legacyFiles]]). */
  def exists: Boolean =
    (f.exists(manifestsDir) && currentVersion.isDefined) ||
      legacyFiles.nonEmpty

  /** Parquet files written flat at `path` by the pre-manifest layout
    * (a whole-table rewrite per upsert). Readable as a snapshot; the
    * first upsert migrates them into version 1 and removes them. */
  private def legacyFiles: Seq[Path] =
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)

  private def currentVersion: Option[Long] =
    if (!f.exists(manifestsDir)) None
    else f.listStatus(manifestsDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestName(n) => Some(n.toLong)
        case _ => None
      }).sorted.lastOption

  private def manifestPath(v: Long) =
    new Path(manifestsDir, f"v$v%010d.txt")

  /** bucket -> data-version dir name (relative, e.g. "v0000000004"). */
  private def readManifest(v: Long): Map[Int, String] = {
    val in = f.open(manifestPath(v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.contains('='))
      .map { l => val Array(k, d) = l.split("=", 2); k.toInt -> d }
      .toMap
    finally in.close()
  }

  /** Resolve the current (version, bucket map), retrying once if a
    * concurrent vacuum removed the manifest between list and open. */
  private def resolve(): Option[(Long, Map[Int, String])] = {
    var attempts = 0
    while (attempts < 5) {
      currentVersion match {
        case None => return None
        case Some(v) =>
          try return Some((v, readManifest(v)))
          catch { case _: java.io.IOException => attempts += 1 }
      }
    }
    throw new java.io.IOException(s"cannot resolve current manifest under $path")
  }

  private def bucketLeaf(dataVersion: String, kp: Int): String =
    new Path(new Path(dataDir, dataVersion), s"kp=$kp").toString

  private def readBuckets(entries: Map[Int, String], buckets: Iterable[Int])
      : DataFrame = {
    val leaves = buckets.toSeq.sorted
      .flatMap(b => entries.get(b).map(bucketLeaf(_, b)))
      .filter(p => f.exists(new Path(p)))
    if (leaves.isEmpty) emptyTable
    else spark.read.schema(RecordStore.schema).parquet(leaves: _*)
  }

  private def emptyTable: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      RecordStore.schema)

  /** Current snapshot (all buckets of the current manifest; a
    * pre-manifest flat table reads as-is until the first upsert
    * migrates it). */
  def latest: DataFrame = resolve() match {
    case None =>
      val legacy = legacyFiles
      if (legacy.isEmpty) emptyTable
      else spark.read.schema(RecordStore.schema)
        .parquet(legacy.map(_.toString): _*)
    case Some((_, entries)) => readBuckets(entries, entries.keys)
  }

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("kp",
      pmod(xxhash64(col("what"), col("where")), lit(nBuckets)).cast("int"))

  /** Monotone upsert: newest (metadata.start, create_time) per (what,
    * where) wins; replay-safe (applying the same batch twice is a no-op).
    * Only buckets containing batch keys are re-merged and rewritten. */
  def upsert(batch: DataFrame): Unit = {
    val cols = RecordStore.schema.fieldNames.map(col).toSeq
    val bucketed = withBucket(batch.select(cols: _*))
    // per-key batch winners first: bounds the merge input by key count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"what", $"where")
      .orderBy($"metadata.start".desc, $"create_time".desc, $"metadata.id".desc)
    val batchWinners = bucketed
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1).drop("__rn")
      .localCheckpoint(true) // merge input is stable across commit retries
    val touched = batchWinners.select("kp").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted // ≤ nBuckets rows
    if (touched.isEmpty) return

    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      if (attempts > 10)
        throw new java.io.IOException(s"upsert lost $attempts commit races under $path")
      val resolved = resolve()
      val (baseV, entries) = resolved.getOrElse((0L, Map.empty[Int, String]))
      // first-ever commit over a pre-manifest flat table: fold the whole
      // legacy table into version 1 (all its buckets count as touched)
      // and remove the flat files once the commit lands
      val legacy = if (resolved.isEmpty) legacyFiles else Nil
      val (existing, touchedAll) =
        if (legacy.nonEmpty) {
          val legacyDf = withBucket(spark.read.schema(RecordStore.schema)
            .parquet(legacy.map(_.toString): _*))
          val legacyKps = legacyDf.select("kp").distinct()
            .collect().map(_.getInt(0))
          (legacyDf, (touched ++ legacyKps).distinct.sorted)
        } else (withBucket(readBuckets(entries, touched)), touched)
      val newV = baseV + 1
      // data dir carries a writer nonce: two racing writers may both
      // target manifest version N, and their Spark write jobs must not
      // collide on one directory (_temporary staging is per-job). The
      // manifest stores the exact dir name, so ordering still comes from
      // manifest numbers alone; the loser's orphan dir is deleted below.
      val newDataVersion =
        f"v$newV%010d-" + java.util.UUID.randomUUID().toString.take(8)
      val merged = existing.unionByName(batchWinners)
        .withColumn("__rn", row_number().over(w))
        .filter($"__rn" === 1).drop("__rn")
      // one shuffle partition per touched bucket -> one file per kp dir
      merged.repartition(touchedAll.size, col("kp"))
        .write.mode(SaveMode.Overwrite).partitionBy("kp")
        .parquet(new Path(dataDir, newDataVersion).toString)
      val newEntries = entries ++ touchedAll.map(_ -> newDataVersion)
      committed = commitManifest(newV, newEntries)
      if (!committed)
        // lost the race: another writer committed baseV+1 first; drop our
        // orphaned data version and re-merge against the new state
        f.delete(new Path(dataDir, newDataVersion), true)
      else legacy.foreach(p => f.delete(p, false))
    }
    vacuum()
  }

  /** Write manifest v to a WRITER-UNIQUE temp name, then rename-as-
    * commit under fail-if-destination-exists semantics. Returns false
    * when a concurrent writer already committed this version.
    *
    * Two hazards this must close (both found by review, one by the
    * racing-writers spec):
    *   - the temp name must carry a nonce: a shared `.vN.txt.tmp` lets
    *     racing writers overwrite each other's staged content, so the
    *     winner could publish the LOSER's entries;
    *   - `FileSystem.rename` on the local filesystem is POSIX rename(2),
    *     which silently REPLACES an existing destination — no CAS. The
    *     commit therefore goes through `FileContext.rename(…, Rename
    *     .NONE)`, whose contract is fail-if-exists on every
    *     implementation (HDFS enforces it natively). For filesystems
    *     with no FileContext binding (e.g. s3a), it falls back to
    *     exists-then-rename; in-process racers are additionally
    *     serialized by a JVM-wide per-table lock, which is what local
    *     tests and single-driver deployments actually race through. */
  private def commitManifest(v: Long, entries: Map[Int, String]): Boolean = {
    f.mkdirs(manifestsDir)
    val tmp = new Path(manifestsDir,
      f".v$v%010d-${java.util.UUID.randomUUID().toString.take(8)}.txt.tmp")
    val out = f.create(tmp, true)
    try out.write(
      entries.toSeq.sortBy(_._1)
        .map { case (b, d) => s"$b=$d" }.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(v)
    val ok = LatestStore.tableLock(path).synchronized {
      if (f.exists(target)) false
      else {
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            target.toUri, spark.sessionState.newHadoopConf())
          fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            // no FileContext binding: best-effort exists+rename (still
            // inside the JVM lock, which covers in-process racers)
            !f.exists(target) && f.rename(tmp, target)
        }
      }
    }
    if (!ok) f.delete(tmp, false)
    ok
  }

  /** Drop manifests beyond the `keepVersions` most recent, then the data
    * versions ONLY those expired manifests referenced (minus any still
    * referenced by a retained manifest). Deleting by expired-manifest
    * reference — instead of sweeping every dir no retained manifest
    * names — is what makes concurrent writers safe: an in-flight
    * writer's freshly-written dir is referenced by NO manifest yet, and
    * a delete-the-unreferenced sweep from a racing writer would rip its
    * `_temporary` staging out from under the active Spark write job
    * (caught by the racing-writers spec). The cost: a dir whose writer
    * crashed before committing is never referenced and so never swept —
    * bounded by crash count, and an offline age-based sweep can reclaim
    * them. */
  private def vacuum(): Unit = {
    val versions = f.listStatus(manifestsDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestName(n) => Some(n.toLong)
        case _ => None
      }).sorted
    val retained = versions.takeRight(keepVersions)
    val expired = versions.dropRight(keepVersions)
    if (expired.nonEmpty) {
      // a retained manifest that cannot be read ABORTS the vacuum: its
      // data dirs belong to the live 'alive' set, and silently treating
      // a transient read failure as "references nothing" would let the
      // expired-set sweep delete data the current snapshot still needs
      val alive =
        try retained.flatMap(readManifest(_).values).toSet
        // NonFatal, not just IOException: a corrupt line also throws
        // NumberFormatException, and any unreadable RETAINED manifest
        // must abort the vacuum, never fail the already-landed commit
        catch { case scala.util.control.NonFatal(_) => return }
      // an unreadable EXPIRED manifest is merely skipped: its dirs and
      // its file stay for the next vacuum, which is safe (never deletes
      // too much) and self-healing (retried every commit)
      val expiredRefs = expired.map(v =>
        v -> scala.util.Try(readManifest(v)).toOption)
      val dead = expiredRefs.flatMap(_._2).flatMap(_.values).toSet -- alive
      // data before manifests: a crash in between re-runs idempotently
      dead.foreach(d => f.delete(new Path(dataDir, d), true))
      expiredRefs.collect { case (v, Some(_)) => v }
        .foreach(v => f.delete(manifestPath(v), false))
    }
  }
}

object LatestStore {
  /** JVM-wide per-table commit locks: serialize in-process writers so
    * the commit CAS holds even on filesystems whose rename silently
    * overwrites (local) or that lack a FileContext binding. */
  private val tableLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  private[store] def tableLock(path: String): Object =
    tableLocks.getOrElseUpdate(path, new Object)
}
