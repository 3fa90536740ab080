package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned manifest log shared by every manifested table
  * ([[LatestStore]], [[RecordStore]], [[WorkIdIndex]]): the generic
  * machinery behind snapshot-isolated commits on a filesystem.
  *
  * Layout under a table `path`:
  * {{{
  * <path>/manifests/v0000000001.txt     # committed via the CAS seam
  * <path>/data/v0000000001-ab12cd34/…   # immutable data dirs
  * }}}
  *
  * A manifest maps each CELL (a table-defined partition unit — a kp
  * bucket for the latest table, a `time_bucket=…/what=…` leaf for the
  * record table, a `work_id_prefix=…` dir for the work-id index) to the
  * ordered list of data dirs currently holding its rows. Commit
  * protocol: write data dirs first, then publish manifest N+1 through
  * [[ManifestCommitter.putIfAbsent]] — a reader resolves either the old
  * manifest or the new one, never a half-written table, and a racing
  * writer loses the CAS, re-reads, and retries its merge (the same
  * optimistic loop the reference runs against DynamoDB,
  * `storage.py:78-137`, and the same manifest-log shape Delta/Iceberg
  * use on object stores where directory operations are not atomic:
  * data files are only ever created and later garbage-collected, never
  * renamed).
  *
  * File format: one `cell=dir1,dir2` line per cell, cells URL-encoded
  * (values never need encoding — dir names are self-assigned). A
  * single-dir entry serializes as `cell=dir`, byte-identical to the
  * pre-generalization LatestStore format, so existing tables read
  * unchanged.
  */
final class ManifestLog(spark: SparkSession, path: String,
    keepVersions: Int = 3,
    committerOverride: Option[ManifestCommitter] = None) {

  require(keepVersions >= 1, "keepVersions must be >= 1")

  private[store] val root = new Path(path)
  private[store] val manifestsDir = new Path(root, "manifests")
  private[store] val dataRoot = new Path(root, "data")
  // lazy val, not def: each Fs.fs call clones the full Hadoop
  // Configuration (hundreds of entries) just to hit the FileSystem
  // cache — per-cell metadata loops were paying O(cells) conf clones
  private[store] lazy val f = Fs.fs(spark, path)
  private val committer = committerOverride.getOrElse(
    new RenameCommitter(spark, path))

  private val ManifestName = """v(\d{10})\.txt""".r

  /** All currently resolvable committed versions, oldest first —
    * bounded by `keepVersions` (vacuum drops older manifests and the
    * data only they referenced). Each is a complete, immutable
    * snapshot: the basis for time-travel reads. The SINGLE listing of
    * the manifests dir — currentVersion/vacuum/vacuumOrphans all go
    * through here so the name-pattern invariant lives in one place. */
  def versions: Seq[Long] =
    if (!f.exists(manifestsDir)) Nil
    else f.listStatus(manifestsDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestName(n) => Some(n.toLong)
        case _ => None
      }).sorted

  def currentVersion: Option[Long] = versions.lastOption

  /** true once any version has been committed. */
  def hasAny: Boolean = currentVersion.isDefined

  def manifestPath(v: Long): Path = new Path(manifestsDir, f"v$v%010d.txt")

  /** cell -> ordered data dir names for version `v`. */
  def readManifest(v: Long): Map[String, Seq[String]] = {
    val in = f.open(manifestPath(v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.contains('='))
      .map { l =>
        val Array(k, d) = l.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          d.split(",").toSeq.filter(_.nonEmpty)
      }
      .toMap
    finally in.close()
  }

  /** Resolve the current (version, entries), retrying if a concurrent
    * vacuum removed the manifest between list and open. */
  def resolve(): Option[(Long, Map[String, Seq[String]])] = {
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

  /** Table economics from filesystem METADATA only (no data scan):
    * live data dirs, referenced cells, parquet file count, total stored
    * bytes. Every manifested store exposes this as `stats()` — the
    * gauge behind its `compactIfNeeded` live-dirs policy (each commit
    * adds one dir; snapshot reads union one scan per live dir, so
    * unbounded dirs means unbounded read fan-in) and behind
    * size-derived heuristics like [[graft.store.GramIndex]]'s
    * bloom-prefilter ratio gate. */
  def storeStats(): ManifestLog.StoreStats = storeStats("")

  /** [[storeStats]] restricted to cells whose relative path starts with
    * `cellPrefix` — multi-kind tables (e.g. [[NearDupIndex]]'s
    * `kind=postings/...` vs `kind=docs/...`) gauge one kind's bytes
    * without scanning data. */
  def storeStats(cellPrefix: String): ManifestLog.StoreStats = resolve() match {
    case None => ManifestLog.StoreStats(0, 0, 0L, 0L)
    case Some((_, allEntries)) =>
      val entries = allEntries.filter(_._1.startsWith(cellPrefix))
      val dirCells = entries.toSeq
        .flatMap { case (cell, dirs) => dirs.map(_ -> cell) }.distinct
      var files = 0L
      var bytes = 0L
      dirCells.foreach { case (dir, cell) =>
        val leaf = new Path(cellBase(dir), cell)
        if (f.exists(leaf))
          f.listStatus(leaf).foreach { st =>
            if (st.getPath.getName.endsWith(".parquet")) {
              files += 1
              bytes += st.getLen
            }
          }
      }
      ManifestLog.StoreStats(
        dirCells.map(_._1).distinct.size, entries.size, files, bytes)
  }

  /** Committed row count for cells under `cellPrefix`, from parquet
    * FOOTERS only (no data scan). Data dirs are immutable once
    * committed — compaction writes NEW dirs, never rewrites old ones —
    * so per-(dir, cell) counts are cached JVM-wide: a steady-state
    * micro-batch pays footer reads only for the one dir its own commit
    * just added. This is what lets size-derived heuristics (the bloom
    * ratio gates) use REAL committed rows instead of a bytes-per-row
    * literal that drifts with schema or compression changes. Throws if
    * a footer is unreadable; callers that only need an estimate catch
    * and fall back to a bytes-based one. */
  def rowCount(cellPrefix: String = ""): Long =
    rowCountBudgeted(cellPrefix, Long.MaxValue)

  /** [[rowCount]] with a cap on UNCACHED footer reads per call — the
    * scale guard for first contact with a large pre-existing store,
    * where an unbounded walk is one driver-side open per file (100k
    * files = 100k object-store GETs mid-batch). Leaves within budget
    * are read exactly and cached; the remainder is EXTRAPOLATED from
    * the measured bytes/row of every leaf cached so far (one store =
    * one schema + codec, so the ratio transfers across its dirs) — a
    * constant derived from the store's own footers, never a literal.
    * Successive calls convert budget into cache, so the estimate
    * converges to exact; `warm()` pays the whole walk up front by
    * calling the unbudgeted form. Throws when the budget leaves
    * NOTHING measured to extrapolate from. */
  def rowCountBudgeted(cellPrefix: String, maxFooterReads: Long): Long =
    resolve() match {
      case None => 0L
      case Some((_, allEntries)) =>
        val conf = spark.sparkContext.hadoopConfiguration
        val dirCells = allEntries.filter(_._1.startsWith(cellPrefix)).toSeq
          .flatMap { case (cell, dirs) => dirs.map(_ -> cell) }.distinct
        // Cache bounding is the LRU's job (see rowCache): access-order
        // eviction means a store touching its own entries keeps them
        // fresh, so no store self-evicts what this very call is about
        // to use. (The previous policy — drop the CURRENT path's
        // entries whenever the global cache was over 100k — made any
        // single store with >100k leaves purge its own cache at the
        // start of every call and permanently thrash.) An eviction is
        // a re-read, never a correctness risk: exactRows accumulates
        // as the walk goes, and callRows/callBytes are scalars.
        var budget = maxFooterReads
        var exactRows = 0L
        var unreadBytes = 0L
        // leaves measured by THIS call — the freshest (and eviction-
        // proof) extrapolation base; all are under cellPrefix by
        // construction of dirCells
        var callRows = 0L
        var callBytes = 0L
        var skippedFiles = 0L
        dirCells.foreach { case (dir, cell) =>
          val key = (path, dir, cell)
          val cached = ManifestLog.rowCache.get(key)
          if (cached != null) exactRows += cached._1
          else {
            val leaf = new Path(cellBase(dir), cell)
            val parts =
              if (!f.exists(leaf)) Array.empty[org.apache.hadoop.fs.FileStatus]
              else f.listStatus(leaf)
                .filter(_.getPath.getName.endsWith(".parquet"))
            if (parts.length <= budget) {
              budget -= parts.length
              val (rows, bytes) = Fs.footerRows(conf, parts)
              ManifestLog.rowCache.put(key, (rows, bytes))
              exactRows += rows
              callRows += rows; callBytes += bytes
            } else {
              unreadBytes += parts.map(_.getLen).sum
              skippedFiles += parts.length
            }
          }
        }
        // Fragmentation guard (VERDICT r10 #8): a first call against a
        // never-compacted million-file store extrapolates from a sliver
        // of its leaves — legal (the estimate converges over calls) but
        // a signal the store wants compaction far more than a better
        // estimate. One warn per (store, magnitude), not per call.
        // divide, don't multiply: 4 * an unbudgeted Long.MaxValue call
        // overflows negative and would warn on every healthy walk
        if (skippedFiles / 4 > math.max(1L, maxFooterReads)) {
          val mag = java.lang.Long.numberOfLeadingZeros(skippedFiles)
          if (ManifestLog.fragWarned.add((path, mag)))
            System.err.println(
              s"[manifest] $path: $skippedFiles parquet files skipped " +
                s"by the footer budget ($maxFooterReads) — heavily " +
                "fragmented store; run compactIfNeeded (see stats()) " +
                "so row counts stop extrapolating")
        }
        if (unreadBytes == 0L) exactRows
        else {
          // bytes/row preference order: leaves measured this call
          // (always the right kind), then THIS STORE's cached leaves
          // under the same prefix — a multi-kind table's kinds have
          // different schemas (posting rows ~3x smaller than doc
          // rows), so a cross-kind ratio would skew — then the whole
          // store as a last resort
          def measured(p: String): (Long, Long) = {
            var mRows = 0L; var mBytes = 0L
            ManifestLog.rowCache.forEach { (k, v) =>
              if (k._1 == path && k._3.startsWith(p)) {
                mRows += v._1; mBytes += v._2
              }
            }
            (mRows, mBytes)
          }
          val (mRows, mBytes) =
            if (callRows > 0 && callBytes > 0) (callRows, callBytes)
            else measured(cellPrefix) match {
              case (r, b) if r > 0 && b > 0 => (r, b)
              case _ => measured("")
            }
          if (mBytes == 0L || mRows == 0L)
            throw new java.io.IOException(
              s"rowCountBudgeted($cellPrefix, $maxFooterReads) under $path: " +
                "budget exhausted before any leaf was measured")
          exactRows + (unreadBytes.toDouble * mRows / mBytes).toLong
        }
    }

  /** Writer-unique data dir name for a commit targeting version `v`.
    * The version prefix is advisory (ordering comes from manifest
    * numbers alone); the nonce keeps two racing writers' Spark write
    * jobs — whose `_temporary` staging must never collide — in
    * disjoint directories. `tag` marks the dir's ORIGIN (e.g.
    * "rebuild") so commit logic can recognize a racing writer of the
    * same kind by name where a set-diff cannot (two full rebuilds from
    * an empty snapshot look like plain appends to each other). */
  def newDataDirName(v: Long, tag: String = ""): String =
    f"v$v%010d-" + (if (tag.isEmpty) "" else tag + "-") +
      java.util.UUID.randomUUID().toString.take(8)

  def dataPath(dirName: String): Path = new Path(dataRoot, dirName)

  /** Base path a data dir's cell leaves hang off. Dir "." references
    * the table ROOT itself: a pre-manifest partitioned tree adopted in
    * place by a pure manifest commit (no file moves, so the migration
    * is crash- and race-safe); [[vacuum]] protects it. */
  def cellBase(dirName: String): Path =
    if (dirName == ".") root else dataPath(dirName)

  /** Relative partition-leaf paths under `dir`, walking one directory
    * level per prefix (e.g. Seq("time_bucket=", "what=")), exactly as
    * the partitioned write escaped them — cell keys never need parsing,
    * only joining back onto a base path. */
  def listCells(dir: String, levelPrefixes: Seq[String]): Seq[String] = {
    def walk(p: Path, prefixes: Seq[String]): Seq[String] = prefixes match {
      case Seq() => Seq("")
      case pref +: rest =>
        f.listStatus(p).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(pref))
          .flatMap(st => walk(st.getPath, rest)
            .map(tail => if (tail.isEmpty) st.getPath.getName
              else st.getPath.getName + "/" + tail))
    }
    val base = cellBase(dir)
    if (!f.exists(base)) Nil else walk(base, levelPrefixes)
  }

  /** Root-level partition leaves of a table that predates the manifest
    * log (empty once any manifest exists). */
  def legacyCells(levelPrefixes: Seq[String]): Seq[String] =
    if (hasAny) Nil else listCells(".", levelPrefixes)

  /** One-time adoption of a pre-manifest partitioned tree: commit
    * version 1 referencing the existing leaves in place (dir "."). A
    * lost CAS means another writer already migrated — equally fine. */
  def migrateLegacyIfNeeded(levelPrefixes: Seq[String]): Unit = {
    val cells = legacyCells(levelPrefixes)
    if (cells.nonEmpty)
      tryCommit(1L, cells.map(_ -> Seq(".")).toMap)
  }

  /** Snapshot read: one scan per live data dir (cells listed
    * explicitly, so a dir's superseded leaves are never read), unioned
    * — filters and partition pruning push into every branch, and
    * compaction bounds the fan-in. One scan PER TABLE is not possible
    * with the file source: partition discovery refuses leaves whose
    * `k=v` chains sit under different non-partition parents
    * (CONFLICTING_DIRECTORY_STRUCTURES — "load them separately and
    * then union"), so per-dir scans + union IS the supported shape;
    * collapsing the fan-in further is exactly what compaction is for. */
  def readEntries(entries: Map[String, Seq[String]],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val dirCells: Seq[(String, Seq[String])] = entries.toSeq
      .flatMap { case (cell, dirs) => dirs.map(_ -> cell) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .toSeq.sortBy(_._1)
    val scans = dirCells.map { case (dir, cells) =>
      val base = cellBase(dir)
      val leaves = cells.map(c => new Path(base, c).toString)
      spark.read
        .schema(schema)
        .option("basePath", base.toString)
        .parquet(leaves: _*)
    }
    scans.reduceOption(_ unionByName _).getOrElse(emptyDf(schema))
  }

  def emptyDf(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Publish version `v` through the CAS seam; false = lost the race. */
  def tryCommit(v: Long, entries: Map[String, Seq[String]]): Boolean = {
    f.mkdirs(manifestsDir)
    val bytes = entries.toSeq.sortBy(_._1)
      .map { case (c, dirs) =>
        java.net.URLEncoder.encode(c, "UTF-8") + "=" + dirs.mkString(",")
      }
      .mkString("", "\n", "\n").getBytes("UTF-8")
    committer.putIfAbsent(manifestPath(v), bytes)
  }

  /** Resolve-mutate-commit with retry: applies `mutate` to the freshly
    * resolved entries each attempt (missing table = version 0, empty
    * entries) and commits the result as the next version. Use when the
    * DATA being committed does not depend on the base version (appends,
    * supersede-style compactions) — only the manifest is recomputed on
    * a lost race, never the data files. Returns the committed version.
    */
  def commitRetry(
      mutate: Map[String, Seq[String]] => Map[String, Seq[String]]): Long = {
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val (v, entries) = resolve().getOrElse((0L, Map.empty[String, Seq[String]]))
      val next = mutate(entries)
      // no-op short-circuit: a mutate that yields everything (replay
      // race lost, fully-yielded compact, rebuild yield) returns its
      // input unchanged — publishing it anyway would burn a retention
      // slot and vacuum a REAL old snapshot out from under a pinned
      // time-travel reader, all for a byte-identical manifest
      if ((next eq entries) || next == entries) return v
      if (tryCommit(v + 1, next)) {
        vacuum()
        return v + 1
      }
    }
    throw new java.io.IOException(s"lost $attempts commit races under $path")
  }

  /** Drop manifests beyond the `keepVersions` most recent, then the
    * data dirs ONLY those expired manifests referenced (minus any still
    * referenced by a retained manifest). Deleting by expired-manifest
    * reference — instead of sweeping every dir no retained manifest
    * names — is what makes concurrent writers safe: an in-flight
    * writer's freshly-written dir is referenced by NO manifest yet, and
    * a delete-the-unreferenced sweep from a racing writer would rip its
    * `_temporary` staging out from under the active Spark write job
    * (caught by the racing-writers spec). The cost: a dir whose writer
    * crashed before committing is never referenced and so never swept —
    * bounded by crash count; [[vacuumOrphans]] reclaims them offline. */
  def vacuum(): Unit = {
    val vs = versions
    val retained = vs.takeRight(keepVersions)
    val expired = vs.dropRight(keepVersions)
    if (expired.nonEmpty) {
      // a retained manifest that cannot be read ABORTS the vacuum: its
      // data dirs belong to the live 'alive' set, and silently treating
      // a transient read failure as "references nothing" would let the
      // expired-set sweep delete data the current snapshot still needs.
      // NonFatal, not just IOException: a corrupt line also throws
      // NumberFormatException, and any unreadable RETAINED manifest
      // must abort the vacuum, never fail the already-landed commit
      val alive =
        try retained.flatMap(readManifest(_).values.flatten).toSet
        catch { case scala.util.control.NonFatal(_) => return }
      // an unreadable EXPIRED manifest is merely skipped: its dirs and
      // its file stay for the next vacuum, which is safe (never deletes
      // too much) and self-healing (retried every commit)
      val expiredRefs = expired.map(v =>
        v -> scala.util.Try(readManifest(v)).toOption)
      val dead = expiredRefs.flatMap(_._2).flatMap(_.values.flatten)
        .toSet -- alive -- ManifestLog.Protected
      // data before manifests: a crash in between re-runs idempotently
      dead.foreach(d => f.delete(dataPath(d), true))
      expiredRefs.collect { case (v, Some(_)) => v }
        .foreach(v => f.delete(manifestPath(v), false))
    }
  }

  /** Offline reclamation of crashed-writer leftovers: delete data dirs
    * under `data/` that (a) no EXISTING manifest references and (b) were
    * last modified more than `olderThanMs` ago. The age guard is what
    * keeps an in-flight writer safe — its dir is unreferenced by design
    * until its commit lands, but it is also FRESH (a directory's mtime
    * updates as Spark creates its `_temporary` staging and files), so
    * any threshold comfortably above a write's duration (hours) never
    * touches it. Run from a maintenance job, not concurrently with a
    * backlogged writer whose single write outlives the threshold.
    * Returns the reclaimed dir names. */
  def vacuumOrphans(olderThanMs: Long): Seq[String] = {
    if (!f.exists(dataRoot)) return Nil
    // ANY unreadable manifest aborts the sweep: treating a transient
    // read failure as "references nothing" would make the LIVE
    // snapshot's dirs look orphaned — and the age guard cannot save
    // them, because committed dirs are old by construction
    val referenced =
      try versions.flatMap(readManifest(_).values.flatten).toSet
      catch { case scala.util.control.NonFatal(_) => return Nil }
    val cutoff = System.currentTimeMillis() - olderThanMs
    val orphans = f.listStatus(dataRoot).toSeq
      .filter(st => st.isDirectory &&
        !referenced.contains(st.getPath.getName))
      .filter { st =>
        // object stores report SYNTHETIC directory mtimes (S3A: often
        // 0), so the dir entry alone cannot prove age — take the newest
        // timestamp across the dir AND every file under it (an
        // in-flight writer's staging has fresh FILE mtimes everywhere).
        // An age that still reads 0 is UNKNOWN, not old: never delete
        // on unknown age.
        val newest = newestMtimeUnder(st)
        newest > 0L && newest < cutoff
      }
      .map(_.getPath.getName)
    orphans.foreach(d => f.delete(dataPath(d), true))
    orphans
  }

  /** Newest modification time of a dir and everything under it; 0 when
    * nothing carries a real timestamp, Long.MaxValue (= "fresh, skip")
    * when the listing fails mid-walk — a dir vanishing under the lister
    * is being touched by SOMEONE and must not be swept. */
  private def newestMtimeUnder(
      st: org.apache.hadoop.fs.FileStatus): Long =
    try {
      var newest = st.getModificationTime
      val it = f.listFiles(st.getPath, true)
      while (it.hasNext)
        newest = math.max(newest, it.next().getModificationTime)
      newest
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
}

object ManifestLog {
  /** Dir names vacuum must never delete as a unit. "." marks the
    * table's own root (a migrated pre-manifest tree referenced in
    * place); deleting it would take the manifests with it. */
  private[store] val Protected: Set[String] = Set(".", "")

  /** Filesystem-level table economics; see [[ManifestLog.storeStats]]. */
  final case class StoreStats(liveDirs: Int, cells: Int, files: Long,
      bytes: Long)

  /** Default per-call footer-read budget for heuristic callers (the
    * bloom ratio gates): plenty for a healthy compacted store (a
    * steady-state micro-batch reads ~1 new dir), bounding only the
    * pathological first contact with a heavily fragmented one. A
    * work-bound knob like `bloomMaxKeys`, not a data constant. */
  val DefaultFooterBudget: Long = 4096L

  /** (table path, dir, cell) -> (footer row sum, parquet bytes). Safe
    * to share JVM-wide because committed data dirs are write-once.
    * Bounded as an ACCESS-ORDER LRU (~100 B/entry ⇒ ~15 MB cap): the
    * eldest entry across ALL stores goes first, so a store re-touching
    * its own entries keeps them, and two stores that together overflow
    * the cap churn only the overflow margin — never their whole
    * working sets. All access paths (get/put/forEach) go through the
    * synchronized wrapper, which serializes LinkedHashMap's
    * access-order mutation on get. */
  /** (store path, skip-count magnitude) pairs already warned about —
    * dedups the fragmentation hint so a hot ratio-gate loop doesn't
    * spam one line per call; a store that keeps fragmenting re-warns
    * at each magnitude step. */
  private val fragWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()

  private val RowCacheMax = 150000
  private val rowCache: java.util.Map[(String, String, String), (Long, Long)] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, String, String), (Long, Long)](
          1 << 12, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, String, String), (Long, Long)])
            : Boolean = size() > RowCacheMax
      })
}
