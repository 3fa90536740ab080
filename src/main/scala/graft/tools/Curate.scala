package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.streaming.{GateConfig, StreamOps}

/** The curation front door: ONE command that runs the full five-stage
  * streaming pipeline (quality gate → byte-exact dedup → near-dup →
  * verbatim-span scrub → semantic dedup) over a watched directory of
  * parquet document files, with persisted store histories, warm start,
  * and live maintenance — [[StreamOps.curateAllWithHistory]] wired the
  * way a production deployment would wire it.
  *
  *   runMain graft.tools.Curate <inputDir> [flags]
  *
  * Input files: parquet with columns `doc_id BIGINT`, `text STRING`,
  * `embedding ARRAY<FLOAT>` (all non-null; the embedding drives the
  * semantic stage). Drop files into `<inputDir>` and the stream picks
  * them up; `--once` drains what is present and exits
  * (Trigger.AvailableNow), the default follows the directory forever.
  *
  * Outputs, under `--out` (default `<root>/curate/out`):
  *   - `kept/batch=*`    the canonical, span-scrubbed survivors
  *                       (original columns + n_kept + scrubbed_text)
  *   - `reports/batch=*` one curation-report row per source per batch
  *                       ([[graft.operators.Curation.curationReport]])
  *   - `rejected/batch=*` gate-dropped rows with their `reasons`
  * All three trees are uniform `batch=<epoch-id>` partition layouts —
  * read each with one `spark.read.parquet(dir)`. The epoch id is the
  * stream's checkpoint-stable batch identity, and every sink writes
  * its `batch=<id>` dir with Overwrite (the Ingester report-sink
  * discipline, `Ingester.scala:175-178`), so OUTPUT is exactly-once:
  * a crash between a sink write and the checkpoint commit replays the
  * same id and rewrites the same dir instead of appending a second
  * copy (CurateSpec kill-point test). The four stores converge
  * exactly as before (the kill-point matrix), so re-running never
  * corrupts history either.
  * (Output trees written by the pre-epoch-id version used random
  * `batch=<uuid>` dirs; they read fine alongside — the layout is
  * identical — but carry no replay identity.)
  * A FRESH stream generation (checkpoint with no offsets) restarts
  * epoch ids at 0, so starting one over an `--out` that already holds
  * numbered batch dirs is refused loudly rather than letting the
  * Overwrite sinks silently clobber another run's output
  * ([[guardOutputGeneration]]).
  *
  * Store bootstrap: the four index stores live under
  * `<root>/curate/stores/`. The semantic cell index self-bootstraps
  * inside the pipeline — its coarse quantizer trains from the FIRST
  * batch's post-upstream survivors (never from raw input, which would
  * register phantom vectors for gate/dedup-dropped docs). Later runs
  * reuse every store as committed history.
  */
object Curate {

  final case class Config(
      inputDir: String,
      root: String,
      out: String,
      once: Boolean = false,
      gate: Option[GateConfig] = Some(GateConfig()),
      maintenanceEvery: Int = 8,
      minKeptTokens: Int = 15,
      thresholdMicro: Long = 300000L,
      nprobe: Int = 1,
      boilerplate: Seq[String] = Seq.empty)

  // the single source of non-gate defaults: parseConfig's fallbacks and
  // helpText's "(default N)" annotations both derive from this instance,
  // so changing a Config default can never leave --help lying about it
  private val Defaults = Config(inputDir = "", root = "", out = "")

  /** One stable entry point for specs and embedding callers: wires the
    * stores, starts the pipeline, and with `once` BLOCKS until the
    * drain finishes (returns the already-terminated query); without
    * `once` it returns the live continuous query. */
  def run(spark: SparkSession, cfg: Config)
      : org.apache.spark.sql.streaming.StreamingQuery =
    run(spark, cfg, _ => ())

  /** [[run]] with the pipeline's `onStage` instrumentation seam exposed
    * — the spec's crash-injection hook (kill between the sink write and
    * the checkpoint commit and prove the re-drain rewrites, not
    * duplicates). */
  private[graft] def run(spark: SparkSession, cfg: Config,
      onStage: String => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    graft.functions.functions.register(spark)
    guardOutputGeneration(spark, cfg)
    val stores = s"${cfg.root}/curate/stores"
    val exact = new graft.store.FingerprintIndex(spark, s"$stores/exact")
    val nearDup = new graft.store.NearDupIndex(spark, s"$stores/neardup")
    val grams = new graft.store.GramIndex(spark, s"$stores/grams")
    val cells = new graft.operators.CellIndex(spark, s"$stores/cells")

    // `source` is optional — parquet files without the column read as
    // null and the report simply carries one null-source stratum
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("source", StringType)))

    // No pre-training from raw input: the pipeline self-bootstraps its
    // quantizer from the FIRST batch's post-upstream survivors
    // (curateAllBatch) — training from the raw corpus would register
    // vectors for docs the gate/dedup stages drop, and those phantoms
    // would silently suppress every future near-match.

    // batch-tagged Overwrite = exactly-once output: the epoch id is the
    // stream's stable replay identity, so a replayed batch REWRITES its
    // own dir (the Ingester report-sink discipline) instead of minting
    // a fresh one and duplicating rows
    def sinkDir(kind: String, batchId: Long) =
      s"${cfg.out}/$kind/batch=$batchId"
    def writeTo(df: org.apache.spark.sql.DataFrame, kind: String,
        batchId: Long): Unit =
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(sinkDir(kind, batchId))

    val stream = spark.readStream.schema(schema).parquet(cfg.inputDir)
    val q = StreamOps.curateAllWithHistory(
      stream, exact, nearDup, grams, cells,
      boilerplate = cfg.boilerplate,
      checkpointDir = s"${cfg.root}/curate/checkpoint",
      minKeptTokens = cfg.minKeptTokens,
      thresholdMicro = cfg.thresholdMicro,
      nprobe = cfg.nprobe,
      gate = cfg.gate,
      gateSink = (gated, batchId) => {
        // no persist here: curateAllBatch pins the gated frame before
        // calling the sink (and an unpersist here would evict the very
        // cache its downstream store legs still read)
        writeTo(graft.operators.Curation.curationReport(
          gated, stratumCol = "source"), "reports", batchId)
        writeTo(gated.filter(col("keep") === 0), "rejected", batchId)
      },
      onStage = onStage,
      warmOnStart = true,
      maintenanceEvery = cfg.maintenanceEvery,
      availableNow = cfg.once) { (kept, batchId) =>
      writeTo(kept, "kept", batchId)
    }
    // with `once` the doc's contract is drain-then-return: AvailableNow
    // does NOT block on start(), so block here
    if (cfg.once) q.awaitTermination()
    q
  }

  /** A FRESH stream generation (checkpoint with no committed offsets)
    * restarts epoch ids at 0, and the exactly-once sinks OVERWRITE their
    * `batch=<id>` dirs — so starting a new generation against an `--out`
    * that already holds numbered batch dirs would silently delete
    * another run's batch=0, batch=1, ... Refuse loudly instead: the user
    * either resumes the original checkpoint (the normal replay path —
    * offsets exist, guard passes) or points the new generation at a
    * fresh `--out`. Pre-epoch `batch=<uuid>` dirs carry no numeric id
    * and can never collide, so they pass. */
  private[graft] def guardOutputGeneration(
      spark: SparkSession, cfg: Config): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val offsets = new org.apache.hadoop.fs.Path(
      s"${cfg.root}/curate/checkpoint/offsets")
    val fs = offsets.getFileSystem(hconf)
    val resuming = fs.exists(offsets) && fs.listStatus(offsets)
      .exists(_.isFile)
    if (resuming) return
    val Numbered = """batch=(\d+)""".r
    val clobberable = for {
      kind <- Seq("kept", "reports", "rejected")
      tree = new org.apache.hadoop.fs.Path(s"${cfg.out}/$kind")
      if fs.exists(tree)
      d <- fs.listStatus(tree)
      if d.isDirectory && Numbered.pattern.matcher(d.getPath.getName).matches
    } yield s"$kind/${d.getPath.getName}"
    require(clobberable.isEmpty,
      s"refusing to start a FRESH stream generation over existing " +
        s"numbered batch output (epoch ids restart at 0 and sinks " +
        s"Overwrite, so ${clobberable.take(3).mkString(", ")}" +
        s"${if (clobberable.size > 3) ", ..." else ""} would be " +
        s"silently deleted). Resume the original checkpoint at " +
        s"${cfg.root}/curate/checkpoint, or use a fresh --out.")
  }

  /** The ops readout for a curation root: one line per store family
    * with live dirs / cells / files / bytes and a compact hint when a
    * family's read fan-in is past the default maintenance bound — what
    * an operator checks before blaming ingest latency on data. Returns
    * the lines (printed by main) so the spec can pin the format. */
  def stats(spark: SparkSession, root: String,
      maxLiveDirs: Int = 8): Seq[String] = {
    val stores = s"$root/curate/stores"
    def hint(liveDirs: Int, files: Long, cells: Int): String =
      if (liveDirs > maxLiveDirs || (cells > 0 && files > 4L * cells))
        "  <- fragmented: run maintenance (maintainAll / compactIfNeeded)"
      else ""
    val exact = new graft.store.FingerprintIndex(spark, s"$stores/exact")
      .stats()
    val near = new graft.store.NearDupIndex(spark, s"$stores/neardup")
      .stats()
    val grams = new graft.store.GramIndex(spark, s"$stores/grams").stats()
    val cells = new graft.operators.CellIndex(spark, s"$stores/cells")
      .stats()
    Seq(
      f"exact    dirs=${exact.liveDirs}%-4d cells=${exact.cells}%-5d " +
        f"files=${exact.files}%-6d bytes=${exact.bytes}" +
        hint(exact.liveDirs, exact.files, exact.cells),
      f"neardup  dirs=${near.liveDirs}%-4d cells=${near.cells}%-5d " +
        f"files=${near.files}%-6d bytes=${near.bytes}" +
        hint(near.liveDirs, near.files, near.cells),
      f"grams    dirs=${grams.liveDirs}%-4d cells=${grams.cells}%-5d " +
        f"files=${grams.files}%-6d bytes=${grams.bytes}" +
        hint(grams.liveDirs, grams.files, grams.cells),
      f"semantic gens=${cells.generations}%-4d cells=${cells.cells}%-5d " +
        f"files=${cells.vectorFiles + cells.codeFiles}%-6d " +
        f"bytes=${cells.vectorBytes + cells.codeBytes}" +
        hint(0, cells.vectorFiles + cells.codeFiles, cells.cells))
  }

  /** Flag parsing, separated so the spec can pin the CLI contract
    * (`--k=v` and bare `--k` forms; unknown flags rejected loudly —
    * a typo'd threshold must not silently run with the default). */
  def parseConfig(args: Array[String]): Config = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    require(positional.length == 1,
      "usage: Curate <inputDir> [--root=DIR] [--out=DIR] [--once] " +
        "[--no-gate] [--min-words=N] [--max-words=N] [--min-stopwords=N] " +
        "[--maintenance-every=N] [--min-kept-tokens=N] " +
        "[--threshold-micro=M] [--nprobe=N] [--boilerplate=FILE]")
    val opts = flags.map(_.stripPrefix("--").split("=", 2))
      .map(a => a(0) -> a.lift(1).getOrElse("")).toMap
    val known = Set("root", "out", "once", "no-gate", "min-words",
      "max-words", "min-stopwords", "maintenance-every",
      "min-kept-tokens", "threshold-micro", "nprobe", "boilerplate")
    val unknown = opts.keySet.diff(known)
    require(unknown.isEmpty,
      s"unknown flag(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val root = opts.getOrElse("root", defaultRoot)
    // defaults come FROM GateConfig() — re-hardcoding them here would
    // silently fork the CLI's gate from every library caller's
    val d = GateConfig()
    val gate =
      if (opts.contains("no-gate")) None
      else Some(d.copy(
        minWords = opts.get("min-words").map(_.toLong)
          .getOrElse(d.minWords),
        maxWords = opts.get("max-words").map(_.toLong)
          .getOrElse(d.maxWords),
        minStopwords = opts.get("min-stopwords").map(_.toInt)
          .getOrElse(d.minStopwords)))
    Config(
      inputDir = positional(0),
      root = root,
      out = opts.getOrElse("out", s"$root/curate/out"),
      once = opts.contains("once"),
      gate = gate,
      maintenanceEvery = opts.get("maintenance-every").map(_.toInt)
        .getOrElse(Defaults.maintenanceEvery),
      minKeptTokens = opts.get("min-kept-tokens").map(_.toInt)
        .getOrElse(Defaults.minKeptTokens),
      thresholdMicro = opts.get("threshold-micro").map(_.toLong)
        .getOrElse(Defaults.thresholdMicro),
      nprobe = opts.get("nprobe").map(_.toInt).getOrElse(Defaults.nprobe),
      boilerplate = opts.get("boilerplate").map { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().toList.filter(_.nonEmpty) finally src.close()
      }.getOrElse(Seq.empty))
  }

  private def defaultRoot: String =
    sys.env.getOrElse("GRAFT_ROOT", sys.props("java.io.tmpdir") + "/graft")

  /** The full flag table `--help` prints (VERDICT r11 #7: the usage
    * string was the only flag reference and the README listed a
    * subset). One row per flag known to [[parseConfig]] plus the two
    * mode flags; the spec asserts the table and the parser can never
    * drift apart. */
  def helpText: Seq[String] = {
    val d = GateConfig()
    Seq(
      "usage: Curate <inputDir> [flags]   # stream-curate parquet docs",
      "       Curate --stats [--root=DIR] # ops readout, no stream",
      "       Curate --help               # this table",
      "",
      "Input: parquet files with doc_id BIGINT, text STRING,",
      "embedding ARRAY<FLOAT> (and optionally source STRING) dropped",
      "into <inputDir>. Output: kept/ reports/ rejected/ trees of",
      "batch=<epoch> dirs under --out; replays rewrite, never duplicate.",
      "",
      "flags:",
      s"  --root=DIR              store+checkpoint+output root " +
        s"(default $$GRAFT_ROOT or java.io.tmpdir/graft)",
      "  --out=DIR               output root (default <root>/curate/out)",
      "  --once                  drain what is present, then exit " +
        "(Trigger.AvailableNow); default follows the dir forever",
      "  --no-gate               disable the quality gate stage",
      s"  --min-words=N           gate: minimum words " +
        s"(default ${d.minWords})",
      s"  --max-words=N           gate: maximum words " +
        s"(default ${d.maxWords})",
      s"  --min-stopwords=N       gate: minimum distinct list stopwords " +
        s"(default ${d.minStopwords})",
      s"  --maintenance-every=N   full store-maintenance sweep after " +
        s"every Nth batch; 0 disables (default ${Defaults.maintenanceEvery})",
      s"  --min-kept-tokens=N     drop docs with fewer surviving tokens " +
        s"after span scrub (default ${Defaults.minKeptTokens})",
      s"  --threshold-micro=M     semantic near-dup cosine threshold in " +
        s"micro units (default ${Defaults.thresholdMicro} = " +
        s"${Defaults.thresholdMicro / 1e6})",
      s"  --nprobe=N              semantic stage: probed cells per query " +
        s"(default ${Defaults.nprobe})",
      "  --boilerplate=FILE      newline-separated head/tail boilerplate " +
        "lines to scrub before any stage",
      "  --stats                 print per-store dirs/cells/files/bytes " +
        "for --root and exit (with fragmentation hints)",
      "  --help                  print this table and exit")
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--help")) {
      helpText.foreach(println)
      return
    }
    // ops mode: `Curate --stats [--root=DIR]` — no input dir, no
    // stream; print the store readout and exit. The mode keeps the
    // strict flag contract: any OTHER argument alongside --stats is an
    // error, never silently ignored (a user typing `<dir> --once
    // --stats` must not have the drain skipped behind their back).
    if (args.contains("--stats")) {
      val stray = args.filterNot(a =>
        a == "--stats" || a.startsWith("--root="))
      require(stray.isEmpty,
        s"--stats takes only --root=DIR; unexpected: ${stray.mkString(" ")}")
      val root = args.collectFirst {
        case a if a.startsWith("--root=") => a.stripPrefix("--root=")
      }.getOrElse(defaultRoot)
      val s = SparkSession.builder().master("local[4]")
        .appName("graft-curate-stats")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      stats(s, root).foreach(println)
      s.stop()
      return
    }
    val cfg = parseConfig(args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = run(spark, cfg)
    q.awaitTermination()
    println(s"curate: ${if (cfg.once) "drained" else "stopped"} " +
      s"${cfg.inputDir} -> ${cfg.out}")
    spark.stop()
  }
}
