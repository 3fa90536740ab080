package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index materialized as cell-partitioned storage: vectors live in a
  * parquet table partitioned by cell id, centroids in a small side table.
  * A probe then READS only the probed cells — the scan's PartitionFilters
  * prune every other cell's files — instead of scanning the corpus and
  * discarding non-probed rows in a filter (what [[Similarity.ivfTopK]]
  * does over an unpartitioned table). At 100 TB with, say, 4096 cells and
  * nprobe=8, a query batch touches 0.2% of the data; this layout is the
  * difference between an index and a full scan per batch.
  */
final class CellIndex(spark: SparkSession, path: String) {

  private def vectorsPath = path + "/vectors"
  private def centroidsPath = path + "/centroids"

  /** Materialize the index: vectors partitioned by cell (one directory
    * per cell — cells are the coarse-quantizer granularity, thousands at
    * most, so directory fan-out stays bounded), plus the per-cell mean
    * vectors. */
  def build(emb: DataFrame, cellCol: String = "label"): Unit = {
    emb
      .withColumn("cell", col(cellCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(vectorsPath)
    Similarity.centroids(emb, cellCol)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath)
  }

  /** Build with LEARNED cells: train a k-means coarse quantizer
    * ([[Similarity.kmeans]] — deterministic seeds, integer-exact
    * updates), assign every vector to its nearest trained centroid, and
    * lay the corpus out by that assignment. This is the from-scratch IVF
    * build — no pre-existing label column required; `k` picks the
    * partition granularity (at 100 TB: thousands of cells so nprobe/k
    * bounds the fraction of data a probe reads). */
  def buildLearned(emb: DataFrame, k: Int, iters: Int = 2): Unit = {
    graft.functions.functions.register(emb.sparkSession)
    // train driver-side: the model is k×dim doubles, and writing it from
    // the collected value (not the kmeans result plan) avoids re-running
    // full-corpus assignment passes just to persist k rows
    val cents = Similarity.kmeansModel(emb, k, iters)
    // assignment is the trainer's own map-side argmin expression — the
    // partitioned write is then the only data movement in the build
    val assigned = emb.withColumn("cell", Similarity.nearestCentroidExpr(
      cents, expr("CAST(embedding AS ARRAY<DOUBLE>)")))
    assigned
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(vectorsPath)
    val session = spark
    import session.implicits._
    cents.map { case (cl, cv) => (cl, cv.toVector) }
      .toDF("cell", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath)
  }

  /** Incremental maintenance: route a batch of new vectors to their
    * nearest existing cells and append — arriving data lands in the
    * right partitions without rebuilding or re-training (the standard
    * IVF ingest path). Centroids are left as trained: a quantizer that
    * shifts with every batch would silently change probe routing.
    *
    * If the PQ half is materialized ([[buildPq]] has run), the batch is
    * ALSO encoded with the stored codebooks and appended to the codes
    * table in the same operation — encode is map-only, so the ADC probes
    * ([[topKPq]]/[[topKPqRerank]]) never silently exclude appended
    * vectors. Codebooks, like centroids, are left as trained.
    *
    * Returns the batch's assignment-distance statistics (squared-
    * Euclidean micro-distance to the winning trained centroid), the
    * observable that makes the "re-train + rebuild when the corpus
    * drifts" decision measurable: a batch drawn from the trained
    * distribution reports distances in the trained regime, a drifted
    * batch reports a jump in mean/p95. Track these per append and
    * re-train when they trend away from the build-time profile ([[
    * retrainIfDrifted]] automates exactly that policy). Cost: one extra
    * map-side aggregate over the batch (never the corpus). */
  def append(newVectors: DataFrame): CellIndex.DriftStats = {
    graft.functions.functions.register(newVectors.sparkSession)
    // cell ids pass through lit(), so integer AND string-labeled indexes
    // are appendable — whatever type build()/buildLearned() partitioned by
    val cents = centroids.collect()
      .map(r => r.getAs[Any]("cell") ->
        r.getAs[scala.collection.Seq[Double]]("centroid")).toSeq
    // null/uncastable embeddings have no distance and so no cell —
    // unroutable and unprobeable, they are excluded rather than written
    // into a null partition; persist so the batch is evaluated ONCE for
    // both the write and the stats (and the two can never disagree on a
    // nondeterministic source)
    val assigned = newVectors.withColumn("__a",
      Similarity.nearestCentroidStruct(
        cents, expr("CAST(embedding AS ARRAY<DOUBLE>)")))
      .filter(col("__a.d").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val routed = assigned.withColumn("cell", col("__a.cl")).drop("__a")
      routed
        .write.mode(SaveMode.Append)
        .partitionBy("cell")
        .parquet(vectorsPath)
      if (hasPq)
        Similarity.pqEncode(routed, codebooks, keep = Seq("cell"))
          .write.mode(SaveMode.Append)
          .partitionBy("cell")
          .parquet(codesPath)
      val stats = assigned
        .select(col("__a.d").as("d"))
        .agg(count(lit(1)).as("n"), avg(col("d")).as("mean"),
          expr("percentile(d, 0.95)").as("p95"), max(col("d")).as("mx"))
        .collect().head
      if (stats.getLong(0) == 0L) CellIndex.DriftStats(0L, 0.0, 0.0, 0L)
      else CellIndex.DriftStats(stats.getLong(0), stats.getDouble(1),
        stats.getDouble(2), stats.getLong(3))
    } finally assigned.unpersist(false)
  }

  private def codesPath = path + "/codes"
  private def codebooksPath = path + "/codebooks"

  /** Whether the PQ half is materialized (codebooks written by
    * [[buildPq]]) — gates the append-time code sync. */
  private def hasPq: Boolean =
    graft.store.Fs.exists(spark, codebooksPath)

  /** Materialize the PQ half of the index: train sub-codebooks on the
    * indexed corpus ([[Similarity.pqTrain]] — deterministic, one corpus
    * pass per Lloyd round), encode every vector, and store the CODES
    * partitioned by cell next to the float vectors. The serving read
    * path of [[topKPq]] is then the probed cells' codes only —
    * m bytes/vector where the float table is 4·dim — while the float
    * table stays in place for exact re-ranking and rebuilds. This is
    * the storage layout of a billion-scale IVF-PQ index: IVF prunes
    * which FILES a probe reads, PQ shrinks the BYTES in them. */
  def buildPq(m: Int = 4, k: Int = 4, iters: Int = 2): Unit = {
    graft.functions.functions.register(spark)
    val emb = vectors
    val books = Similarity.pqTrain(emb, m, k, iters)
    Similarity.pqEncode(emb, books, keep = Seq("cell"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(codesPath)
    val session = spark
    import session.implicits._
    books.map { case (j, cl, cv) => (j, cl, cv.toVector) }
      .toDF("subspace", "cluster", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(codebooksPath)
  }

  def codes: DataFrame = spark.read.parquet(codesPath)

  /** The stored PQ codebooks, driver-side (m×k×(dim/m) doubles). */
  def codebooks: Seq[(Int, Int, Seq[Double])] =
    spark.read.parquet(codebooksPath).collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toVector: Seq[Double]))
      .toSeq.sortBy(t => (t._1, t._2))

  /** Shared probe routing for the ADC serving legs ([[topKPq]] and
    * [[topKPqRerank]] — ONE copy, so probe semantics cannot drift
    * between them): per-query PQ lookup table + the nprobe nearest
    * cells by centroid cosine, plus the driver-side distinct
    * probed-cell list that partition-prunes the codes scan.
    * Returns (probes(query_id, __lut, cell), probedCells, m). */
  private def pqProbeRouting(queries: DataFrame, nprobe: Int)
      : (DataFrame, Seq[Any], Int) = {
    graft.functions.functions.register(spark)
    if (queries.sparkSession ne spark)
      graft.functions.functions.register(queries.sparkSession)
    val books = codebooks
    val m = books.map(_._1).max + 1
    val sub = books.head._3.length
    val cents = centroids
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim_micro").desc, col("cell"))
    val probes = queries
      .withColumn("__lut", Similarity.pqLutExpr(books, m, sub, "qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim_micro", expr(
        s"CAST(round(${Similarity.cosineExpr("qv", "centroid")} * 1000000) AS BIGINT)"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("__lut"), col("cell"))
    val probedCells = probes.select("cell").distinct().collect()
      .map(_.get(0)).toSeq
    (probes, probedCells, m)
  }

  /** IVF-PQ top-k over the MATERIALIZED index: probe cells by centroid
    * cosine exactly as [[topK]], then rank only the probed cells'
    * stored codes by ADC distance through per-query lookup tables —
    * the scan reads the codes table with `PartitionFilters:
    * [cell IN (…)]` and never touches a stored float. Same ranking
    * semantics as [[Similarity.ivfPqTopK]] (shared oracle): the index
    * changes what is READ, not the answer. */
  def topKPq(queries: DataFrame, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val (probes, probedCells, m) = pqProbeRouting(queries, nprobe)
    val cands = codes
      .filter(col("cell").isInCollection(probedCells))
      .withColumnRenamed("vec_id", "cand_id")
    Similarity.adcRankTopK(cands.join(broadcast(probes), Seq("cell")),
      m, k, extraCols = Seq("cell"))
  }

  /** IVF-PQ probe WITH an exact re-rank leg — the production serving
    * shape: ADC ranks the probed cells' stored codes cheaply (m lookups
    * per candidate, never a stored float), the top `rerank` candidates
    * per query then join back to the STORED float vectors for exact
    * cosine, and the final top-k comes from the exact scores. This caps
    * quantization error at the ranking boundary: ADC only has to get
    * the true top-k somewhere into its top-r (r = `rerank`), not order
    * them.
    *
    * Read shape: the float-table read is candidate-bounded, not a scan —
    * the scan itself is partition-pruned to the probed cells
    * (`PartitionFilters: [cell IN (…)]`), and the tiny candidate set
    * (|queries|·r rows) is BROADCAST against it, so only probed files
    * are opened and only r rows per query survive the join. Cost over
    * [[topKPq]]: one broadcast join + |queries|·r exact distances. */
  def topKPqRerank(
      queries: DataFrame, k: Int = 5, nprobe: Int = 2,
      rerank: Int = 20): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val (probes, probedCells, m) = pqProbeRouting(queries, nprobe)
    val cands = codes
      .filter(col("cell").isInCollection(probedCells))
      .withColumnRenamed("vec_id", "cand_id")
    // stage 1 — ADC shortlist: top-r per query over the probed codes
    val shortlist = Similarity
      .adcRankTopK(cands.join(broadcast(probes), Seq("cell")),
        m, rerank, extraCols = Seq("cell"))
      .select(col("query_id"), col("cand_id"), col("cell"))
      .join(broadcast(queries.select(col("query_id"), col("qv"))),
        Seq("query_id"))
    // stage 2 — exact re-rank: probed cells' floats (partition-pruned
    // scan), broadcast-joined with the tiny shortlist, exact cosine
    val floats = vectors
      .filter(col("cell").isInCollection(probedCells))
      .select(col("vec_id").as("cand_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("cv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_micro").desc, col("cand_id"))
    floats.join(broadcast(shortlist), Seq("cand_id"))
      .withColumn("cos_sim_micro", expr(
        s"CAST(round(${Similarity.cosineExpr("qv", "cv")} * 1000000) AS BIGINT)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cell"), col("rank"),
        col("cos_sim_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  def vectors: DataFrame = spark.read.parquet(vectorsPath)
  def centroids: DataFrame = spark.read.parquet(centroidsPath)

  /** IVF top-k over the materialized index. `queries` carries
    * (query_id, qv: Array[Double]); probe cells are assigned by centroid
    * cosine on the driver-collected (small) centroid table, and the
    * candidate scan reads only those cells — check the plan for
    * `PartitionFilters: [cell IN (…)]`. */
  def topK(queries: DataFrame, k: Int = 5, nprobe: Int = 2): DataFrame = {
    // cosineExpr emits vector_dot — the candidate plan is rooted in THIS
    // index's session (vectors/centroids), so that registry is the one
    // that must resolve it; register on the caller's session too in case
    // the query side analyzes separately
    graft.functions.functions.register(spark)
    if (queries.sparkSession ne spark)
      graft.functions.functions.register(queries.sparkSession)
    val cents = centroids
    // micro-rounded probe similarity — same integer-exact ranking as
    // Similarity.ivfTopK, so index and full-scan variants share an oracle
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim_micro").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cent_sim_micro", expr(
        s"CAST(round(${Similarity.cosineExpr("qv", "centroid")} * 1000000) AS BIGINT)"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // the probed cell ids are a tiny driver-side list (|queries|×nprobe
    // at most): inlining them as a literal IN-list is what lets the
    // parquet source prune partitions at planning time
    val probedCells = probes.select("cell").distinct().collect()
      .map(_.get(0)).toSeq
    val cands = vectors
      .filter(col("cell").isInCollection(probedCells))
      .select(col("vec_id").as("cand_id"), col("cell"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("cv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_micro").desc, col("cand_id"))
    cands.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim_micro", expr(
        s"CAST(round(${Similarity.cosineExpr("qv", "cv")} * 1000000) AS BIGINT)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cell"), col("rank"),
        col("cos_sim_micro"))
      .orderBy(col("query_id"), col("rank"))
  }
}

object CellIndex {
  /** Per-append assignment-distance profile: squared-Euclidean
    * micro-distances (×1e6, the trainer's own unit) from each appended
    * vector to its winning trained centroid. */
  final case class DriftStats(
      n: Long, meanMicroDist: Double, p95MicroDist: Double, maxMicroDist: Long)
}
