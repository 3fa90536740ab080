package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over similarity/link graphs — the centrality
  * companion to [[Dedup.connectedComponents]]: where CC answers "which
  * documents form one duplicate family", PageRank answers "which member
  * is the most CENTRAL" (a canonical-selection policy that beats
  * keep-longest when a cluster mixes originals and partial copies —
  * the original accumulates similarity edges from every copy), and on
  * crawl link graphs it is the classic domain-quality prior
  * (Common-Crawl-style curation weights documents by host centrality).
  *
  * Integer-exact PageRank: ranks are micro-scaled BIGINTs and one
  * iteration is
  *   r'(v) = 150000 + (850 · Σ_{u→v} (r(u) div outdeg(u))) div 1000
  * — the standard d = 0.85 update with every division an explicit
  * integer floor-div, so there is NO float anywhere and the trajectory
  * replays bit-identically in any engine (the oracle unrolls the same
  * iterations in SQL). Dangling-node mass is dropped, not
  * redistributed — the simplest of the standard variants; the ranking
  * it induces is what curation consumes. Range note: the inflow sum is
  * ≤ |V|·1e6, so the 850· product stays in BIGINT through ~10^9 nodes;
  * beyond that, swap the two constants for a DECIMAL(38) cast (the
  * temperatureRates pattern).
  *
  * Scale shape per iteration: the |V|-row rank table (16 bytes/node)
  * joins the frozen edge table on src — BROADCAST when |V| fits
  * (`broadcastMaxNodes`), so the edge side is never re-exchanged or
  * re-sorted per round; one map-partial hash aggregate onto dst; one
  * broadcast left join back to nodes. The broadcast hint is
  * load-bearing: the per-round rank table comes out of a checkpoint
  * (`LogicalRDD`, no stats), so AQE cannot see it is tiny and would
  * otherwise plan a sort-merge join that sorts ALL edges every round —
  * measured as the battery's only multi-GB spill at 64×. Graphs past
  * the broadcast bound fall back to a co-partitioned join with the
  * edge side hash-partitioned ONCE at `edgesPerPartition` rows per
  * partition (partitions sized to the data, not the core count).
  * Iterations are a fixed small count (the curation use wants a
  * ranking, not convergence to 1e-12), so the plan stays bounded like
  * [[Dedup.connectedComponents]]'s rounds.
  *
  * Checkpointing: loop lineage is truncated each round through the
  * [[Checkpoints.pin]] seam. By default that is `localCheckpoint`
  * (executor-local blocks — fastest, and fine in local mode), but
  * localCheckpoint blocks are NOT recomputable: on a cluster with
  * dynamic allocation or executor loss, a lost block fails the query.
  * Either pass `checkpointDir` (takes precedence) or set the
  * session-wide `spark.graft.checkpoint.dir` — rounds then write
  * RELIABLE checkpoints that survive executor death and arbitrary
  * recomputation, under the same flag that switches every other
  * barrier in the library.
  */
object GraphOps {

  /** `iters` integer PageRank rounds over directed `edges` (src, dst).
    * `nodes` must carry every vertex id (isolated vertices keep the
    * teleport rank). Returns (id, rank_micro).
    *
    * @param checkpointDir reliable checkpoint directory for cluster
    *   mode (see object doc); None = defer to [[Checkpoints.pin]]
    *   (reliable when `spark.graft.checkpoint.dir` is set,
    *   executor-local otherwise)
    * @param broadcastMaxNodes broadcast the per-round rank table up to
    *   this many vertices (16 B/row payload; 4M ≈ tens of MB built)
    * @param edgesPerPartition co-partitioned fallback's edge rows per
    *   shuffle partition */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      checkpointDir: Option[String] = None,
      broadcastMaxNodes: Long = 4000000L,
      edgesPerPartition: Long = 250000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(broadcastMaxNodes >= 0, "broadcastMaxNodes must be >= 0")
    require(edgesPerPartition >= 1, "edgesPerPartition must be >= 1")
    val spark = nodes.sparkSession
    checkpointDir.foreach { d =>
      spark.sparkContext.getCheckpointDir match {
        case None => spark.sparkContext.setCheckpointDir(d)
        case Some(existing) =>
          // the context dir is process-global and cannot be re-pointed
          // per-call; silently ignoring the argument would leave
          // reliable checkpoints landing somewhere the caller didn't
          // ask for — make the divergence visible instead. Suffix
          // match: setCheckpointDir appends a random child dir.
          // Compare whole URIs, not just paths: hdfs://nn/tmp/ck and
          // file:/tmp/ck share a path but are different filesystems. A
          // schemeless side resolves through the default FS and cannot
          // be distinguished — only an explicit scheme/authority
          // CONFLICT proves divergence.
          def place(p: String) = {
            val u = new org.apache.hadoop.fs.Path(p).toUri
            (Option(u.getScheme), Option(u.getAuthority), u.getPath)
          }
          val (es, ea, ep) = place(
            new org.apache.hadoop.fs.Path(existing).getParent.toString)
          val (ds, da, dp) = place(d)
          val samePlace = existing == d || (ep == dp &&
            (es == ds || es.isEmpty || ds.isEmpty) &&
            (ea == da || ea.isEmpty || da.isEmpty))
          if (!samePlace)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"pageRank checkpointDir=$d ignored: SparkContext already " +
              s"checkpoints to $existing (set once per context)")
      }
    }
    // materialize the loop-invariant inputs ONCE and truncate each
    // round's lineage (the [[Dedup.connectedComponents]] discipline):
    // without this, round i's plan re-evaluates the edge derivation —
    // often an expensive similarity join — 2× per round and nests every
    // earlier round inside it (measured on the 64× profile: 2× wall
    // over the checkpointed form). Checkpoints are LAZY (eager=false):
    // they materialize inside the consuming action instead of as
    // separate up-front jobs, which saves ~25% wall at small graph
    // sizes with identical shuffle bytes at every scale
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(false)
      else Checkpoints.pin(df, eager = false)
    val ids = cp(nodes.select(col("id")))
    // counts run over the materialized checkpoints, not the derivations
    val small = ids.count() <= broadcastMaxNodes
    // checkpoint the RAW edges first: the (often expensive) edge
    // derivation executes exactly once, and its blocks feed BOTH the
    // outdeg aggregate and the join below — without this the
    // derivation subtree appears twice in the plan (measured at 64×
    // as shuffle read ≈ 3× shuffle write)
    val eRaw = cp(edges)
    val outdeg = eRaw.groupBy(col("src")).agg(count(lit(1)).as("__od"))
    val e =
      if (small)
        // broadcast outdeg (≤ |V| rows): the edge side is never
        // exchanged OR sorted — the sort-merge fallback's edge-side
        // sort was the battery's only multi-GB spill at 64×
        cp(eRaw.join(broadcast(outdeg), Seq("src")))
      else {
        val parts = math.max(spark.sparkContext.defaultParallelism.toLong,
          (eRaw.count() + edgesPerPartition - 1) / edgesPerPartition).toInt
        // exchange the edge side ONCE at data-sized partitions; the
        // checkpoint pins hash(src, parts), so each round exchanges
        // only the |V|-row rank side to match
        cp(eRaw.repartition(parts, col("src")).join(outdeg, Seq("src")))
      }
    var ranks = ids.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val rSrc = ranks.select(col("id").as("src"), col("rank_micro"))
      val inflow = e
        .join(if (small) broadcast(rSrc) else rSrc, Seq("src"))
        .select(col("dst"),
          expr("rank_micro div __od").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__m"))
        .select(col("dst").as("id"), col("__m"))
      ranks = ids
        .join(if (small) broadcast(inflow) else inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(850 * coalesce(__m, 0)) div 1000"))
            .as("rank_micro"))
      ranks = cp(ranks)
    }
    ranks
  }

  /** [[pageRank]] over an UNDIRECTED similarity graph given as unique
    * (a, b) pairs with a < b (the [[Dedup]] pair operators' shape):
    * symmetrize, then rank. */
  def pageRankUndirected(nodes: DataFrame, pairs: DataFrame,
      iters: Int, checkpointDir: Option[String] = None,
      broadcastMaxNodes: Long = 4000000L,
      edgesPerPartition: Long = 250000L): DataFrame = {
    val e = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    pageRank(nodes, e, iters, checkpointDir, broadcastMaxNodes,
      edgesPerPartition)
  }
}
