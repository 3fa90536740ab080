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
  * Scale shape per iteration: one join of edges against the |V|-row
  * rank table on src (both sides shuffle-partitioned on the join key;
  * ranks are 16 bytes/node), one hash aggregate onto dst, one left
  * join back to nodes. Iterations are a fixed small count (the
  * curation use wants a ranking, not convergence to 1e-12), so the
  * plan stays bounded like [[Dedup.connectedComponents]]'s rounds.
  */
object GraphOps {

  /** `iters` integer PageRank rounds over directed `edges` (src, dst).
    * `nodes` must carry every vertex id (isolated vertices keep the
    * teleport rank). Returns (id, rank_micro). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // materialize the loop-invariant inputs ONCE and truncate each
    // round's lineage (the [[Dedup.connectedComponents]] discipline):
    // without this, round i's plan re-evaluates the edge derivation —
    // often an expensive similarity join — 2× per round and nests every
    // earlier round inside it (measured on the 64× profile: 2× wall
    // over the checkpointed form). Checkpoints are LAZY (eager=false):
    // they materialize inside the consuming action instead of as
    // separate up-front jobs, which saves ~25% wall at small graph
    // sizes with identical shuffle bytes at every scale
    val ids = nodes.select(col("id")).localCheckpoint(false)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__od"))
    val e = edges.join(outdeg, Seq("src")).localCheckpoint(false)
    var ranks = ids.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val inflow = e
        .join(ranks.select(col("id").as("src"), col("rank_micro")),
          Seq("src"))
        .select(col("dst"),
          expr("rank_micro div __od").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__m"))
      ranks = ids
        .join(inflow.select(col("dst").as("id"), col("__m")), Seq("id"),
          "left")
        .select(col("id"),
          (lit(150000L) + expr("(850 * coalesce(__m, 0)) div 1000"))
            .as("rank_micro"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** [[pageRank]] over an UNDIRECTED similarity graph given as unique
    * (a, b) pairs with a < b (the [[Dedup]] pair operators' shape):
    * symmetrize, then rank. */
  def pageRankUndirected(nodes: DataFrame, pairs: DataFrame,
      iters: Int): DataFrame = {
    val e = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    pageRank(nodes, e, iters)
  }
}
