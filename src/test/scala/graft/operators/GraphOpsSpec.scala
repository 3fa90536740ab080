package graft.operators

import graft.SparkSuite

class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ranksOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one star round: hand-computed integer trajectory") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, iters = 1))
    // center inflow = 3 leaves' full rank: 150000 + 850*3e6/1000
    assert(r(1L) === 2700000L)
    // each leaf gets 1e6 div 3 = 333333: 150000 + (850*333333) div 1000
    assert(r(2L) === 433333L)
    assert(r(3L) === 433333L)
    assert(r(4L) === 433333L)
  }

  test("isolated nodes keep the teleport rank; iters=0 is the uniform " +
    "start; center outranks leaves at any depth") {
    val nodes = Seq(1L, 2L, 3L, 4L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r0 = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, iters = 0))
    assert(r0.values.toSet === Set(1000000L))
    val r3 = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, iters = 3))
    assert(r3(99L) === 150000L, "no in-edges => teleport only")
    assert(Seq(2L, 3L, 4L).forall(l => r3(1L) > r3(l)))
  }

  test("deterministic under partitioning; directed edges respected") {
    val nodes = (1L to 50L).toDF("id")
    val pairs = (1L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    val a = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, 3))
    val b = ranksOf(GraphOps.pageRankUndirected(
      nodes.repartition(7), pairs.repartition(5), 3))
    assert(a === b)
    // pure sink in a directed 2-cycle-free edge: src loses, dst gains
    val d = ranksOf(GraphOps.pageRank(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("src", "dst"), iters = 2))
    assert(d(2L) > d(1L))
    assert(d(1L) === 150000L)
  }

  test("reliable checkpointing: identical ranks, survives losing every " +
    "persisted block (the simulated-executor-loss recompute)") {
    val nodes = (1L to 60L).toDF("id")
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val want = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, 3))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pr-ckpt").toString
    val r = GraphOps.pageRankUndirected(nodes, pairs, 3,
      checkpointDir = Some(dir))
    assert(ranksOf(r) === want, "checkpoint mode must not change ranks")
    // simulate executor loss: drop EVERY persisted block, then force a
    // recompute. localCheckpoint mode would fail here ("checkpoint
    // block not found"); reliable checkpoints re-read their files.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    assert(ranksOf(r) === want,
      "reliable-checkpoint ranks must recompute after block loss")
    // the context checkpoint dir is process-global and set once: if
    // another suite's reliable run won the race, this call's files
    // landed THERE (pageRank warns about the divergence) — so check
    // the scheme-stripped global dir, not the one this test passed
    val globalDir = new org.apache.hadoop.fs.Path(
      spark.sparkContext.getCheckpointDir.get).toUri.getPath
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).getOrElse(Array.empty).exists(anyFile)
    assert(anyFile(new java.io.File(globalDir)),
      s"no checkpoint files under $globalDir")
  }

  test("huge-graph fallback (broadcastMaxNodes=0): same ranks through " +
    "the co-partitioned join path") {
    val nodes = (1L to 50L).toDF("id")
    val pairs = (1L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    val want = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, 3))
    val got = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, 3,
      broadcastMaxNodes = 0L, edgesPerPartition = 10L))
    assert(got === want)
  }
}
