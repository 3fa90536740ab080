package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** The library-wide barrier-family flag (VERDICT r13 #3, widened in r14
  * from the three Dedup generators to every [[Checkpoints.pin]] site):
  * `spark.graft.checkpoint.dir` must switch each loop family to
  * RELIABLE checkpoints with bit-identical results, and the reliable
  * frames must survive losing every persisted block — the simulated
  * executor loss that would fail a localCheckpoint frame.
  *
  * The SparkContext checkpoint dir is process-global and set once per
  * JVM, so assertions about WHERE files land use
  * `sc.getCheckpointDir` (whatever dir won the race across suites),
  * never the dir this spec happens to pass.
  */
class CheckpointSeamSpec extends SparkSuite {
  import spark.implicits._

  private def withFlag[A](body: => A): A = {
    spark.conf.set(Checkpoints.ReliableDirKey, tmpDir("graft-seam-ckpt"))
    try body
    finally spark.conf.unset(Checkpoints.ReliableDirKey)
  }

  private def dropAllBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

  private def ranksOf(df: DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank honors the session flag with NO checkpointDir argument " +
    "(identical ranks; recomputable after total block loss)") {
    val nodes = (1L to 40L).toDF("id")
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val local = ranksOf(GraphOps.pageRankUndirected(nodes, pairs, 3))
    withFlag {
      val r = GraphOps.pageRankUndirected(nodes, pairs, 3)
      assert(ranksOf(r) === local, "flag must not change ranks")
      dropAllBlocks()
      assert(ranksOf(r) === local,
        "flagged pageRank must recompute after losing every block")
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "the flag must have routed through a reliable checkpoint dir")
    }
  }

  test("connectedComponents under the flag: identical clusters; " +
    "recomputable after total block loss") {
    // two chains + an isolated vertex: exercises the pointer-jump round
    val vertices = (1L to 21L).toDF("doc_id")
    val edges = ((1L until 10L).map(i => (i, i + 1)) ++
      (11L until 20L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    def clusters(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = clusters(Dedup.connectedComponents(vertices, edges))
    assert(local(10L) === 1L && local(20L) === 11L && local(21L) === 21L)
    withFlag {
      val r = Dedup.connectedComponents(vertices, edges)
      assert(clusters(r) === local, "flag must not change clusters")
      dropAllBlocks()
      assert(clusters(r) === local,
        "flagged CC labels must recompute after losing every block")
    }
  }

  test("Bpe.train under the flag learns the identical merge sequence") {
    val docs = Seq.fill(6)("low lower lowest low low").toDF("text")
    val local = Bpe.train(docs, merges = 5, minCount = 2L)
    assert(local.nonEmpty)
    withFlag {
      assert(Bpe.train(docs, merges = 5, minCount = 2L) === local)
    }
  }
}
