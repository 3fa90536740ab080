package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClusterStoreSpec extends SparkSuite {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("clusterstore").toString

  test("write publishes a snapshot; read returns it; sourceId round-trips") {
    import spark.implicits._
    val store = new ClusterStore(spark, tmp(), buckets = 4)
    assert(!store.exists && store.read().count() === 0 &&
      store.sourceId.isEmpty)
    store.write(Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id"),
      sourceId = "corpus@v41")
    assert(store.exists)
    assert(store.read().select($"doc_id", $"cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    assert(store.sourceId === Some("corpus@v41"))
  }

  test("an EMPTY snapshot still commits a referenced dir: sourceId " +
    "stays reachable and nothing is orphaned") {
    import spark.implicits._
    val store = new ClusterStore(spark, tmp(), buckets = 4)
    store.write(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"),
      sourceId = "corpus@empty")
    assert(store.read().count() === 0)
    assert(store.sourceId === Some("corpus@empty"),
      "the empty snapshot's source marker must be reachable")
    assert(store.vacuumOrphans(olderThanMs = -1000L) === Nil,
      "the snapshot dir is referenced, not an orphan")
    // a later real snapshot replaces it cleanly
    store.write(Seq((1L, 1L)).toDF("doc_id", "cluster_id"), "corpus@v2")
    assert(store.read().count() === 1 &&
      store.sourceId === Some("corpus@v2"))
  }

  test("re-cluster swaps atomically: a pinned reader keeps its snapshot, " +
    "a fresh reader sees only the new one — never a mix") {
    import spark.implicits._
    val store = new ClusterStore(spark, tmp(), buckets = 4)
    store.write((1L to 10L).map(i => (i, 100L)).toDF("doc_id", "cluster_id"),
      sourceId = "corpus@v1")
    // pin a reader on the committed snapshot BEFORE the re-cluster
    val pinned = store.read()
    // the re-cluster publishes a disjoint labeling under a new sourceId
    store.write((1L to 10L).map(i => (i, 200L)).toDF("doc_id", "cluster_id"),
      sourceId = "corpus@v2")
    // the pinned reader's lineage still resolves the OLD dirs
    // (recompute-stable — retained for keepVersions manifests)
    val pinnedClusters = pinned.select($"cluster_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(pinnedClusters === Set(100L),
      s"pinned reader observed the re-cluster: $pinnedClusters")
    // a fresh read resolves the new snapshot, wholly: every row carries
    // the new labeling, none the old — the "never a mix" property
    val fresh = store.read().select($"cluster_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(fresh === Set(200L), s"fresh reader saw a mixed table: $fresh")
    assert(store.read().count() === 10)
    assert(store.sourceId === Some("corpus@v2"))
  }

  test("staleness is detectable: sourceId names the clustered source") {
    import spark.implicits._
    val store = new ClusterStore(spark, tmp(), buckets = 2)
    store.write(Seq((1L, 1L)).toDF("doc_id", "cluster_id"),
      sourceId = "sf0.01@snap7")
    // a consumer comparing against the CURRENT source snapshot id can
    // tell the table no longer describes it
    val liveSource = "sf0.01@snap9"
    assert(store.sourceId.exists(_ != liveSource),
      "stale clustering not detectable")
  }

  test("Dedup.clusterTable rides the store: committed snapshot, " +
    "(doc_id, cluster_id) shape preserved for consumers") {
    import spark.implicits._
    val path = tmp()
    val verts = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Dedup.clusterTable(verts, edges, path,
      sourceId = "spec")
    assert(out.columns.toSeq === Seq("doc_id", "cluster_id"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
    val store = new ClusterStore(spark, path)
    assert(store.exists && store.sourceId === Some("spec"))
  }
}
