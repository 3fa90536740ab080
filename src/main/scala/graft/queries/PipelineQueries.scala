package graft.queries

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rows-only queries (no SQL oracle — the hashing/decoding primitives are
  * not expressible in DuckDB) wiring the pipeline operators into the
  * driver battery. Each plants duplicates where the synthetic corpus has
  * none so candidate generation provably fires.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Corpus with planted exact duplicates (10% of docs re-appear under
    * shifted ids) for near-dup candidate generation. */
  private def planted(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 64-bit SimHash per document (deduplication: SimHash)
    "q_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir))
        .select(col("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))),

    // banded-Hamming SimHash candidates over the planted corpus
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(planted(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),

    // MinHash-LSH candidate pairs over the planted corpus
    "q_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashCandidates(planted(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),

    // IVF-style ANN top-k (label cells, nprobe=2)
    "q_ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), queryIds = Seq(0L, 1L, 2L, 3L, 4L))),

    // random-hyperplane LSH bucket histogram
    "q_hyperplane_lsh" -> ((s, dir) =>
      Similarity.hyperplaneLsh(emb(s, dir))
        .groupBy(col("lsh_bucket"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy(col("lsh_bucket"))),

    // multimodal decode(stub) + feature-extract pipeline
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.pipeline(docs(s, dir))),

    // int8 quantization stats: per-vector quantized representation
    "q_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(emb(s, dir))
        .select(col("vec_id"), col("label"), col("vmin"), col("vmax"),
          expr("aggregate(qvec, 0, (acc, q) -> acc + q)").as("qsum"))
        .orderBy(col("vec_id"))),

    // frame sampling over the synthesized video/audio assets
    "q_frame_sample" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(docs(s, dir)),
        batchPartitions = s.sparkContext.defaultParallelism)
      Multimodal.sampleFrames(feats)
        .orderBy(col("asset_id"), col("frame_idx"))
    }))

  /** All rows-only: hashing (xxhash64) and the stub decoder have no DuckDB
    * equivalent; the driver records the weaker rows>0 check. */
  val oracleSql: Map[String, String] = Map.empty
}
