package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators that go beyond the oracle-checkable
  * set in [[graft.queries.TextQueries]]: 64-bit SimHash with banded
  * Hamming candidate generation, and MinHash-LSH candidate pairs.
  *
  * Both are pure builtin-function plans (no UDFs): SimHash folds per-token
  * xxhash64 bit votes with higher-order array functions entirely map-side;
  * LSH banding turns the all-pairs problem into equi-joins on band keys.
  * At 100 TB: one scan + one shuffle per band join, with candidate volume
  * controlled by band width — the standard scalable shape.
  */
object Dedup {

  /** 64-bit SimHash per document over whitespace tokens.
    *
    * bit j of the hash = majority vote over tokens of bit j of
    * xxhash64(token). The per-doc fold is
    * `aggregate(tokens → bit-vectors, zeros, zip_with(+))` — a single
    * codegen'd projection, no explode, no shuffle.
    */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("__tokens", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("__votes", expr(
        """aggregate(
          |  transform(__tokens, t -> transform(sequence(0, 63),
          |    j -> CASE WHEN shiftright(xxhash64(t), j) % 2 != 0
          |              THEN 1 ELSE -1 END)),
          |  transform(sequence(0, 63), j -> 0),
          |  (acc, x) -> zip_with(acc, x, (a, b) -> a + b))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(
          |  transform(sequence(0, 63),
          |    j -> CASE WHEN __votes[j] > 0 THEN shiftleft(1L, j) ELSE 0L END),
          |  0L, (acc, x) -> acc | x)""".stripMargin))
      .drop("__tokens", "__votes")

  /** SimHash near-dup candidate pairs: band the 64-bit hash into 4×16-bit
    * keys (a pair within Hamming distance 3 must agree on ≥1 band), join
    * per band, then verify with exact `bit_count(xor)`. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val hashed = simhash(docs, textCol)
      .select(col(idCol).as("doc_id"), col("simhash"))
    val banded = hashed.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
          |  b -> struct(b AS band,
          |       shiftright(simhash, CAST(b * 16 AS INT)) % 65536 AS key))"""
          .stripMargin)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.toDF("doc_a", "sim_a", "band", "key")
    val b = banded.toDF("doc_b", "sim_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sim_a ^ sim_b) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** MinHash-LSH candidate pairs on top of the md5 minhash signatures
    * (same family as `TextQueries.q_minhash_sig`): docs sharing either
    * 4-hash band are candidates; `min_band_matches` of the 8 component
    * hashes gives a cheap similarity estimate for ranking. */
  def minhashCandidates(
      docs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4): DataFrame = {
    val withShingles = docs
      .withColumn("__w", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("__shingles", expr(
        "transform(sequence(0, greatest(size(__w) - 3, 0)), " +
          "i -> concat_ws(' ', __w[i], __w[i+1], __w[i+2]))"))
    val hashCols = (0 until numHashes).map { k =>
      expr(s"array_min(transform(__shingles, s -> md5(concat(s, '#$k'))))")
        .as(s"h$k")
    }
    val sigs = withShingles.select((col("doc_id") +: hashCols): _*)
    val nBands = numHashes / rowsPerBand
    val bandCol = (0 until nBands).map { bnd =>
      val parts = (0 until rowsPerBand).map(r => s"h${bnd * rowsPerBand + r}")
      expr(s"struct($bnd AS band, md5(concat(${parts.mkString(", ")})) AS key)")
    }
    val banded = sigs
      .select((col("doc_id") +: (0 until numHashes).map(k => col(s"h$k"))): _*)
      .withColumn("bk", explode(array(bandCol: _*)))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"),
        array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
    val a = banded.toDF("doc_a", "band", "key", "sig_a")
    val b = banded.toDF("doc_b", "band", "key", "sig_b")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
          .as("matching_hashes"))
      .distinct()
  }
}
