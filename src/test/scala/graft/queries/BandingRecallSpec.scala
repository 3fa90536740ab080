package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The q_banding_recall measurement's own invariants (the oracle checks
  * VALUES; these pin the PROPERTIES a reader acts on):
  *   - exact TEXT duplicates (identical normalized word sequence ⇒
  *     identical shingle set ⇒ identical minhash signature) are ALWAYS
  *     candidates, so recall@10 below 1.0 means the banding or the
  *     truth side broke, not "tuning". NOTE the ADVICE r13 subtlety:
  *     decile 10 means equal word SETS — a permutation or multiplicity
  *     change has J=1 on sets but different 3-word shingles, and its
  *     bands need NOT collide. The structural guarantee therefore only
  *     covers exact text dups, and the first test verifies the planted
  *     corpus's decile-10 pairs are all of that kind — if the corpus
  *     ever gains a permutation pair, THAT assert fails with the right
  *     message instead of the recall one;
  *   - found never exceeds truth per decile (it is a LEFT join from
  *     truth);
  *   - deciles stay in the J >= 0.25 support: 2..10. */
class BandingRecallSpec extends SparkSuite {

  private val Dir = "/root/testdata/sf0.001"

  /** The planted %5 sample's exact J=1 (decile 10) truth pairs, each
    * tagged with whether the two docs have IDENTICAL normalized word
    * sequences (the precondition for the collide-always guarantee). */
  private def decile10PairsAreTextDups(): Boolean = {
    import spark.implicits._
    val d = spark.read.parquet(s"$Dir/documents.parquet")
    val pl = d.unionByName(
      d.filter($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + 1000000000L))
      .filter($"doc_id" % 5 === 0)
    val truth = graft.operators.Dedup.jaccardSelfJoin(
      graft.queries.TextQueries.jaccardBase(pl),
      "doc_id", "words", Seq("lang", "size_bucket"), 1, 4)
      .filter(expr("(inter_size * 10) div union_size") === 10)
    val seqs = pl.select($"doc_id",
      split(lower(trim($"text")), "[ \\t\\n\\x0B\\f\\r]+").as("__seq"))
    truth
      .join(seqs.toDF("doc_a", "seq_a"), "doc_a")
      .join(seqs.toDF("doc_b", "seq_b"), "doc_b")
      .filter($"seq_a" =!= $"seq_b")
      .isEmpty
  }

  test("recall@J=1.0 is exactly 1; found <= true; deciles in 2..10") {
    graft.functions.functions.register(spark)
    // precondition for the recall@10 invariant: every decile-10 truth
    // pair is an exact TEXT duplicate (see class doc / ADVICE r13)
    assert(decile10PairsAreTextDups(),
      "planted corpus gained a set-equal-but-not-text-equal (permutation/" +
        "multiplicity) J=1 pair — the recall@10=1.0 invariant no longer " +
        "follows structurally; re-derive the truth side from text identity")
    val rows = graft.SparkEntry.queries("q_banding_recall")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byDecile = rows.map(r => r._1 -> (r._2, r._3)).toMap
    // the planted corpus guarantees exact-dup pairs in the % 5 sample
    assert(byDecile.contains(10L), s"no J=1 decile in ${rows.toSeq}")
    val (true10, found10) = byDecile(10L)
    assert(found10 === true10,
      s"banding missed ${true10 - found10} exact-duplicate pairs")
    rows.foreach { case (d, t, f) =>
      assert(f <= t, s"decile $d: found $f > true $t")
      assert(d >= 2 && d <= 10, s"decile $d outside the J>=0.25 support")
      assert(t >= 1)
    }
  }
}
