package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The q_banding_recall measurement's own invariants (the oracle checks
  * VALUES; these pin the PROPERTIES a reader acts on):
  *   - exact TEXT duplicates (identical normalized word sequence ⇒
  *     identical shingle set ⇒ identical minhash signature) are ALWAYS
  *     candidates — pinned CORPUS-INDEPENDENTLY by the structural test,
  *     whose truth side is computed from text identity itself (r15,
  *     closing ADVICE r14 #1), for every band configuration of the
  *     curve. NOTE the ADVICE r13 subtlety the published decile-10
  *     recall additionally leans on: the QUERY's decile 10 means equal
  *     word SETS — a permutation or multiplicity change has J=1 on sets
  *     but different 3-word shingles, and its bands need NOT collide —
  *     so recall@10 = 1.0 in the artifact also needs the corpus
  *     precondition that all its decile-10 pairs are text dups, which
  *     decile10PairsAreTextDups() verifies; if the corpus ever gains a
  *     permutation pair, THAT assert fails with the right message
  *     instead of the recall one;
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

  test("STRUCTURAL (corpus-independent): every text-identical pair is " +
    "a banding candidate, under every band configuration of the curve " +
    "(ADVICE r14 #1 closed at the root)") {
    import spark.implicits._
    // text-dup truth derived from TEXT IDENTITY itself — the same
    // normalization minhashBands applies — so this invariant cannot be
    // corpus-lucky: identical normalized word sequences force identical
    // shingle sets, identical signatures, and collision in EVERY band
    val d = spark.read.parquet(s"$Dir/documents.parquet")
    val pl = d.unionByName(
      d.filter($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + 1000000000L))
      .filter($"doc_id" % 5 === 0)
    val seqs = pl.select($"doc_id",
      md5(concat_ws("\u0001", // separator a word can never contain
        split(lower(trim($"text")), "[ \\t\\n\\x0B\\f\\r]+"))).as("__h"))
    val textDups = seqs.toDF("doc_a", "h_a")
      .join(seqs.toDF("doc_b", "h_b"),
        $"h_a" === $"h_b" && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b")
    assert(textDups.count() > 0, "planted corpus must contain text dups")
    for (rowsPerBand <- Seq(4, 2, 1)) {
      val cands = graft.operators.Dedup.minhashCandidates(pl, 8, rowsPerBand)
        .select($"doc_a", $"doc_b")
      val missed = textDups.join(cands, Seq("doc_a", "doc_b"), "left_anti")
      assert(missed.isEmpty,
        s"rowsPerBand=$rowsPerBand: banding missed a text-identical pair")
    }
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
