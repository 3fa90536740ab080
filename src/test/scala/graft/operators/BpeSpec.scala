package graft.operators

import graft.SparkSuite

/** BPE trainer against the classic worked example (the low/lower/
  * newest/widest corpus of the original BPE-for-NMT paper), with every
  * merge hand-computed — including the lexicographic tie-breaks that
  * make training deterministic. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // word frequencies: low×5, lower×2, newest×6, widest×3
  private lazy val corpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
    (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("train learns the hand-computed merge sequence with " +
    "deterministic tie-breaks") {
    val model = Bpe.train(corpus, merges = 5)
    // round 1: (e,s) (s,t) (t,</w>) all tie at 9 -> lexicographic (e,s)
    // round 2: (es,t) vs (t,</w>) tie at 9 -> (es,t)
    // round 3: (est,</w>) alone at 9
    // round 4: (l,o) vs (o,w) tie at 7 -> (l,o)
    // round 5: (lo,w) at 7
    assert(model.map(m => (m.left, m.right, m.count)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    // retraining reproduces the identical model
    assert(Bpe.train(corpus, merges = 5) === model)
  }

  test("train releases every round's checkpoint (no block leak)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Bpe.train(corpus, merges = 5)
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "training must not leave cached word tables behind")
  }

  test("train stops early when no pair reaches minCount") {
    val tiny = Seq("ab cd").toDF("text") // every pair count = 1
    assert(Bpe.train(tiny, merges = 10, minCount = 2L) === Seq.empty)
    // with minCount=1 it keeps merging: ties break lexicographically,
    // ab before cd; the </w> merges interleave by pair order
    val m1 = Bpe.train(tiny, merges = 2, minCount = 1L)
    assert(m1.map(m => (m.left, m.right)) === Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode applies merges in training order, map-only") {
    val model = Bpe.train(corpus, merges = 5)
    val out = Bpe.encode(Seq("Newest LOW").toDF("text"), model)
    val tokens = out.select("tokens").as[Seq[String]].collect().head
    // newest -> n e w est</w>; low -> low </w>
    assert(tokens === Seq("n", "e", "w", "est</w>", "low", "</w>"))
    // no Exchange anywhere: encoding is a pure map over the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    // unseen characters survive as singleton symbols
    val odd = Bpe.encode(Seq("zq").toDF("text"), model)
      .select("tokens").as[Seq[String]].collect().head
    assert(odd === Seq("z", "q", "</w>"))
  }

  test("training scan shape: one corpus pass, vocab-sized rounds") {
    // the trained model from a 2-row corpus and from the same text
    // replicated 100x is IDENTICAL (frequencies scale uniformly), and
    // training time is dominated by the word table, not the corpus
    val big = (1 to 100).flatMap(_ => Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("text")
    val small = Bpe.train(corpus, merges = 3)
    val scaled = Bpe.train(big, merges = 3)
    assert(scaled.map(m => (m.left, m.right)) ===
      small.map(m => (m.left, m.right)))
    assert(scaled.map(_.count) === small.map(_.count * 100))
  }

  test("driver-local fast path (r17) learns the identical merges as the " +
    "distributed round loop, including unicode tie-breaks") {
    // astral + BMP symbols in one corpus: the local argmax must break
    // count ties in UTF-8 BINARY order (Spark's string order), where
    // Scala's default String ordering (UTF-16 units) would flip an
    // astral-vs-BMP tie — 😀 (U+1F600) sorts AFTER � in
    // UTF-8 but BEFORE it in UTF-16 units
    val uni = Seq(
      "😀x 😀x �x �x low low lower")
      .toDF("text")
    def distTrain(df: org.apache.spark.sql.DataFrame, m: Int) = {
      spark.conf.set(Bpe.LocalVocabCapKey, "0")
      try Bpe.train(df, merges = m)
      finally spark.conf.unset(Bpe.LocalVocabCapKey)
    }
    assert(Bpe.train(corpus, merges = 5) === distTrain(corpus, 5))
    // 5 merges reaches the round whose argmax is the astral-vs-BMP tie
    val uniLocal = Bpe.train(uni, merges = 5)
    assert(uniLocal === distTrain(uni, 5))
    // the discriminating merge really is in the list: U+FFFD sorts
    // before U+1F600 in UTF-8 bytes (a UTF-16-unit comparison would
    // have merged 😀 first)
    assert(uniLocal.map(_.left).contains("�"))
    // over-cap vocabularies fall back to the distributed loop with the
    // identical result (the loud-WARN path)
    spark.conf.set(Bpe.LocalVocabCapKey, "1")
    try assert(Bpe.train(corpus, merges = 5) === distTrain(corpus, 5))
    finally spark.conf.unset(Bpe.LocalVocabCapKey)
  }

  test("native bpe_encode is value-identical to the nested-aggregate " +
    "fold spelling, including unicode, greedy runs and empty docs") {
    import org.apache.spark.sql.functions._
    val model = Bpe.train(corpus, merges = 5)
    val texts = Seq(
      "low lower lowest newest new widest wide",
      "aaaa aaa aa a", // greedy-run semantics under any (x, x) merge
      "", "   ", "one",
      "unicode café 你好 😀 mixéd marks",
      "LOW LOWER Mixed CASE\twith\nwhitespace")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // the reference: the pre-native SQL spelling (what the DuckDB
    // oracle mirrors), rebuilt from the kept reference helpers
    val folded = model.foldLeft(Bpe.initialSymbolsReference)((acc, m) =>
      Bpe.mergeFoldReference(acc, m.left, m.right))
    val ref = d
      .withColumn("__words",
        expr("filter(split(lower(trim(text)), '\\\\s+'), " +
          "w -> length(w) > 0)"))
      .withColumn("tokens", expr(s"flatten(transform(__words, w -> $folded))"))
      .select($"doc_id", $"tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val got = Bpe.encode(d, model)
      .select($"doc_id", $"tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got === ref)
  }
}
