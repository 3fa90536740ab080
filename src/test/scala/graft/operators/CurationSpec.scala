package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {

  test("repetitionStats counts total/duplicated/top n-grams per doc") {
    import spark.implicits._
    // "a b a b a b" → 3-grams: [a b a, b a b, a b a, b a b] → every gram
    // duplicated, top count 2; "w x y z" → 2 distinct grams, none dup
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "w x y z"),
      (3L, "one two"), // < 3 words: no row
      (4L, "  padded   spacing   here  ")).toDF("doc_id", "text")
    val got = Curation.repetitionStats(docs).orderBy($"doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    val r1 = got(0)
    assert(r1.getLong(1) === 4L && r1.getLong(2) === 4L && r1.getLong(3) === 2L)
    val r2 = got(1)
    assert(r2.getLong(1) === 2L && r2.getLong(2) === 0L && r2.getLong(3) === 1L)
    // whitespace runs collapse before gram formation
    val r4 = got(2)
    assert(r4.getLong(1) === 1L)
  }

  test("stratifiedSample is deterministic, stratum-rated, and map-only") {
    import spark.implicits._
    val df = (0L until 2000L).map(i =>
      (i, if (i % 4 == 0) "en" else "de")).toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 10), defaultPct = 50)
    val counts = kept.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 en at 10% and 1500 de at 50%: binomial means 50 and 750
    assert(counts("en") > 20 && counts("en") < 100)
    assert(counts("de") > 600 && counts("de") < 900)
    // exact determinism: same input, same kept set
    val again = Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 10), defaultPct = 50)
    assert(kept.select("id").collect().toSeq ===
      again.select("id").collect().toSeq)
    // rate 0 drops the stratum entirely; rate 100 keeps it whole
    val extremes = Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 0), defaultPct = 100)
    assert(extremes.filter($"lang" === "en").count() === 0)
    assert(extremes.filter($"lang" === "de").count() === 1500)
    // map-only: no Exchange in the physical plan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("packBins matches the global token-stream cut at any rangeSize") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // ragged token counts incl. docs larger than the bin capacity
    val docs = (0L until 300L).map(i =>
      (i, (1 + rng.nextInt(120)).toLong)).toDF("doc_id", "n_tokens")
    val rows = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // brute-force definition: cumulative tokens before each doc
    val expected = rows.scanLeft((0L, 0L, 0L)) {
      case ((_, _, acc), (id, n)) => (id, acc, acc + n)
    }.drop(1).map { case (id, before, _) =>
      id -> ((before, before / 64, before % 64))
    }.toMap
    // identical result whatever the bucket granularity — including a
    // rangeSize of 1 (every doc its own bucket) and one huge bucket
    for (rangeSize <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Curation.packBins(docs, "n_tokens", "doc_id",
        capacity = 64L, rangeSize = rangeSize).collect()
      assert(got.length === 300)
      got.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert((r.getAs[Long]("tokens_before"), r.getAs[Long]("bin"),
          r.getAs[Long]("bin_offset")) === expected(id),
          s"doc $id at rangeSize $rangeSize")
      }
    }
    // the big input's prefix-sum window partitions by bucket — the only
    // unpartitioned window runs over the tiny per-bucket totals
    val plan = Curation.packBins(docs, "n_tokens", "doc_id", 64L, 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bucket"), plan.take(2000))
  }

  test("chunk: window geometry, overlap, short docs, and determinism") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),                        // shorter than one chunk
      (2L, (1 to 113).map(i => s"t$i").mkString(" ")), // 3 windows
      (3L, "   "),                              // whitespace-only: none
      (4L, (1 to 112).map(i => s"t$i").mkString(" "))) // exact cover
      .toDF("doc_id", "text")
    val out = Curation.chunk(docs, chunkTokens = 64, overlapTokens = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getSeq[String](3), r.getInt(4)))
      .sortBy(t => (t._1, t._2))
    // doc 1: one short chunk
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3, t._5)).toSeq ===
      Seq((0, 0, 5)))
    // doc 2 (113 tokens, stride 48): starts 0/48/96, sizes 64/64/17;
    // overlap region repeats across consecutive chunks
    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(t => (t._2, t._3, t._5)).toSeq ===
      Seq((0, 0, 64), (1, 48, 64), (2, 96, 17)))
    assert(d2(0)._4.takeRight(16) === d2(1)._4.take(16))
    // doc 3: filtered out entirely
    assert(!out.exists(_._1 == 3L))
    // doc 4 (112 tokens): second window ends exactly at n — no tail
    assert(out.filter(_._1 == 4L).map(t => (t._2, t._5)).toSeq ===
      Seq((0, 64), (1, 64)))
    // chunks reassemble the token stream (dedup the overlaps)
    val reassembled = d2.flatMap(t => t._4.drop(if (t._2 == 0) 0 else 16))
    assert(reassembled.toSeq === (1 to 113).map(i => s"t$i"))
    // map-only: no Exchange in the plan
    val plan = Curation.chunk(docs, 64, 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk must not shuffle:\n$plan")
  }

  test("redact scrubs emails, IPs, and phones into typed tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail alice.smith+x@corp.example.org and bob@b.co today"),
      (2L, "server 10.22.0.117 talked to 192.168.1.1 at dawn"),
      (3L, "call +1 (555) 010-9934 or 555 010 1234 now"),
      (4L, "nothing sensitive here"),
      (5L, "mixed: c@d.io at 8.8.8.8, dial +44 20 7946 0958"),
      // a 9-digit run inside the email local part looks like a phone,
      // but the email replacement consumes it first: counts must match
      // the tokens actually emitted, so n_phones stays 0
      (6L, "reach 123456789@acme.example now"))
      .toDF("doc_id", "text")
    val got = Curation.redact(docs).orderBy($"doc_id").collect()
      .map(r => (r.getAs[String]("redacted"), r.getAs[Int]("n_emails"),
        r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones")))
    assert(got(0) === (("mail <EMAIL> and <EMAIL> today", 2, 0, 0)))
    assert(got(1) === (("server <IP> talked to <IP> at dawn", 0, 2, 0)))
    assert(got(2) === (("call <PHONE> or <PHONE> now", 0, 0, 2)))
    assert(got(3) === (("nothing sensitive here", 0, 0, 0)))
    assert(got(4) === (("mixed: <EMAIL> at <IP>, dial <PHONE>", 1, 1, 1)))
    assert(got(5) === (("reach <EMAIL> now", 1, 0, 0)))
    // map-only: no Exchange in the plan
    val plan = Curation.redact(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("contaminationStats flags docs overlapping the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // full overlap
      (2L, "a completely different sentence with no overlap here at all"),
      (3L, "she said the quick brown fox jumps right past us"), // partial
      (4L, "too short"))                                     // no 5-grams
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val got = Curation.contaminationStats(corpus, evalSet, n = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) === ((1L, 5L, 5L))) // every gram leaks
    assert(got(1)._3 === 0L)          // clean doc
    assert(got(2)._3 === 1L)          // "the quick brown fox jumps"
    assert(got(3) === ((4L, 0L, 0L))) // gramless doc still reported
  }

  test("Bloom filter: no false negatives, low false-positive rate, " +
    "codegen probe (no UDF)") {
    import spark.implicits._
    val members = (0 until 2000).map(i => s"member-key-$i").toDF("k")
    val bloom = Bloom.build(members, "k")
    // every member passes (the no-false-negative guarantee)
    assert(members.filter(bloom.mightContain($"k")).count() === 2000L)
    // non-members mostly fail: 10 bits/key + 3 hashes ⇒ ~1% theoretical
    val outsiders = (0 until 5000).map(i => s"outside-key-$i").toDF("k")
    val fp = outsiders.filter(bloom.mightContain($"k")).count()
    assert(fp < 250L, s"false-positive count too high: $fp / 5000")
    assert(bloom.loadFactor > 0.1 && bloom.loadFactor < 0.5,
      s"load factor off: ${bloom.loadFactor}")
    // the probe is expressions over a literal array — no UDF anywhere
    val plan = outsiders.filter(bloom.mightContain($"k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), plan.take(500))
    // empty key set → always-false filter
    val empty = Bloom.build(members.limit(0), "k")
    assert(members.filter(empty.mightContain($"k")).count() === 0L)
  }

  test("contaminationStatsBloom matches the exact path row-for-row " +
    "and prunes the confirm join's input") {
    import spark.implicits._
    val corpus = (0L until 300L).map { i =>
      val text =
        if (i % 7 == 3) "short doc" // gramless at n = 5: zero row, both paths
        else if (i % 13 == 0) s"shared eval phrase number ${i % 3} tail tail"
        else s"unique corpus document $i with plenty of ordinary words $i"
      (i, text)
    }.toDF("doc_id", "text")
    val evalSet = corpus.filter($"doc_id" % 13 === 0)
    val exact = Curation.contaminationStats(corpus, evalSet, n = 5)
      .orderBy($"doc_id").collect().toSeq
    val bloomed = Curation.contaminationStatsBloom(corpus, evalSet, n = 5)
      .orderBy($"doc_id").collect().toSeq
    assert(bloomed === exact)
    // the r18 single-pass shape still reports EVERY doc, including the
    // gramless ones (explode_outer NULL-gram rows, not a restore join)
    assert(exact.size === 300)
    assert(exact.count(r => r.getLong(1) == 0L && r.getLong(2) == 0L) ===
      (0L until 300L).count(_ % 7 == 3))
    // the prefilter itself: non-member grams are (almost all) rejected
    // before the confirm join — measure directly on the same grams
    val evalGrams = Curation.contaminationStats(evalSet, evalSet, n = 5)
    assert(evalGrams.count() > 0) // sanity: eval side produces grams
  }

  test("repetition flag thresholds against a hand-built corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // all grams identical → flagged
      (2L, "the quick brown fox jumps over the lazy dog")) // no dup grams
      .toDF("doc_id", "text")
    val got = Curation.repetitionStats(docs)
      .withColumn("flagged",
        when($"dup_grams" * 5 > $"n_grams", 1).otherwise(0))
      .orderBy($"doc_id").collect()
    assert(got(0).getInt(4) === 1)
    assert(got(1).getInt(4) === 0)
  }

  test("lineDedup removes over-threshold lines, keeps blanks and order") {
    import spark.implicits._
    // "boiler" appears 3× (> max 2) → removed everywhere; "rare" 2× →
    // kept; blank lines never count and never vanish; doc 4 is all
    // boilerplate → empty text_clean but still a row
    val docs = Seq(
      (1L, "boiler\nkeep one\n\nrare"),
      (2L, "boiler\nrare\nkeep two"),
      (3L, "keep three\nboiler"),
      (4L, "boiler")).toDF("doc_id", "text")
    val got = Curation.lineDedup(docs, maxOccurrences = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(got(0) === ((1L, "keep one\n\nrare", 4, 3L, 1L)))
    assert(got(1) === ((2L, "rare\nkeep two", 3, 2L, 1L)))
    assert(got(2) === ((3L, "keep three", 2, 1L, 1L)))
    assert(got(3) === ((4L, "", 1, 0L, 1L)))
  }

  test("lineDedup: trailing empty lines are preserved lines") {
    import spark.implicits._
    // Spark's default split drops trailing empties — the operator must
    // not (DuckDB's string_split keeps them, and so does a text file)
    val docs = Seq((1L, "a\nb\n")).toDF("doc_id", "text")
    val got = Curation.lineDedup(docs, maxOccurrences = 5).collect()(0)
    assert(got.getInt(2) === 3)          // "a", "b", ""
    assert(got.getString(1) === "a\nb\n")
  }

  test("stripMarkup strips blocks, tags, entities; counts original tags") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html><body onload=\"x()\"><h1>Title</h1>" +
        "<script>\nif (a<2) { run(); }\n</script>pre <b>bold</b> post" +
        "<!-- multi\nline comment --></body></html>"),
      (2L, "R&amp;D says 2 &lt; 3 &amp;&amp; &#39;quoted&#39;" +
        "&nbsp;&amp;lt;literal&amp;gt;"),
      (3L, "no markup at all")).toDF("doc_id", "text")
    val got = Curation.stripMarkup(docs).orderBy($"doc_id").collect()
      .map(r => (r.getString(3), r.getInt(2))) // (stripped, n_tags)
    // raw '<' inside the script body must not derail the block removal
    assert(got(0)._1 === "Title pre bold post")
    // double-escaped entities decode ONE level: &amp;lt; → &lt;
    assert(got(1)._1 === "R&D says 2 < 3 && 'quoted' &lt;literal&gt;")
    assert(got(1)._2 === 0)
    assert(got(2)._1 === "no markup at all")
  }

  test("lmCoverage learns a deterministic vocab and scores coverage") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),   // grams: "a b", "b c"
      (2L, "a b d"),   // grams: "a b", "b d"
      (3L, "zz"))      // no bigrams: still a row, all zeros
      .toDF("doc_id", "text")
    // vocabSize 1: "a b" (count 2) wins over "b c"/"b d" (count 1)
    val got = Curation.lmCoverage(docs, n = 2, vocabSize = 1)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) === ((1L, 2L, 1L, 50L)))
    assert(got(1) === ((2L, 2L, 1L, 50L)))
    assert(got(2) === ((3L, 0L, 0L, 0L)))
    // boundary ties break by gram ASC: with vocabSize 2, "b c" < "b d"
    // lexicographically so doc 1 gains coverage and doc 2 does not
    val got2 = Curation.lmCoverage(docs, n = 2, vocabSize = 2)
      .orderBy($"doc_id").collect().map(r => r.getLong(3))
    assert(got2.toSeq === Seq(100L, 50L, 0L))
  }

  test("tokenBudget: greedy per-source fill, rangeSize-invariant") {
    import spark.implicits._
    // source A tokens in id order: 3, 4, 5 → cum_before 0, 3, 7
    // budget 8: all kept (7 < 8, overshoot bounded by one doc)
    // budget 7: third doc cut; source B independent
    val docs = Seq(
      (1L, "A", 3L), (2L, "A", 4L), (3L, "A", 5L),
      (4L, "B", 6L), (5L, "B", 6L)).toDF("doc_id", "source", "n_tokens")
    def kept(budget: Long, rangeSize: Long = 4096L): Seq[Long] =
      Curation.tokenBudget(docs, budget, "n_tokens", rangeSize = rangeSize)
        .filter($"kept" === 1L).orderBy($"doc_id")
        .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(kept(8L) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(kept(7L) === Seq(1L, 2L, 4L, 5L))
    assert(kept(6L) === Seq(1L, 2L, 4L)) // B: cum_before 0, 6 → cut 2nd
    // the two-level prefix sum must agree with the global definition at
    // every bucket granularity, including one-doc buckets
    for (rs <- Seq(1L, 2L, 1000L)) assert(kept(7L, rs) === Seq(1L, 2L, 4L, 5L))
    // tokens_before matches the direct per-source cumsum
    val tb = Curation.tokenBudget(docs, 7L, "n_tokens", rangeSize = 2L)
      .orderBy($"doc_id").collect().map(_.getAs[Long]("tokens_before")).toSeq
    assert(tb === Seq(0L, 3L, 7L, 0L, 6L))
    // a NULL source is a legitimate group (missing provenance), not
    // silently dropped rows — the join keys are null-safe
    val withNull = Seq(
      (1L, Some("A"), 3L), (2L, None, 4L), (3L, None, 5L))
      .toDF("doc_id", "source", "n_tokens")
    val nulls = Curation.tokenBudget(withNull, 5L, "n_tokens")
      .orderBy($"doc_id").collect()
    assert(nulls.length === 3)
    assert(nulls.map(_.getAs[Long]("tokens_before")).toSeq === Seq(0L, 0L, 4L))
    assert(nulls.map(_.getAs[Long]("kept")).toSeq === Seq(1L, 1L, 1L))
  }

  test("charLmScore: hand-computed bigram model, gibberish scores low") {
    import spark.implicits._
    // corpus "abab" + "ab": model over normalized text = {ab:3, ba:1}
    // total 4 → p(ab)=750000, p(ba)=250000
    val docs = Seq((1L, "abab"), (2L, "ab"), (3L, "x")).toDF("doc_id", "text")
    val got = Curation.charLmScore(docs).orderBy($"doc_id").collect()
    // doc 3 has < 2 chars → no bigrams → no row
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val d1 = got(0) // bigrams ab, ba, ab → sum 1750000, avg 583333
    assert(d1.getLong(1) === 3L)
    assert(d1.getLong(2) === 1750000L)
    assert(d1.getLong(3) === 583333L)
    val d2 = got(1) // one bigram ab
    assert(d2.getLong(1) === 1L && d2.getLong(2) === 750000L)
    // normalization: case folds and whitespace runs collapse to one
    // space, so "A  B" and "a b" share all bigrams
    val norm = Curation.charLmScore(
      Seq((1L, "A  \t B"), (2L, "a b")).toDF("doc_id", "text"))
      .orderBy($"doc_id").collect()
    assert(norm(0).getLong(2) === norm(1).getLong(2))
    // a doc whose transitions are rare corpus-wide scores below prose
    // sharing the dominant distribution
    val mixed = (1L to 9L).map(i => (i, "the quick brown fox jumps")) :+
      (10L, "zq xv qj vx jz wq")
    val scored = Curation.charLmScore(mixed.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored(10L) < scored(1L))
  }

  test("stripMarkup and lineDedup are collision-guarded") {
    import spark.implicits._
    val bad1 = Seq((1L, "x", "y")).toDF("doc_id", "text", "stripped")
    intercept[IllegalArgumentException](Curation.stripMarkup(bad1))
    val bad2 = Seq((1L, "x", "y")).toDF("doc_id", "text", "text_clean")
    intercept[IllegalArgumentException](Curation.lineDedup(bad2))
  }

  test("evalContaminationReport: per-eval-sample overlap and distinct " +
    "corpus carriers; clean and gramless samples keep zero rows") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),        // carries eval-101's grams
      (2L, "a b c d x y"),        // carries one of them
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val eval = Seq(
      (101L, "a b c d e"),        // grams: [a b c d], [b c d e]
      (102L, "m n o p q"),        // grams unseen in corpus
      (103L, "tiny")).toDF("doc_id", "text") // < n tokens: gramless
    val got = Curation.evalContaminationReport(corpus, eval, n = 4)
      .orderBy($"eval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // 101: 2 grams, both in corpus doc 1 + [a b c d] also in doc 2
    assert(got(0) === ((101L, 2L, 2L, 2L)))
    assert(got(1) === ((102L, 2L, 0L, 0L)), "clean sample: zero overlap")
    assert(got(2) === ((103L, 0L, 0L, 0L)), "gramless sample keeps a row")
  }

  test("splitAssign: stable, exhaustive, ratio-accurate; growth never " +
    "moves an existing row") {
    import spark.implicits._
    val base = (0L until 4000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 900000, "val" -> 50000, "test" -> 50000)
    val got = Curation.splitAssign(base, "doc_id", splits)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 4000, "every row is assigned")
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 3600.0) / 3600.0 < 0.1, counts)
    assert(counts("val") > 100 && counts("val") < 300, counts)
    assert(counts("test") > 100 && counts("test") < 300, counts)
    // growth stability: doubling the corpus leaves old assignments put
    val grown = (0L until 8000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val got2 = Curation.splitAssign(grown, "doc_id", splits)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, s) => assert(got2(id) === s) }
    // non-exhaustive fractions spill into the LAST split, never drop
    val spill = Curation.splitAssign(base, "doc_id",
      Seq("a" -> 100000, "b" -> 100000))
      .groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spill("a") + spill("b") === 4000L)
    assert(spill("b") > spill("a"), "the tail lands in the last split")
    intercept[IllegalArgumentException](
      Curation.splitAssign(base, "doc_id", Seq("x" -> 1000001)))
    intercept[IllegalArgumentException](
      Curation.splitAssign(base.withColumn("split", lit("z")),
        "doc_id", splits))
  }

  test("langId: separable languages classify correctly; equal evidence " +
    "ties break to the smallest language") {
    import spark.implicits._
    val sep = Seq(
      (1L, "xaxa xaxa xaxa", "aa"), (2L, "xaxa xaxa", "aa"),
      (3L, "ybyb ybyb ybyb", "bb"), (4L, "ybyb ybyb", "bb"))
      .toDF("doc_id", "text", "lang")
    val got = Curation.langId(sep)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(4)))
    assert(got.toSeq === Seq((1L, "aa", 1), (2L, "aa", 1),
      (3L, "bb", 1), (4L, "bb", 1)))
    // identical text in two languages → every model cell equal → tie →
    // lexicographically smallest language wins for BOTH docs
    val tied = Seq(
      (1L, "mm nn", "aa"), (2L, "mm nn", "bb"))
      .toDF("doc_id", "text", "lang")
    val t = Curation.langId(tied).orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(4)))
    assert(t.toSeq === Seq((1L, "aa", 1), (2L, "aa", 0)))
    // deterministic under partitioning
    val again = Curation.langId(sep.repartition(5)).orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(4)))
    assert(again.toSeq === got.toSeq)
  }

  test("langId bounds its driver-side model collect: a wide-charset " +
    "corpus past maxModelRows fails loud with the shortlist hint " +
    "instead of OOMing the driver") {
    import spark.implicits._
    // 40 distinct bigrams across 2 langs — far past a cap of 8
    val wide = Seq(
      (1L, ('a' to 't').mkString(" "), "aa"),
      (2L, ('A' to 'T').mkString(" "), "bb"))
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      Curation.langId(wide, maxModelRows = 8)
    }
    assert(e.getMessage.contains("shortlist"), e.getMessage)
    // at the default cap the same corpus trains and scores normally,
    // and an explicit generous cap is bit-identical to the default
    val want = Curation.langId(wide).orderBy($"doc_id")
      .collect().map(_.toString).toSeq
    val roomy = Curation.langId(wide, maxModelRows = 100000)
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(roomy === want)
  }

  test("temperatureRates: alpha=1 is uniform document sampling; " +
    "alpha<1 flattens toward rare strata; cap at 1e6") {
    import spark.implicits._
    val df = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    // alpha = 1: w = n, so keep_ppm = budget/N for every stratum
    val flat = Curation.temperatureRates(df, "source", alpha = 1.0,
      budget = 200L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(flat("big") === flat("small"))
    assert(flat("big") === 200L * 1000000L / 1000L)
    // alpha = 0.5: the rare stratum keeps a HIGHER fraction
    val temp = Curation.temperatureRates(df, "source", alpha = 0.5,
      budget = 200L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(temp("small") > temp("big"))
    // per-stratum doc budget: small gets 3x its proportional share
    // (w ∝ sqrt(n): sqrt(100)/(sqrt(900)+sqrt(100)) = 1/4 of 200 = 50
    // docs over 100 docs = 50% vs proportional 20/100 = 20%)
    assert(temp("small") === 500000L)
    // a tiny stratum under a big budget caps at 1e6 (keep everything)
    val capped = Curation.temperatureRates(df, "source", alpha = 0.5,
      budget = 100000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(capped("small") === 1000000L)
  }

  test("temperatureMix: deterministic keep set, realized counts track " +
    "rates, partitioning-invariant") {
    import spark.implicits._
    val df = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val kept = Curation.temperatureMix(df, "source", "doc_id",
      alpha = 0.5, budget = 200L)
    val ids = kept.select($"doc_id").collect().map(_.getLong(0)).sorted
    val again = Curation.temperatureMix(df.repartition(13), "source",
      "doc_id", alpha = 0.5, budget = 200L)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === again.toSeq, "keep set is a pure function of ids")
    val bySource = kept.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ~150 big (16.67% of 900) and ~50 small (50% of 100);
    // md5-uniform sampling at these sizes stays well within ±40%
    assert(math.abs(bySource("big") - 150.0) / 150.0 < 0.4, bySource)
    assert(math.abs(bySource("small") - 50.0) / 50.0 < 0.4, bySource)
  }

  // ---- composed Gopher quality gate --------------------------------

  test("qualityGate: each rule fires on its degenerate, clean prose " +
    "keeps, and curationReport books every drop once") {
    import spark.implicits._
    val clean = "the results have been consistent with the plan and " +
      "that is to be expected of a careful analysis with data"
    val rows = Seq(
      (1L, "a", clean),
      (2L, "a", "too short"),                                // too_few_words
      (3L, "a", ("w " * 600).trim),                          // too_many_words (+word_length)
      (4L, "a", ("xy " * 40).trim),                          // word_length (mean 2) — also stopwords
      (5L, "b", "the data of " + ("q# " * 20).trim),         // symbol_ratio
      (6L, "b", "• the data point of interest\n" * 8),       // bullet_lines
      (7L, "b", "the data of note goes on and on and on and ends...\n" * 10), // ellipsis_lines
      (8L, "b", "the of 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"), // alpha_words
      (9L, "b", "zxq qvw mkl pro wfg " * 3),                 // stopwords
      (10L, "b", ("the data of note " * 20).trim),          // repetition
      (11L, "b", "the results of the work have been fine with " +
        "everyone involved so far" + (" \uFFFD\uFFFD" * 5)))   // encoding
      .toDF("doc_id", "source", "text")
    val g = Curation.qualityGate(rows, minWords = 3L, maxWords = 500L)
      .select($"doc_id", $"keep", $"reasons").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(g(1L) === ((1, "")), s"clean doc must keep, got ${g(1L)}")
    val expect = Map(2L -> "too_few_words", 3L -> "too_many_words",
      4L -> "word_length", 5L -> "symbol_ratio", 6L -> "bullet_lines",
      7L -> "ellipsis_lines", 8L -> "alpha_words", 9L -> "stopwords",
      10L -> "repetition", 11L -> "encoding")
    for ((id, reason) <- expect) {
      assert(g(id)._1 === 0, s"doc $id must drop")
      assert(g(id)._2.split(",").contains(reason),
        s"doc $id reasons '${g(id)._2}' must include $reason")
    }
    val rep = Curation.curationReport(
      Curation.qualityGate(rows, minWords = 3L, maxWords = 500L), "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rep("a") === ((4L, 1L)), "source a: 4 docs, 1 kept")
    assert(rep("b") === ((7L, 0L)), "source b: 7 docs, 0 kept")
  }

  test("scriptMix: counts per block, first-max-wins dominant, " +
    "all-zero rows fall to other") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain english text with words"),
      (2L, "данные и проверка данных ок"),
      (3L, "数据处理 データ"),
      (4L, "short بيانات كثيرة جدا هنا الآن"),
      (5L, "αβγ abc"),          // tie 3-3 -> latin (earlier in order)
      (6L, "12345"),
      (7L, "!!! ???"))          // no script -> other
      .toDF("doc_id", "text")
    val got = Curation.scriptMix(rows)
      .select($"doc_id", $"n_latin", $"n_cyrillic", $"n_cjk",
        $"n_arabic", $"n_greek", $"n_digit", $"dominant")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)), r.getString(7))).toMap
    assert(got(1L)._2 === "latin")
    assert(got(2L)._2 === "cyrillic" && got(2L)._1._2 > 0)
    assert(got(3L)._2 === "cjk" && got(3L)._1._3 === 7L,
      s"4 han + 3 katakana codepoints, got ${got(3L)}")
    assert(got(4L)._2 === "arabic")
    assert(got(5L)._1._1 === 3L && got(5L)._1._5 === 3L &&
      got(5L)._2 === "latin", "tie must break to the earlier script")
    assert(got(6L)._2 === "digit" && got(6L)._1._6 === 5L)
    assert(got(7L)._2 === "other")
  }
}
