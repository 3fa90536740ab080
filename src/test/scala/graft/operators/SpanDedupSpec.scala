package graft.operators

import graft.SparkSuite

class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private val W = 8

  // shared runs (each token unique to its run so no accidental grams)
  private val S = (1 to 8).map(i => s"s$i").mkString(" ")   // 8 tokens
  private val U = (1 to 8).map(i => s"u$i").mkString(" ")   // 8 tokens
  private val R = (1 to 10).map(i => s"r$i").mkString(" ")  // 10 tokens

  private def corpus = Seq(
    (1L, s"a1 a2 $S a3 a4"),               // S at [2,10)
    (2L, s"b1 $S b2 b3 b4"),               // S at [1,9)
    (3L, s"$S $S"),                        // within-doc repeat of S — but S
                                           // is also in docs 1/2 → flagged;
                                           // covers the whole doc
    (4L, "short doc only"),                // < 8 tokens: no grams
    (5L, s"$S e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 $U"), // S [0,8), U [19,27)
    (6L, s"f1 $S f2 f3 $U"),               // S [1,9), U [11,19)
    (7L, s"g1 $R g2"),                     // R hits 1,2,3 → merged [1,11)
    (8L, s"$R h1 h2 h3"),                  // R hits 0,1,2 → merged [0,10)
    (9L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8") // within-doc
                                           // repeat ONLY → never flagged
  ).toDF("doc_id", "text")

  private def spans = SpanDedup.dupSpans(corpus, W)
    .orderBy("doc_id", "span_start")
    .as[(Long, Long, Long, Long)].collect().toList

  test("cross-doc shared runs produce exact span boundaries") {
    val byDoc = spans.groupBy(_._1)
    assert(byDoc(1L) == List((1L, 2L, 10L, 8L)))
    assert(byDoc(2L) == List((2L, 1L, 9L, 8L)))
  }

  test("multiple disjoint shared runs yield separate spans") {
    val byDoc = spans.groupBy(_._1)
    assert(byDoc(5L) == List((5L, 0L, 8L, 8L), (5L, 19L, 27L, 8L)))
    assert(byDoc(6L) == List((6L, 1L, 9L, 8L), (6L, 11L, 19L, 8L)))
  }

  test("overlapping hit windows merge into one maximal span") {
    val byDoc = spans.groupBy(_._1)
    assert(byDoc(7L) == List((7L, 1L, 11L, 10L)))
    assert(byDoc(8L) == List((8L, 0L, 10L, 10L)))
  }

  test("within-doc-only repetition is not flagged; short docs are safe") {
    val ids = spans.map(_._1).toSet
    assert(!ids.contains(9L), "doc 9 repeats only within itself")
    assert(!ids.contains(4L), "doc 4 is shorter than w")
  }

  test("a doc that is duplicated text end-to-end is fully covered") {
    val byDoc = spans.groupBy(_._1)
    // doc 3 = S S (16 tokens): every window matches doc 1/2's S-grams at
    // offsets 0 and 8, and the S-S boundary grams match doc 3's own
    // second copy — but cross-doc flagging comes from docs 1/2, so only
    // offsets 0 and 8 hit; they touch (0+8 == 8) and merge to [0,16)
    assert(byDoc(3L) == List((3L, 0L, 16L, 16L)))
  }

  test("exciseTokens removes exactly the covered positions") {
    val kept = SpanDedup.exciseTokens(corpus, W)
      .as[(Long, Int, String)].collect().toList
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(kept(1L) == List("a1", "a2", "a3", "a4"))
    assert(kept(2L) == List("b1", "b2", "b3", "b4"))
    assert(!kept.contains(3L), "doc 3 is fully excised")
    assert(kept(4L) == List("short", "doc", "only"), "short docs untouched")
    assert(kept(9L).size == 16, "unflagged doc keeps everything")
  }

  test("exciseText rebuilds the scrubbed string in token order") {
    val out = SpanDedup.exciseText(corpus, W)
      .as[(Long, Long, String)].collect().toList
      .map { case (id, n, t) => id -> ((n, t)) }.toMap
    assert(out(1L) == ((4L, "a1 a2 a3 a4")))
    assert(out(6L) == ((3L, "f1 f2 f3")))
    assert(!out.contains(3L))
  }
}
