package graft.operators

import graft.SparkSuite

/** Differential test: [[SpanDedup]] vs an independent brute-force
  * reference (naive per-doc gram maps, interval merging by linear scan)
  * over seeded random corpora from a tiny vocabulary — small vocab makes
  * cross-doc gram collisions dense, exercising merge/boundary paths a
  * hand-built corpus can't enumerate. */
class SpanDedupFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val W = 4

  /** The reference: exact per-position dup marks → merged spans. */
  private def refSpans(docs: Seq[(Long, String)])
      : Map[Long, Seq[(Long, Long)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }.toMap
    val gramOwners = scala.collection.mutable.Map
      .empty[Seq[String], scala.collection.mutable.Set[Long]]
    toks.foreach { case (id, ts) =>
      if (ts.length >= W)
        ts.sliding(W).foreach(g =>
          gramOwners.getOrElseUpdate(g, scala.collection.mutable.Set()) += id)
    }
    toks.map { case (id, ts) =>
      val hits =
        if (ts.length < W) Seq.empty
        else ts.sliding(W).zipWithIndex.collect {
          case (g, p) if gramOwners(g).exists(_ != id) => p
        }.toSeq
      // merge overlapping-or-touching [p, p+W) windows
      val spans = scala.collection.mutable.Buffer.empty[(Long, Long)]
      hits.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s, _) = spans.last
          spans(spans.length - 1) = (s, p + W)
        } else spans += ((p.toLong, (p + W).toLong))
      }
      id -> spans.toSeq
    }.filter(_._2.nonEmpty)
  }

  test("dupSpans matches the brute-force reference on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 8) {
      val docs = (1L to 20L).map { id =>
        val n = 1 + rnd.nextInt(15)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = SpanDedup.dupSpans(docs.toDF("doc_id", "text"), W)
        .orderBy("doc_id", "span_start")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val want = refSpans(docs)
      assert(got === want, s"trial $trial: $got vs $want")
      // structural invariants on the Spark output
      got.foreach { case (id, spans) =>
        val sorted = spans.sortBy(_._1)
        sorted.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) =>
            assert(s2 > e1, s"doc $id: spans overlap/touch: $sorted")
          case _ =>
        }
        val nToks = docs.find(_._1 == id).get._2.split("\\s+").length
        assert(sorted.forall { case (s, e) =>
          s >= 0 && e <= nToks && e - s >= W
        }, s"doc $id: span out of bounds: $sorted")
      }
    }
  }

  test("exciseTokens matches the reference cover set on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("x", "y", "z")
    for (_ <- 1 to 5) {
      val docs = (1L to 12L).map { id =>
        val n = 1 + rnd.nextInt(12)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val spans = refSpans(docs)
      val kept = SpanDedup.exciseTokens(docs.toDF("doc_id", "text"), W)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      docs.foreach { case (id, t) =>
        val n = t.split("\\s+").length
        val covered = spans.getOrElse(id, Seq.empty)
          .flatMap { case (s, e) => s until e }.map(_.toInt).toSet
        val expect = (0 until n).toSet -- covered
        assert(kept.getOrElse(id, Set.empty) === expect, s"doc $id")
      }
    }
  }
}
