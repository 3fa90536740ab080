package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style port of `generate_random_metadata`
  * (client/datalake/tests/conftest.py:48-100): random 2010–2015 intervals
  * ≤ 3 days, random slugs, 50% null work_id — checked against the model
  * invariants rather than fixed examples. */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (the scalatestplus shim is
    * not in the offline dependency cache). */
  def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default, prop)
    assert(result.passed, result.status.toString)
  }

  val day: Long = DatalakeRecord.TimeBucketSizeMs

  val slugGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 10)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_' :+ '-'))
  } yield cs.mkString

  val metaGen: Gen[Metadata] = for {
    start <- Gen.chooseNum(1262304000000L, 1262304000000L + 5L * 365 * day)
    endOff <- Gen.option(Gen.chooseNum(0L, 3 * day))
    what <- slugGen
    where <- slugGen
    workId <- Gen.option(slugGen.suchThat(_ != "null"))
    id <- Gen.listOfN(32, Gen.hexChar).map(_.mkString.toLowerCase)
  } yield Metadata(0, start, endOff.map(start + _), where, what, workId,
    s"/var/log/$what.log", id, "beef")

  test("generated metadata round-trips through json + build validation") {
    check(Prop.forAll(metaGen) { m =>
      val rebuilt = Metadata.fromJson(m.json)
      rebuilt == m
    })
  }

  test("bucket expansion covers exactly the days the interval touches") {
    check(Prop.forAll(metaGen) { m =>
      val buckets = DatalakeRecord.timeBucketsOf(m)
      val end = m.end.getOrElse(m.start)
      buckets.head == m.start / day &&
        buckets.last == end / day &&
        buckets == (buckets.head to buckets.last) &&
        buckets.size <= DatalakeRecord.MaximumBucketSpan
    })
  }

  test("records share metadata and keys are consistent") {
    check(Prop.forAll(metaGen) { m =>
      val rs = DatalakeRecord.listFromMetadata(m, "file:///x", 1L, 2L)
      rs.forall(r => r.metadata == m &&
        r.timeIndexKey == s"${r.timeBucket}:${m.what}" &&
        r.rangeKey == s"${m.where}:${m.id}" &&
        r.whatWhereKey == s"${m.what}:${m.where}" &&
        (m.workId match {
          case Some(w) => r.workIdIndexKey == s"$w:${m.what}"
          case None => r.workIdIndexKey == s"null${m.id}:${m.what}"
        }))
    })
  }

  test("normalize_date is idempotent on its own ms output") {
    check(Prop.forAll(Gen.chooseNum(100000000001L, 4102444800000L)) { ms =>
      Metadata.normalizeDate(ms) == ms &&
        Metadata.normalizeDate(Metadata.toIso8601(ms)) == ms
    })
  }

  test("seconds inputs below the 1e11 threshold scale to ms") {
    check(Prop.forAll(Gen.chooseNum(0L, 99999999999L)) { s =>
      Metadata.normalizeDate(s) == s * 1000
    })
  }

  test("cursor serialization round-trips for arbitrary ids") {
    val cursorGen = for {
      bucket <- Gen.option(Gen.chooseNum(0L, 100000L))
      key <- Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty))
      lastId <- Gen.option(Gen.identifier)
      if bucket.isDefined || key.isDefined
    } yield Cursor(bucket, key, lastId)
    check(Prop.forAll(cursorGen) { c =>
      Cursor.fromSerialized(c.serialized) == c
    })
  }
}
