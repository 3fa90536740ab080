package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The verify kernel of the prefix-filtered Jaccard join: for ASC-sorted
  * distinct arrays, `sorted_intersect_size(a, b)` must equal
  * `size(array_intersect(a, b))` — on randomized inputs (codegen path),
  * under the interpreted eval path, and at the edges (empty arrays,
  * null inputs, no overlap, full overlap). */
class SortedIntersectSpec extends SparkSuite {

  import graft.functions.{functions => gf}

  test("matches size(array_intersect) on randomized sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 60).map(i => s"t$i")
    val rows = (1 to 500).map { i =>
      def arr() = rnd.shuffle(vocab).take(rnd.nextInt(20)).distinct.sorted
      (i, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("got", gf.sortedIntersectSize($"a", $"b"))
      .withColumn("want", size(array_intersect($"a", $"b")))
    val bad = df.filter($"got" =!= $"want").count()
    assert(bad === 0L)
    // and the empty-overlap / identical cases actually occurred or are
    // covered explicitly below (take(0) yields empty arrays above)
  }

  test("edges: empty, disjoint, identical, subset") {
    import spark.implicits._
    val rows = Seq(
      (1, Seq.empty[String], Seq("a", "b"), 0),
      (2, Seq("a", "b"), Seq.empty[String], 0),
      (3, Seq("a", "b"), Seq("c", "d"), 0),
      (4, Seq("a", "b", "c"), Seq("a", "b", "c"), 3),
      (5, Seq("a", "c"), Seq("a", "b", "c", "d"), 2))
    val got = rows.toDF("id", "a", "b", "want")
      .withColumn("got", gf.sortedIntersectSize($"a", $"b"))
      .filter($"got" =!= $"want").count()
    assert(got === 0L)
  }

  test("null ELEMENTS are skipped (join-count semantics), wherever the " +
    "sort placed them") {
    // sort_array asc puts nulls FIRST, array_sort puts them LAST — the
    // merge must tolerate both and never count null = null as a match
    // (the join-on-token semantics this kernel replaces; array_intersect
    // would count it)
    import spark.implicits._
    val rows = Seq(
      // nulls first (the sort_array placement)
      (1, Seq(null, "a", "b"), Seq(null, "b", "c"), 1),
      // nulls last (the array_sort placement)
      (2, Seq("a", "b", null), Seq("b", "c", null), 1),
      // all-null vs real
      (3, Seq[String](null, null), Seq("a", "b"), 0))
    val got = rows.toDF("id", "a", "b", "want")
      .withColumn("got", gf.sortedIntersectSize($"a", $"b"))
      .filter($"got" =!= $"want").count()
    assert(got === 0L)
  }

  test("null inputs yield null (null-intolerant binary contract)") {
    import spark.implicits._
    val df = Seq((1, Some(Seq("a")), Option.empty[Seq[String]]),
      (2, Option.empty[Seq[String]], Some(Seq("a"))))
      .toDF("id", "a", "b")
      .withColumn("got", gf.sortedIntersectSize($"a", $"b"))
    assert(df.filter($"got".isNotNull).count() === 0L)
  }

  test("interpreted eval path agrees with the codegen result") {
    // drive nullSafeEval directly (the path a codegen fallback or a
    // filter's partial evaluation would take)
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*): ArrayData =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    val e = SortedIntersectSizeExpr(null, null)
    val m = classOf[SortedIntersectSizeExpr]
      .getDeclaredMethod("nullSafeEval", classOf[Object], classOf[Object])
    m.setAccessible(true)
    def ev(a: ArrayData, b: ArrayData): Int =
      m.invoke(e, a, b).asInstanceOf[Int]
    assert(ev(arr("a", "b", "c"), arr("b", "c", "d")) === 2)
    assert(ev(arr(), arr("a")) === 0)
    assert(ev(arr("x"), arr("x")) === 1)
  }
}
