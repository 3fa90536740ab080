package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions.{col, encode, expr, lit}

class FunctionsSpec extends SparkSuite {

  test("blake2b expression matches core implementation, codegen path") {
    import spark.implicits._
    val df = Seq("abc", "hello world\n", "").toDF("s")
      .withColumn("h", functions.blake2b(encode(col("s"), "UTF-8")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("abc") === "cf4ab791c62b8d2b2109c90275287816")
    assert(got("hello world\n") === "c0cdb4699cdaa9eea4c563a934f1d52b")
    assert(got("") === "cae66941d9efbd404e4d88758ea67670")
    // stays inside whole-stage codegen on a codegen source (a local Seq
    // collapses to LocalTableScan and proves nothing)
    val ranged = spark.range(10)
      .withColumn("h", functions.blake2b(encode(col("id").cast("string"), "UTF-8")))
    val plan = ranged.queryExecution.executedPlan.toString
    // the "*(1)" prefix marks a WholeStageCodegen span containing the
    // blake2b projection — no interpreted fallback stage
    assert(plan.contains("*(1) Project") && plan.contains("blake2b"))
    assert(ranged.collect().head.getString(1) ===
      graft.core.Blake2b.hexDigest("0".getBytes))
  }

  test("blake2b null propagates") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
      .withColumn("h", functions.blake2b(encode(col("s"), "UTF-8")))
    assert(df.filter(col("s").isNull).select("h").collect().head.isNullAt(0))
  }

  test("blake2b registered for SQL") {
    functions.register(spark)
    val r = spark.sql(
      "SELECT blake2b(encode('abc', 'UTF-8')) AS h").collect().head
    assert(r.getString(0) === "cf4ab791c62b8d2b2109c90275287816")
  }

  test("vector_dot matches the interpreted HOF spelling bit-for-bit") {
    import spark.implicits._
    // magnitudes spanning 20 orders: any reordering of the summation
    // would change the IEEE result, so bit equality proves the native
    // loop sums left-to-right exactly like aggregate(zip_with(...))
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Array.fill(64)(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10))
      val b = Array.fill(64)(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10))
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", functions.vectorDot(col("a"), col("b")))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
    val collected = df.select("native", "hof").collect()
    collected.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vector_dot coerces float arrays instead of misreading slots") {
    import spark.implicits._
    functions.register(spark)
    val df = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    df.createOrReplaceTempView("fvecs")
    // array<float> inputs must be widened element-wise at analysis —
    // reading 4-byte float slots as doubles would return garbage
    val viaSql = spark.sql("SELECT vector_dot(a, b) FROM fvecs")
      .collect().head.getDouble(0)
    assert(viaSql === 13.0)
    val viaColumn = df.select(
      functions.vectorDot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(viaColumn === 13.0)
    // non-array arguments fail analysis with a clean error, not at runtime
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT vector_dot('x', array(1D))").collect())
  }

  test("vector_dot null propagation and SQL registration") {
    functions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .collect().head
    assert(r.getDouble(0) === 32.0)
    assert(spark.sql("SELECT vector_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1D))")
      .collect().head.isNullAt(0))
  }

  test("vector_dot matches HOF semantics on ragged and null-element inputs") {
    functions.register(spark)
    // the HOF spelling yields NULL for length mismatch (zip_with pads
    // with null) and for any null element — vector_dot must agree, not
    // silently sum a prefix or read a null slot as 0.0
    val cases = Seq(
      "array(1D, 2D, 3D), array(4D, 5D)", // ragged: shorter right
      "array(1D), array(4D, 5D, 6D)", // ragged: shorter left
      "array(1D, CAST(NULL AS DOUBLE), 3D), array(4D, 5D, 6D)", // null elem left
      "array(1D, 2D, 3D), array(4D, NULL, 6D)") // null elem right
    for (args <- cases) {
      val r = spark.sql(
        s"""SELECT vector_dot($args) AS native,
           |  aggregate(zip_with($args, (x, y) -> x * y), 0D,
           |            (acc, x) -> acc + x) AS hof""".stripMargin)
        .collect().head
      assert(r.isNullAt(1), s"HOF oracle not null for ($args)")
      assert(r.isNullAt(0), s"vector_dot not null for ($args)")
    }
    // dense equal-length rows are unaffected
    assert(spark.sql("SELECT vector_dot(array(1D, 2D), array(3D, 4D))")
      .collect().head.getDouble(0) === 11.0)
  }

  test("cosine battery plans use the native dot, not interpreted lambdas") {
    // regression guard: if a cosine path quietly reverts to the
    // aggregate(zip_with(...)) spelling, the interpreted HOF leaves
    // whole-stage codegen and the 100 TB inner loop pays for it
    val s = spark
    for (name <- Seq("q_cosine_topk", "q_cosine_dup_pairs")) {
      val plan = graft.SparkEntry.queries(name)(s, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("vector_dot"), name)
      assert(!plan.contains("aggregate(zip_with"), name)
    }
  }

  test("nfc composes decomposed sequences and singletons, byte-stably") {
    functions.register(spark)
    import spark.implicits._
    val composedCafe = "caf\u00e9"
    val decomposedCafe = "cafe\u0301"
    val rows = Seq(
      ("plain ascii stays put", "plain ascii stays put"),
      (composedCafe, composedCafe),      // already composed: identity
      (decomposedCafe, composedCafe),    // e + combining acute -> U+00E9
      ("\u212b", "\u00c5"),              // Angstrom-sign singleton -> A-ring
      ("A\u030angstro\u0308m", "\u00c5ngstr\u00f6m")) // ring + diaeresis
      .toDF("raw", "want")
    val got = rows.select(functions.nfc($"raw").as("got"), $"want").collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
    // SQL registration surface
    assert(spark.sql(s"SELECT nfc('$decomposedCafe')").collect()
      .head.getString(0) === composedCafe)
    // null propagates
    assert(rows.select(functions.nfc(lit(null).cast("string")))
      .collect().head.isNullAt(0))
    // non-string SQL inputs coerce at analysis (ImplicitCastInputTypes)
    // instead of reaching codegen as the wrong JVM type
    assert(spark.sql("SELECT nfc(42)").collect().head.getString(0) === "42")
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT nfc(array(1, 2))").collect())
  }

  test("TextNorm.nfc returns the input object when already normalized") {
    import org.apache.spark.unsafe.types.UTF8String
    // pure ASCII: byte scan only, same object back
    val ascii = UTF8String.fromString("nothing to do here")
    assert(graft.core.TextNorm.nfc(ascii) eq ascii)
    // non-ASCII but already NFC: quick-check path, same object back
    val composed = UTF8String.fromString("d\u00e9j\u00e0 vu")
    assert(graft.core.TextNorm.nfc(composed) eq composed)
    // genuinely decomposed: normalized copy
    val decomposed = UTF8String.fromString("de\u0301ja\u0300 vu")
    assert(graft.core.TextNorm.nfc(decomposed).toString === "d\u00e9j\u00e0 vu")
  }

  test("normalize_date UDF and translate_path UDF") {
    functions.register(spark)
    assert(spark.sql("SELECT normalize_date('2015-03-20')").collect()
      .head.getLong(0) === 1426809600000L)
    import spark.implicits._
    val t = functions.translatePathUdf(
      ".*job-(?P<job_id>[0-9]+).log$~job{job_id}")
    val out = Seq("/var/log/jobs/job-42.log").toDF("p")
      .select(t(col("p")).as("slug")).collect().head.getString(0)
    assert(out === "job42")
  }

  test("char_bigrams matches the interpreted HOF spelling, incl. " +
    "non-BMP codepoints; null/short/SQL surfaces") {
    functions.register(spark)
    import spark.implicits._
    val rows = Seq(
      "abcd", "ab", "a", "", "caf\u00e9 x",
      "a\ud83d\ude00b", // astral emoji: ONE codepoint, not two chars
      "  spaced  out  ").toDF("t")
    val got = rows.select(
      functions.charBigrams($"t").as("native"),
      expr("transform(sequence(1, greatest(length(t) - 1, 0)), " +
        "i -> substring(t, i, 2))").as("hof"))
      .collect()
    got.foreach { r =>
      val native = r.getSeq[String](0)
      // the HOF guard: sequence(1, 0) would DESCEND [1, 0]; drop the
      // phantom grams it yields for len < 2 inputs
      val hof = if (r.getSeq[String](1).exists(_.length < 2) &&
        native.isEmpty) Nil else r.getSeq[String](1)
      assert(native === hof, s"mismatch for ${r}")
    }
    // codepoint semantics: the emoji pairs with its neighbors whole
    val emoji = rows.filter($"t".contains("\ud83d\ude00"))
      .select(functions.charBigrams($"t")).head.getSeq[String](0)
    assert(emoji === Seq("a\ud83d\ude00", "\ud83d\ude00b"))
    // null propagates; SQL registration works
    assert(rows.limit(1).select(
      functions.charBigrams(lit(null).cast("string"))).head.isNullAt(0))
    assert(spark.sql("SELECT char_bigrams('abc')").head
      .getSeq[String](0) === Seq("ab", "bc"))
  }
}
