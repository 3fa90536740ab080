package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r18): leg-level timing for q_ngram_jaccard's verify
  * join — where does the dominant job's time go? */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.select(col("doc_id"), col("lang"),
      expr("n_chars div 100").cast("int").as("size_bucket"),
      array_distinct(split(lower(trim(col("text"))),
        "[ \\t\\n\\x0B\\f\\r]+")).as("words"))
    val blockCols = Seq("lang", "size_bucket")
    val num = 1; val den = 4

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // leg 1: pin words
      var words: DataFrame = null
      time("pin words") {
        words = graft.operators.Checkpoints.pin(base
          .select((col("doc_id") +: blockCols.map(col) :+ col("words")): _*)
          .withColumn("__n", size(col("words")))
          .withColumn("__plen",
            expr(s"__n - ((__n * $num + ${den - 1}) div $den) + 1")))
      }
      // leg 2: dfreq pin + count + collect
      val exploded = words.select(
        (col("doc_id") +: blockCols.map(col) :+
          col("__n") :+ col("__plen") :+
          explode(col("words")).as("__w")): _*)
      var dfreq: DataFrame = null
      var rows: Array[org.apache.spark.sql.Row] = null
      time("pin dfreq + count + collect") {
        dfreq = graft.operators.Checkpoints.pin(
          exploded.groupBy(col("__w")).agg(count(lit(1)).as("__df")))
        println("  vocab=" + dfreq.count())
        rows = dfreq.collect()
      }
      val sorted = rows.iterator.filter(!_.isNullAt(0))
        .map(r => (org.apache.spark.unsafe.types.UTF8String
          .fromString(r.getString(0)), r.getLong(1)))
        .toArray.sortBy(_._1)
      val pre = graft.functions.functions.dfPrefix(
        col("words"), num, den, sorted.map(_._1), sorted.map(_._2))
      val prefix = words
        .select((col("doc_id") +: blockCols.map(col) :+ col("__n") :+
          posexplode(pre)): _*)
        .select((col("doc_id") +: blockCols.map(col) :+ col("__n") :+
          (col("pos") + 1).as("__rank") :+ col("col").as("__w")): _*)
      // leg 3: raw join pre-distinct volume
      val a = prefix.toDF(("doc_a" +: blockCols :+ "n_a" :+ "r_a" :+ "__w"): _*)
      val b = prefix.toDF(("doc_b" +: blockCols :+ "n_b" :+ "r_b" :+ "__w"): _*)
      val joined = a.join(b, blockCols :+ "__w")
        .filter(col("doc_a") < col("doc_b"))
        .filter(least(col("n_a"), col("n_b")) * den >=
          greatest(col("n_a"), col("n_b")) * num)
        .filter((lit(1) + least(col("n_a") - col("r_a"),
          col("n_b") - col("r_b"))) * (num + den) >=
          (col("n_a") + col("n_b")) * num)
        .select(col("doc_a"), col("doc_b"))
      time("prefix join pre-distinct cnt") { println("  raw=" + joined.count()) }
      val cands = joined.distinct()
      time("prefix join + distinct noop") { noop(cands) }
      // leg 4: verify joins + intersect
      val sets = words.select(col("doc_id"), col("__n"),
        sort_array(col("words")).as("__ws"))
      val full = cands
        .join(sets.toDF("doc_a", "n_a", "w_a"), "doc_a")
        .join(sets.toDF("doc_b", "n_b", "w_b"), "doc_b")
        .withColumn("inter_size",
          graft.functions.functions.sortedIntersectSize(
            col("w_a"), col("w_b")))
        .filter(col("inter_size") * den >=
          (col("n_a") + col("n_b") - col("inter_size")) * num)
        .select(col("doc_a"), col("doc_b"), col("inter_size"),
          (col("n_a") + col("n_b") - col("inter_size")).as("union_size"))
      time("cands+verify noop") { noop(full) }
      var pinned: DataFrame = null
      time("cands+verify PIN") {
        pinned = graft.operators.Checkpoints.pin(full)
      }
      time("post-pin sort noop") {
        noop(pinned.repartitionByRange(4 * spark.sparkContext.defaultParallelism,
          col("doc_a"), col("doc_b"))
          .sortWithinPartitions(col("doc_a"), col("doc_b")))
      }
      clear()
    }
    spark.stop()
  }
}
