package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected battery queries —
  * `sbt "runMain graft.tools.Plans [query ...]"` — used to audit
  * pushdown, pruning, join strategy, and codegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "q_time_interval",
        "q_page_limit", "q_cosine_topk", "q_ngram_jaccard")
    names.foreach { n =>
      println(s"\n=== $n ===")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
