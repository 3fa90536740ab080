package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE home for the localCheckpoint block-release idiom — Bpe's
  * training loop and Dedup's pair generator both need it, and a private
  * copy per file is how release paths silently diverge. */
private[graft] object Checkpoints {

  /** Release the block-manager copy behind a localCheckpointed frame
    * (its analyzed plan is a LogicalRDD over the persisted RDD);
    * no-op for any other plan shape. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
}
