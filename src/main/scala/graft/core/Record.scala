package graft.core

/** One storage/index row, one per (file × day-bucket spanned).
  *
  * Shape from `client/datalake/common/record.py:51-65` and
  * `README.md:209-218` of the reference. The composite DynamoDB keys
  * (`time_index_key`, `work_id_index_key`, `range_key`) become plain columns
  * + partition layout in the Spark store, but the derivations are kept for
  * API/compat surfaces.
  */
final case class DatalakeRecord(
    version: Int,
    url: String,
    timeBucket: Long,
    what: String,
    where: String,
    workId: Option[String],
    createTime: Long,
    size: Long,
    metadata: Metadata) {

  /** `"<bucket>:<what>"` — record.py:58 */
  def timeIndexKey: String = s"$timeBucket:$what"

  /** `"<where>:<id>"` — record.py:194-195 */
  def rangeKey: String = s"$where:${metadata.id}"

  /** `"<work_id|'null'+id>:<what>"` — record.py:197-199; the random-suffixed
    * null sentinel avoids hot index keys for null work_ids. */
  def workIdIndexKey: String =
    s"${workId.getOrElse("null" + metadata.id)}:$what"

  /** `"<what>:<where>"` for the latest table — storage.py:104 */
  def whatWhereKey: String = s"$what:$where"
}

object DatalakeRecord {

  val Version = 0

  /** 1-day time buckets — record.py:151-160 */
  val TimeBucketSizeMs: Long = 24L * 60 * 60 * 1000

  /** Spans beyond this raise UnsupportedTimeRange — record.py:162-169 */
  val MaximumBucketSpan: Int = 30

  def bucketOf(ms: Long): Long = Math.floorDiv(ms, TimeBucketSizeMs)

  /** Buckets spanned by [start, end] inclusive — record.py:184-192. */
  def timeBuckets(start: Long, end: Long): Seq[Long] =
    bucketOf(start) to bucketOf(end)

  /** Buckets for a metadata doc; null end ⇒ just the start's bucket; spans
    * over MaximumBucketSpan rejected — record.py:171-182. */
  def timeBucketsOf(m: Metadata): Seq[Long] = {
    val buckets = timeBuckets(m.start, m.end.getOrElse(m.start))
    if (buckets.size > MaximumBucketSpan)
      throw new UnsupportedTimeRange(
        s"metadata spans too many time buckets: ${m.json}")
    buckets
  }

  /** Expand one metadata doc into its per-bucket index records
    * (record.py:67-93 `list_from_metadata`). */
  def listFromMetadata(
      m: Metadata,
      url: String,
      createTime: Long,
      size: Long): Seq[DatalakeRecord] =
    timeBucketsOf(m).map { b =>
      DatalakeRecord(Version, url, b, m.what, m.where, m.workId,
        createTime, size, m)
    }
}
