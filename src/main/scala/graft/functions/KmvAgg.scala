package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Types.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * TypedImperativeAggregate: keeps the k smallest DISTINCT values of a
  * 60-bit hash column; the evaluated sketch is the sorted `array<bigint>`
  * of those minima (Bar-Yossef et al. 2002, "Counting distinct elements
  * in a data stream").
  *
  * Why a custom aggregate rather than a relational spelling: the exact
  * per-group k-smallest (`row_number() <= k` over distinct values)
  * shuffles EVERY distinct value — the sketch state would be bounded but
  * the exchange not. This aggregate's partial state is ≤ k longs per
  * group per partition, partial-aggregates map-side like sum/max, and
  * merges by keeping the k smallest of a union — so the one shuffle
  * carries ≤ groups × k longs at any corpus size (the [[graft.operators
  * .Hll]] shape, but for a sketch family Spark has no builtin for).
  *
  * Why KMV next to HLL: KMV supports set INTERSECTION estimation.
  * Merged sketches estimate |A ∪ B| like any distinct sketch, but the
  * k-min signature additionally gives Jaccard (fraction of the union's
  * k-min present in both sides) and hence |A ∩ B| — "how many distinct
  * tokens do two sources share" — which register-max HLL structurally
  * cannot answer.
  *
  * Determinism contract: the input is expected to be the shared
  * md5-prefix integer hash ([[graft.operators.Kmv.h60]]) — an exact
  * function of the value in any engine — and the k-min set of a
  * multiset is order-independent, so the sketch is oracle-checkable
  * bit-for-bit (DuckDB: `ORDER BY hash LIMIT k` over distinct hashes).
  * NULL inputs are ignored (the aggregate-function convention).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"kmv_sketch needs k >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(
      buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // cheap reject before mutating: full buffer and v beyond the max
    if (buf.size() < k || v < buf.last()) {
      buf.add(v)
      if (buf.size() > k) buf.pollLast()
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
