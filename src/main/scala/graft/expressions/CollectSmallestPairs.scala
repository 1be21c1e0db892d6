package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded "pairs with the smallest `cap` ids" aggregate — the
  * [[CollectSmallest]] variant for posting lists that carry a payload
  * (the simhash path keeps each member's 64-bit hash next to its id).
  * Keys must be unique within a group (one row per id per bucket, which
  * LSH banding guarantees); buffer is O(cap) regardless of skew.
  * Output: array<struct<rid: bigint, sh: bigint>> ascending by rid
  * (field names match the simhash pipeline's member structs). */
case class CollectSmallestPairs(
    key: Expression,
    payload: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[Long, Long]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rid", LongType), StructField("sh", LongType))),
    containsNull = false)
  override def prettyName: String = "collect_smallest_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"collect_smallest_pairs needs (bigint, bigint), got " +
        s"${key.dataType.catalogString}, ${payload.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeMap[Long, Long] =
    new java.util.TreeMap[Long, Long]()

  // duplicate keys are a no-op (first payload wins) — a duplicate
  // arriving at a full buffer must not evict an unrelated key; the
  // sort+slice fallback path keeps duplicate rows instead (noted at its
  // call site), but under the unique-key contract both behave identically
  private def add(b: java.util.TreeMap[Long, Long], k: Long, v: Long): Unit = {
    if (b.containsKey(k)) ()
    else if (b.size() < cap) b.put(k, v)
    else if (k < b.lastKey()) { b.remove(b.lastKey()); b.put(k, v) }
  }

  override def update(b: java.util.TreeMap[Long, Long],
      input: InternalRow): java.util.TreeMap[Long, Long] = {
    val k = key.eval(input)
    val v = payload.eval(input)
    if (k != null && v != null)
      add(b, k.asInstanceOf[Long], v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeMap[Long, Long],
      other: java.util.TreeMap[Long, Long]): java.util.TreeMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(b, e.getKey, e.getValue) }
    b
  }

  override def eval(b: java.util.TreeMap[Long, Long]): Any = {
    val out = new Array[Any](b.size())
    val it = b.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey, e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeMap[Long, Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.size() * 16)
    buf.putInt(b.size())
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); buf.putLong(e.getKey); buf.putLong(e.getValue)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Long, Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new java.util.TreeMap[Long, Long]()
    var n = buf.getInt
    while (n > 0) { b.put(buf.getLong, buf.getLong); n -= 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): CollectSmallestPairs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CollectSmallestPairs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectSmallestPairs =
    copy(key = newChildren(0), payload = newChildren(1))
}
