package graft.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch aggregate (Cormode & Muthukrishnan 2005): a
  * `depth × width` matrix of counters summarizing the frequency of
  * every string that flowed through the aggregate, in O(depth·width)
  * space regardless of cardinality. Row `d`'s counter for a token is
  * bucket
  * {{{ conv(substr(md5(tok || '#' || d), 1, 15), 16, 10) % width }}}
  * — the engine's standard md5 recipe (the top 60 bits of md5 as a
  * non-negative long; see [[HashedTf]]), seeded per row by suffixing
  * the row index, so a SQL oracle regenerates every counter exactly.
  *
  * The point estimate `min_d matrix[d][bucket_d(tok)]` NEVER
  * under-counts (each counter only ever adds), and over-counts by more
  * than `2n/width` with probability at most `2^-depth` — so a
  * threshold scan over estimates has no false negatives, the property
  * the exact heavy-hitter pass in `Sketches.heavyHitters` builds on.
  *
  * Merge is element-wise addition — commutative and associative, so the
  * sketch is bit-identical under any partitioning and any merge order
  * (the determinism bar every engine aggregate here meets). Output:
  * row-major `array<long>` of `depth·width` counters. Null inputs
  * contribute nothing; an empty relation yields the zero matrix. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    /** true (default): the md5 recipe above — one SQL oracle can
      * regenerate every counter. false: xxhash64 over the same
      * `tok || '#' || d` seeding (bit-identical to
      * `xxhash64(concat(tok, '#', d))` in Spark SQL) — ~an order of
      * magnitude cheaper per row for 100 TB production scans; the
      * prefilter's no-false-negative exactness is hash-agnostic. */
    md5Buckets: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 22),
    s"width must be in [2, 2^22], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_agg needs string, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        b(d * width + CmsAgg.bucket(tok, d, width, md5Buckets)) += 1L
        d += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { buf.putLong(b(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < b.length) { b(i) = buf.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}

object CmsAgg {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Row-`d` bucket of one token: top 60 bits of `md5(tok || '#' || d)`
    * as a non-negative long, mod width — bit-identical to
    * `conv(substr(md5(concat(tok, '#', d)), 1, 15), 16, 10) % width`. */
  def bucket(tok: UTF8String, d: Int, width: Int,
      md5Buckets: Boolean = true): Int = {
    if (!md5Buckets) {
      // xxhash64(concat(tok, '#', d)) with Spark's default seed, then a
      // non-negative mod — matches the column-side probe bit-for-bit
      val suffix = ("#" + d).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bytes = new Array[Byte](tok.numBytes + suffix.length)
      tok.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
      System.arraycopy(suffix, 0, bytes, tok.numBytes, suffix.length)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      return (((h % width) + width) % width).toInt
    }
    val dig = md5.get()
    dig.reset()
    dig.update(tok.getBytes)
    dig.update('#'.toByte)
    val ds = Integer.toString(d)
    var k = 0
    while (k < ds.length) { dig.update(ds.charAt(k).toByte); k += 1 }
    val h = dig.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v = (v << 4) | ((h(7) >> 4) & 0xfL)
    (v % width).toInt
  }
}
