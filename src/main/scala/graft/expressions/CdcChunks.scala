package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Content-defined chunking (the FastCDC gear-hash scheme, Xia et al.,
  * USENIX ATC 2016): `cdc_chunks(bytes, avgBits)` splits a binary blob
  * at positions where a byte-rolling gear hash hits a zero mask —
  * boundaries determined by CONTENT, not offsets, so inserting or
  * deleting bytes only moves the boundaries near the edit and every
  * later chunk re-aligns (the property fixed-size blocking lacks, and
  * the reason CDC is the basis of binary dedup/delta storage).
  *
  * Output: array of (offset, length, hash) structs — `hash` is a
  * 64-bit FNV-1a of the chunk's bytes, the join key for chunk-level
  * dedup across blobs. Expected chunk size ≈ 2^avgBits bytes, with
  * FastCDC's normalization: no boundary before 2^(avgBits-2) bytes
  * (mask checks simply skip), a harder mask until 2^avgBits, an easier
  * one after, and a hard cut at 4·2^avgBits so pathological content
  * (e.g. all zeros — the gear hash never fires) still chunks.
  *
  * Deterministic everywhere: the 256-entry gear table derives from a
  * fixed splitmix64 sequence at class load, identical on every
  * executor. One allocation-free pass, codegen'd; NULL → NULL, empty
  * → empty array. */
case class CdcChunks(child: Expression, avgBits: Int)
    extends UnaryExpression {
  require(avgBits >= 6 && avgBits <= 24,
    s"avgBits must be in [6,24] (64 B .. 16 MiB average), got $avgBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(CdcChunks.chunkType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.split(input.asInstanceOf[Array[Byte]], avgBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CdcChunks.split($c, $avgBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  val chunkType: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  /** Low 8 bits of each gear entry — all a boundary decision at
    * avgBits ≤ 7 can see (mask ≤ 255, and 2^k ≡ 0 mod 256 for k ≥ 8,
    * so the rolling hash's low byte is an 8-byte sliding window).
    * Exposed for the SQL-oracle restatement of the chunker. */
  def gearLow8: Seq[Int] = Gear.map(g => (g & 0xffL).toInt).toSeq

  /** Deterministic gear table: splitmix64 over indexes 0..255. */
  private val Gear: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var z = (i + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      t(i) = z ^ (z >>> 31)
      i += 1
    }
    t
  }

  private def fnv1a(b: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def split(b: Array[Byte], avgBits: Int): ArrayData = {
    if (b == null) return null
    val n = b.length
    val minSize = 1 << (avgBits - 2)
    val maxSize = 1 << (avgBits + 2)
    // FastCDC normalized masks: harder before the average point (fewer
    // boundaries), easier after (more) — centers the size distribution
    val maskHard = (1L << (avgBits + 1)) - 1
    val maskEasy = (1L << (avgBits - 1)) - 1
    val avg = 1 << avgBits
    val offsets = new java.util.ArrayList[Integer]()
    var start = 0
    while (start < n) {
      var h = 0L
      var i = start
      val limit = math.min(n, start + maxSize)
      val normal = math.min(n, start + avg)
      var cut = -1
      // skip minSize bytes entirely (no boundary can land there)
      var j = i
      val skipTo = math.min(limit, start + minSize)
      while (j < skipTo) { h = (h << 1) + Gear((b(j) & 0xff)); j += 1 }
      i = j
      while (cut < 0 && i < normal) {
        h = (h << 1) + Gear((b(i) & 0xff))
        if ((h & maskHard) == 0) cut = i + 1
        i += 1
      }
      while (cut < 0 && i < limit) {
        h = (h << 1) + Gear((b(i) & 0xff))
        if ((h & maskEasy) == 0) cut = i + 1
        i += 1
      }
      val end = if (cut > 0) cut else limit
      offsets.add(start)
      offsets.add(end)
      start = end
    }
    val out = new Array[Any](offsets.size / 2)
    var k = 0
    while (k < out.length) {
      val s = offsets.get(2 * k).intValue()
      val e = offsets.get(2 * k + 1).intValue()
      out(k) = InternalRow(s.toLong, e - s, fnv1a(b, s, e - s))
      k += 1
    }
    new GenericArrayData(out)
  }
}
