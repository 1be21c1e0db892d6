package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lossy UTF-8 decode: binary → string with every malformed or
  * unmappable byte sequence replaced by U+FFFD, the way browsers and
  * crawl pipelines decode untrusted bytes. Unlike `decode(b, 'UTF-8')`
  * this NEVER throws — Spark's `decode` raises
  * MALFORMED_CHARACTER_CODING under ANSI mode (the Spark 4 default),
  * which would fail a whole crawl job on one mojibake page instead of
  * letting the downstream replacement-character gate score it out.
  * Deterministic: the replacement policy is the JDK charset decoder's
  * REPLACE action, identical across JVMs (Unicode TR36 best practice,
  * one U+FFFD per maximal ill-formed subsequence). NULL in → NULL out;
  * valid UTF-8 round-trips byte-identically. */
case class Utf8Lossy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_lossy needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "utf8_lossy"

  override def nullSafeEval(input: Any): Any =
    Utf8Lossy.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Utf8Lossy.decode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Utf8Lossy =
    copy(child = newChild)
}

object Utf8Lossy {

  /** Decoded string, U+FFFD for ill-formed subsequences; null for null.
    * Fast path: well-formed input (the overwhelmingly common case)
    * wraps the bytes zero-copy via UTF8String; only invalid input pays
    * the CharsetDecoder transcode. */
  def decode(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    if (wellFormed(b)) return UTF8String.fromBytes(b)
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    UTF8String.fromString(dec.decode(ByteBuffer.wrap(b)).toString)
  }

  /** Strict UTF-8 well-formedness check (RFC 3629 table: no overlongs,
    * no surrogates, max U+10FFFF) — one branchy pass, no allocation. */
  private def wellFormed(b: Array[Byte]): Boolean = {
    val n = b.length
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80 // no overlong
        val hi = if (c == 0xed) 0x9f else 0xbf // no surrogates
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80 // no overlong
        val hi = if (c == 0xf4) 0x8f else 0xbf // max U+10FFFF
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false // 0xf5-0xff never valid
    }
    true
  }
}
