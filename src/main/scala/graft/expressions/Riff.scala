package graft.expressions

/** ONE copy of the RIFF chunk walk shared by every RIFF-family parser
  * ([[AudioHeaderMeta]]/[[Samples]] for WAV, [[VideoHeaderMeta]]/
  * [[VideoFeatures]] for AVI). The walk offset is a Long so a crafted
  * 32-bit chunk size advances past `to` and ends the loop — it can
  * never overflow Int into a negative array index; poison rows degrade
  * to NULL in the callers, they don't throw. */
private[graft] object Riff {

  /** Visit each chunk in b[from, to): `visit(chunkOffset, bodySize)`
    * gets the offset of the 4-byte tag (body starts at offset + 8) and
    * the declared body size; return false to stop early. Chunks are
    * word-aligned. `minHeader` is the bytes the caller needs readable
    * at the offset (8 for tag+size, 12 to also peek a LIST type). */
  def eachChunk(b: Array[Byte], from: Int, to: Long,
      minHeader: Int = 8)(visit: (Int, Long) => Boolean): Unit = {
    val end = math.min(to, b.length.toLong)
    var iL = from.toLong
    var go = true
    while (go && iL + minHeader <= end) {
      val i = iL.toInt
      val size = le32(b, i + 4)
      go = visit(i, size)
      iL += 8 + size + (size & 1)
    }
  }

  def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xffL) << 24)) & 0xffffffffL

  def tag(b: Array[Byte], i: Int, t: String): Boolean =
    (b(i) & 0xff) == t.charAt(0) && (b(i + 1) & 0xff) == t.charAt(1) &&
      (b(i + 2) & 0xff) == t.charAt(2) && (b(i + 3) & 0xff) == t.charAt(3)
}
