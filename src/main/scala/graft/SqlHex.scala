package graft

import org.apache.spark.sql.{Column, functions => F}

/** SQL-side hex encoders shared by the media-fixture queries and the
  * [[pipeline.Multimodal.syntheticBmp]] builder — ONE copy of the
  * zero-padded / byte-swapped column arithmetic that synthesizes binary
  * file formats from `unhex(concat(...))`. All helpers assume the value
  * fits the stated width (lpad would silently truncate wider values). */
private[graft] object SqlHex {

  /** One byte, zero-padded: 10 → "0A". */
  def hx2(v: Column): Column = F.lpad(F.hex(v), 2, "0")

  /** Big-endian 16-bit: 320 → "0140". */
  def be16h(v: Column): Column = F.lpad(F.hex(v), 4, "0")

  /** Big-endian 32-bit: 1 → "00000001". */
  def be32h(v: Column): Column = F.lpad(F.hex(v), 8, "0")

  /** Little-endian 16-bit: 8000 → "401F". */
  def le16h(v: Column): Column = {
    val h = F.lpad(F.hex(v), 4, "0")
    F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))
  }

  /** Little-endian 24-bit: 161 → "A10000". */
  def le24h(v: Column): Column = {
    val h = F.lpad(F.hex(v), 6, "0")
    F.concat(F.substring(h, 5, 2), F.substring(h, 3, 2),
      F.substring(h, 1, 2))
  }

  /** Little-endian 32-bit: 80 → "50000000". */
  def le32h(v: Column): Column = {
    val h = F.lpad(F.hex(v), 8, "0")
    F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2),
      F.substring(h, 3, 2), F.substring(h, 1, 2))
  }
}
