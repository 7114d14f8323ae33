package graft.udf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codec for the spec's OTHER blessed event-id scheme: time-ordered
  * UUIDv6 (reference `README.md:156-157`; IETF draft-peabody §4.3).
  * Layout (hex string form, 36 chars):
  *
  * {{{  tttttttt-tttt-6ttt-cccc-nnnnnnnnnnnn  }}}
  *
  * where `t…` is the 60-bit timestamp in 100 ns ticks since the Gregorian
  * epoch (1582-10-15) split 32/16/12 with the version nibble `6` ahead of
  * the low 12 bits, `cccc` is the variant-tagged 14-bit clock sequence
  * (`10` variant ⇒ `0x8000 | seq`), and `n…` the 48-bit node.
  *
  * The point of the scheme (and what [[graft.ops.IdOps]] audits): the
  * timestamp occupies the MOST-SIGNIFICANT hex digits in fixed width, so
  * lexicographic order of the id string ≡ numeric order of the stamped
  * time — a UUIDv6 feed cursor supports plain string comparison, exactly
  * like the zero-padded sequence scheme ([[SeqId]]). The spec's caveat —
  * multiple writers with skewed clocks break TRUE-time ordering — is
  * surfaced by the operator's reorder-window audit.
  *
  * All math is exact 64-bit integer (µs → 100 ns is ×10), so encode and
  * decode hash-match the DuckDB oracle bit for bit.
  */
object Uuid6 {

  /** 1582-10-15 → 1970-01-01 in microseconds. */
  val GregorianOffsetUs = 12219292800000000L

  private def hexw(c: Column, w: Int): Column = lpad(lower(hex(c)), w, "0")

  /** Native (codegen'd) encode from epoch-µs + 14-bit clock sequence +
    * 12-hex-char node string. */
  def encode(tsUs: Column, clockSeq: Column, node: Column): Column = {
    val greg = (tsUs + lit(GregorianOffsetUs)) * lit(10L) // 100 ns ticks
    concat_ws("-",
      hexw(shiftright(greg, 28), 8),
      hexw(shiftright(greg, 12).bitwiseAND(lit(0xFFFFL)), 4),
      concat(lit("6"), hexw(greg.bitwiseAND(lit(0xFFFL)), 3)),
      hexw(lit(0x8000L).bitwiseOR(clockSeq.cast("long").bitwiseAND(lit(0x3FFFL))), 4),
      node)
  }

  /** Native decode of the 60-bit timestamp as 100 ns Gregorian ticks —
    * THE timestamp field of the UUID, exact integer. (Column-level `/`
    * on longs is double division in Spark, so µs conversion is left to
    * callers comparing against `(tsUs + GregorianOffsetUs) * 10`.) */
  def decodeTicks(id: Column): Column = {
    val th = conv(substring(id, 1, 8), 16, 10).cast("long")
    val tm = conv(substring(id, 10, 4), 16, 10).cast("long")
    val tl = conv(substring(id, 16, 3), 16, 10).cast("long") // skips the '6' nibble
    shiftleft(th, 28) + shiftleft(tm, 12) + tl
  }

  /** Plain-Scala encode for driver-side fixtures (TestFeedServer ids). */
  def encodeStr(tsUs: Long, clockSeq: Int, node: String): String = {
    val greg = (tsUs + GregorianOffsetUs) * 10L
    f"${greg >>> 28}%08x-${(greg >>> 12) & 0xFFFF}%04x-6${greg & 0xFFF}%03x-${0x8000 | (clockSeq & 0x3FFF)}%04x-$node%s"
  }

  /** Plain-Scala decode mirroring [[decodeTsUs]]. */
  def decodeStr(id: String): Long = {
    val th = java.lang.Long.parseLong(id.substring(0, 8), 16)
    val tm = java.lang.Long.parseLong(id.substring(9, 13), 16)
    val tl = java.lang.Long.parseLong(id.substring(15, 18), 16)
    ((th << 28) + (tm << 12) + tl) / 10L - GregorianOffsetUs
  }
}
