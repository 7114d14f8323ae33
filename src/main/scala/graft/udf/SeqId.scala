package graft.udf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codec for the spec's sequence-prefixed order-key scheme (reference
  * `README.md:159`): `lpad(seq, 13, '0') ‖ "::" ‖ suffix`, e.g.
  * `0000001000001::5f8de8ff-30d8-4fab-8f5a-c32f326d6f26`. The zero-padded
  * numeric prefix makes lexicographic string order equal numeric order, so
  * the feed's `lastEventId` cursor supports both string comparison (HTTP
  * wire form) and offset arithmetic (streaming source internals).
  *
  * Two surfaces:
  *  - native Column expressions (codegen-friendly; the hot path)
  *  - registered Scala UDFs (`seq_id_encode` / `seq_id_decode`) — the §2.9
  *    UDF extension-point showcase, property-tested ≡ the native path.
  */
object SeqId {

  val Sep = "::"
  val Width = 13

  /** Native (codegen'd) encode: zero-pad the sequence and append suffix. */
  def encode(seq: Column, suffix: Column): Column =
    concat(lpad(seq.cast("string"), Width, "0"), lit(Sep), suffix)

  /** Native (codegen'd) decode of the numeric prefix. */
  def decodeSeq(id: Column): Column =
    split(id, Sep).getItem(0).cast("long")

  /** Scala-function forms backing the registered UDFs. */
  val encodeFn: (Long, String) => String =
    (seq, suffix) => ("%0" + Width + "d").format(seq) + Sep + suffix

  /** Null-safe decode mirroring the native `decodeSeq` contract: null input,
    * a missing `::` separator, or a non-numeric/overflowing prefix all yield
    * null (None) instead of failing the task — one malformed id must not
    * kill a 100 TB job, and both decode surfaces must agree.
    */
  val decodeFn: String => Option[Long] = id => {
    if (id == null) None
    else {
      val cut = id.indexOf(Sep)
      if (cut <= 0) None
      else
        try Some(id.substring(0, cut).toLong)
        catch { case _: NumberFormatException => None }
    }
  }

  val encodeUdf = udf(encodeFn)
  val decodeUdf = udf(decodeFn)

  /** Register both UDFs on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("seq_id_encode", encodeFn)
    spark.udf.register("seq_id_decode", decodeFn)
  }
}
