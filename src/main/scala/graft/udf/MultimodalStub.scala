package graft.udf

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed multimodal decode plumbing: media content travels as an opaque
  * `binary` column with typed metadata; the decode stage runs per
  * partition over batches of rows (the Scala analog of a vectorized
  * Python UDF). The actual media decode is STUBBED — no image/audio codecs
  * exist in this container — with a deterministic fake derived from the
  * content fingerprint, chosen to be byte-identical to the relational
  * formulation in `graft.ops.Pipeline` (`multimodal_decode_stub`), which a
  * test asserts. The schema, partitioning, and batch iteration are the
  * real 100 TB plumbing: replace `fakeDecode` with a codec call and
  * nothing else changes.
  */
object MultimodalStub {

  /** Input: one media object (content + carried metadata). */
  case class MediaIn(doc_id: Long, content: Array[Byte], n_chars: Long)

  /** Output: decoded metadata (stub dims stand in for real decode). */
  case class MediaOut(doc_id: Long, nbytes: Long, fp: String,
                      fake_w: Long, fake_h: Long, n_frames: Long)

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** The stubbed decode kernel — REAL version would parse the media
    * container here; the fake derives dims from the md5 decimal digits
    * exactly like the relational pipeline does. */
  def fakeDecode(m: MediaIn): MediaOut = {
    val fp = md5Hex(m.content)
    // lpad(digits-of-fp, 4, '0') then first 2 / next 2 — mirror of the
    // expression pipeline's formula
    val padded = {
      val ds = fp.filter(_.isDigit)
      if (ds.length >= 4) ds else ("0" * (4 - ds.length)) + ds
    }
    MediaOut(m.doc_id, m.content.length.toLong, fp,
      (padded.substring(0, 2).toLong % 8 + 1) * 64,
      (padded.substring(2, 4).toLong % 8 + 1) * 64,
      m.n_chars % 30 + 1)
  }

  /** Batch decode: one iterator pass per partition (codec state, native
    * buffers etc. would be initialized once per partition here). */
  def decodeBatch(it: Iterator[MediaIn]): Iterator[MediaOut] = it.map(fakeDecode)

  /** The full pipeline stage: documents → binary content column →
    * partition-parallel decode. */
  def pipeline(docs: DataFrame): Dataset[MediaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "utf-8").as("content"), col("n_chars"))
      .as[MediaIn]
      .mapPartitions(decodeBatch _)
  }
}
