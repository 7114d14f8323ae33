package graft.udf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.CloudEvent

/** Typed compaction aggregate (§2.9): the newest envelope per `subject` in
  * `id` order — the aggregate-feed compaction rule of the spec (reference
  * `README.md:184-188`: an entry MAY be deleted when a newer entry with the
  * same subject exists). `id` comparison is lexicographic, which equals
  * numeric order under the zero-padded sequence-prefix scheme
  * ([[SeqId]], `README.md:159`).
  *
  * This is the typed counterpart of the relational `feed_compact_latest`
  * window plan; a property test asserts the two always agree. The buffer is
  * a single envelope (max-by semantics), so partial aggregation is
  * merge-order independent — safe on any shuffle topology.
  */
object LatestState extends Aggregator[CloudEvent, CloudEvent, CloudEvent] {

  /** Sentinel: empty id sorts strictly before every real (non-empty) id. */
  val zero: CloudEvent =
    CloudEvent("", "", "", "", new java.sql.Timestamp(0L), None, None, None, None)

  def reduce(b: CloudEvent, e: CloudEvent): CloudEvent =
    if (e.id > b.id) e else b

  def merge(a: CloudEvent, b: CloudEvent): CloudEvent =
    if (b.id > a.id) b else a

  def finish(r: CloudEvent): CloudEvent = r

  def bufferEncoder: Encoder[CloudEvent] = Encoders.product[CloudEvent]
  def outputEncoder: Encoder[CloudEvent] = Encoders.product[CloudEvent]
}
