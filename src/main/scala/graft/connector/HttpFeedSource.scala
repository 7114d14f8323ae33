package graft.connector

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.udf.CloudEventsParse

/** DSv2 HTTP feed source — the subscription half of the spec
  * (`README.md:84-146`) as a Structured Streaming `MicroBatchStream`:
  *
  *  - offset ≙ `lastEventId` (string; "" = feed start, `README.md:300`);
  *    the checkpoint WAL is the durable cursor the spec mandates
  *    (`README.md:111`).
  *  - `latestOffset` performs the polling loop: long-poll GET with the
  *    `timeout` param (`README.md:126`, :298-301), then page to the head
  *    (empty array = end of feed, `README.md:79-82`).
  *  - each micro-batch binds the half-open id range (start, end]; the
  *    executor re-fetches those pages — deterministic for a fixed cursor
  *    (`README.md:332`), so ranges are replayable and the spec's
  *    at-least-once delivery (`README.md:113`) becomes exactly-once inside
  *    the pipeline.
  *  - ONE InputPartition per MICRO-batch: a feed is a single totally-ordered
  *    stream (`README.md:9`) and steady-state micro-batches are small;
  *    parallelism comes after ingestion by repartitioning on `subject`
  *    (SURVEY.md §3.2).
  *
  * Batch mode (`spark.read`) is bounded replay: drain to head at plan time,
  * read (start, head] as one partition — or, with `backfillPartitions=N`,
  * as N equi-depth cursor-range partitions (the
  * `feed_backfill_partition_plan` split wired into the source; ranges are
  * replayable by the `lastEventId` contract, `README.md:150-159`), so the
  * initial full-history replay scales out instead of serializing through
  * one task.
  */
class HttpFeedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-feed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CloudEventsParse.envelopeSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // feeds may be auth-protected (Basic/Bearer, reference README.md:321-328)
    val auth = Option(opts.get("bearerToken")).map(t => s"Bearer $t")
      .orElse(for {
        u <- Option(opts.get("basicUser"))
        p <- Option(opts.get("basicPass"))
      } yield "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes("UTF-8")))
    new HttpFeedTable(HttpFeedOptions(
      url = Option(opts.get("url"))
        .getOrElse(throw new IllegalArgumentException("http-feed requires option 'url'")),
      timeoutMs = Option(opts.get("timeoutMs")).map(_.toLong).getOrElse(5000L),
      startId = Option(opts.get("startId")).getOrElse(""),
      auth = auth,
      backfillPartitions =
        Option(opts.get("backfillPartitions")).map(_.toInt).getOrElse(1)))
  }
}

case class HttpFeedOptions(url: String, timeoutMs: Long, startId: String,
                           auth: Option[String] = None,
                           /** Bounded-replay (batch) fan-out: split the
                             * (startId, head] range into this many
                             * equi-depth cursor-range InputPartitions.
                             * 1 = the ordered single-partition read. */
                           backfillPartitions: Int = 1)

class HttpFeedTable(opts: HttpFeedOptions) extends Table with SupportsRead {
  override def name(): String = s"http-feed(${opts.url})"
  override def schema(): StructType = CloudEventsParse.envelopeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpFeedScanBuilder(opts)
}

/** Scan builder with the two pushdowns the protocol natively supports
  * (SURVEY.md §4): a `id > cursor` filter becomes the `lastEventId` start
  * offset (the server skips those pages entirely, `README.md:12`), and a
  * LIMIT becomes a page budget (bounded batched pagination,
  * `README.md:11`). Both cut HTTP round-trips, not just rows.
  */
class HttpFeedScanBuilder(opts: HttpFeedOptions) extends ScanBuilder
    with SupportsPushDownLimit with SupportsPushDownFilters {

  private var startId: String = opts.startId
  private var limit: Option[Int] = None
  private var pushed: Array[sources.Filter] = Array.empty

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  // the source still returns at most `limit` rows but Spark keeps its own
  // limit for safety across pages
  override def isPartiallyPushed: Boolean = true

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    // Only a strict `id > v` maps onto the exclusive lastEventId cursor; a
    // `>=` cannot (the cursor always skips the named id), so it stays purely
    // residual and is NOT reported as pushed.
    pushed = filters.collect {
      case f @ sources.GreaterThan("id", v: String) => if (v > startId) startId = v; f
    }
    filters // all remain residual: cursor advance is an optimization, Spark re-checks
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan =
    new HttpFeedScan(opts.copy(startId = startId), limit)
}

class HttpFeedScan(opts: HttpFeedOptions, limit: Option[Int] = None) extends Scan {
  override def readSchema(): StructType = CloudEventsParse.envelopeSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new HttpFeedMicroBatchStream(opts)
  // ONE Batch per scan: Spark calls toBatch more than once on the same
  // Scan (observed twice per action), and each Batch plans with a full
  // drain-to-head walk over the wire — a fresh instance per call would
  // repeat that walk AND could pin a different head if the feed grew
  // between calls. The memoized Batch memoizes its partition plan too.
  private lazy val batch: Batch = new HttpFeedBatch(opts, limit)
  override def toBatch: Batch = batch
}

/** Offset = the lastEventId cursor, JSON-serialized into the WAL. */
case class HttpFeedOffset(lastEventId: String) extends Offset {
  override def json(): String =
    HttpFeedOffset.mapper.writeValueAsString(
      HttpFeedOffset.mapper.createObjectNode().put("lastEventId", lastEventId))
}
object HttpFeedOffset {
  private val mapper = new ObjectMapper()
  def fromJson(json: String): HttpFeedOffset =
    HttpFeedOffset(mapper.readTree(json).get("lastEventId").asText())
}

class HttpFeedMicroBatchStream(opts: HttpFeedOptions)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  @volatile private var availableNowEnd: Option[HttpFeedOffset] = None
  @volatile private var availableNowPages: IndexedSeq[(String, Int)] = IndexedSeq.empty
  /** (pad width, first sequence after opts.startId) when the AvailableNow
    * pin used the validated seq scheme — the fan-out's split inputs. */
  @volatile private var availableNowSeq: Option[(Int, Long)] = None

  override def initialOffset(): Offset = HttpFeedOffset(opts.startId)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow: pin the head once; batches never pass it. An
    * AvailableNow run over a year of history IS the backfill job, just
    * driven through the streaming engine for its checkpoint/restart
    * semantics — so the pin uses the same two-strategy plan as the
    * bounded batch read:
    *
    *  1. **Seq-prefixed ids (validated)** — O(log feed) requests: one
    *     scheme-detect page, one positional-cursor validation probe
    *     ([[HttpFeedClient.validateSeqCursor]]), the gallop+bisect head
    *     probe, and a ≤2-request real-head-id resolve. No histogram walk:
    *     the fan-out later splits any (s, e] by sequence arithmetic alone.
    *  2. **Opaque/UUIDv6 ids — histogram walk.** The walk records the
    *     page histogram (free — same requests either way) so a
    *     `backfillPartitions=N` replay can fan the pinned backlog out the
    *     same way the bounded batch read does. */
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowSeq = None
    availableNowPages = IndexedSeq.empty
    // the first request long-polls like the old walk did: an idle feed
    // waits up to timeoutMs for data before pinning an empty range
    val first = HttpFeedClient.fetchPage(opts.url, opts.startId,
      opts.timeoutMs, opts.auth, cache = Some(HttpFeedClient.sharedCache))
    if (first.isEmpty) {
      availableNowEnd = Some(HttpFeedOffset(opts.startId))
      return
    }
    HttpFeedClient.detectSeqScheme(opts.url, first, opts.auth) match {
      case Some((w, lastSeq)) =>
        val headSeq = HttpFeedClient.probeHeadSeq(opts.url, lastSeq, w, opts.auth)
        val headId = HttpFeedClient.drainHead(opts.url,
          HttpFeedClient.seqCursor(headSeq, w), 0, auth = opts.auth)
        val firstSeq =
          HttpFeedClient.parseSeqId(first.events.head.get("id").asText()).get._1
        availableNowSeq = Some((w, firstSeq))
        availableNowEnd = Some(HttpFeedOffset(headId))
      case None =>
        val pages = HttpFeedClient.drainPageHistogram(opts.url, opts.startId,
          0, auth = opts.auth)
        availableNowPages = pages
        availableNowEnd = Some(HttpFeedOffset(
          pages.lastOption.map(_._1).getOrElse(opts.startId)))
    }
  }

  /** Steady state: one long-poll page + one empty-page confirm — identical
    * to the pre-round-16 drain. Catch-up after downtime (a backlog past
    * [[HttpFeedClient.probeHead]]'s serial-page budget) switches to the
    * O(log backlog) synthesized-cursor probe on validated seq feeds
    * instead of serially paging the whole backlog through the driver
    * (which the single read partition would then re-page a second time). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowEnd.getOrElse {
      val from = start.asInstanceOf[HttpFeedOffset].lastEventId
      HttpFeedOffset(HttpFeedClient.probeHead(opts.url, from, opts.timeoutMs,
        auth = opts.auth))
    }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HttpFeedOffset].lastEventId
    val e = end.asInstanceOf[HttpFeedOffset].lastEventId
    if (s == e) Array.empty
    else {
      // Opt-in fan-out of a pinned AvailableNow backlog. Steady-state
      // micro-batches — and consumers that kept the default — stay ONE
      // ordered partition; fanning out trades intra-batch arrival order
      // for parallelism, which stateful downstreams (that repartition by
      // key) never observed anyway.
      //
      // Coverage guard (both strategies): fan out ONLY when the plan can
      // end EXACTLY at `e`. A checkpointed (s, e] written by a DIFFERENT
      // run (e.g. a ProcessingTime run restarted as AvailableNow, or a
      // server pageSize change between runs) can put `e` outside this
      // run's pinned plan — a fan-out ending short of `e` would silently
      // drop rows the WAL already records as consumed. The single-
      // partition fallback reads exactly (s, e] regardless, so
      // exactly-once survives any checkpoint/plan mismatch.
      //
      // Seq strategy: `e` must BE this run's pinned end (then sequence
      // arithmetic splits (s, e] with no further requests; the final
      // partition ends at `e` itself by construction). Histogram
      // strategy: the page slice's last boundary must be `e` (batch
      // bounds are page-aligned by construction, so the slice is exact).
      val seqFan: Option[Array[InputPartition]] =
        if (opts.backfillPartitions > 1 && availableNowEnd.exists(_.lastEventId == e))
          availableNowSeq.flatMap { case (w, firstSeq) =>
            val lo = if (s.isEmpty) Some(firstSeq - 1)
                     else HttpFeedBackfill.seqBoundOf(s, w)
            val hi = HttpFeedBackfill.seqBoundOf(e, w)
            for { l <- lo; h <- hi; if h > l } yield
              HttpFeedBackfill.seqRangePartitions(opts, s, e,
                HttpFeedBackfill.uniformSeqBounds(l, h, opts.backfillPartitions), w)
          }
        else None
      seqFan.getOrElse {
        val slice =
          if (opts.backfillPartitions > 1)
            availableNowPages.filter(p => p._1 > s && p._1 <= e)
          else IndexedSeq.empty
        if (slice.nonEmpty && slice.last._1 == e)
          HttpFeedBackfill.equiDepthPartitions(opts, s, slice)
        else
          Array(HttpFeedInputPartition(opts.url, s, e, auth = opts.auth))
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpFeedReaderFactory

  override def deserializeOffset(json: String): Offset = HttpFeedOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class HttpFeedBatch(opts: HttpFeedOptions, limit: Option[Int] = None) extends Batch {
  // Spark may call planInputPartitions more than once on the same Batch
  // (measured: a count() over the source invoked it twice — a second full
  // drain walk over the wire, and a second head probe that could even pin a
  // DIFFERENT head if the feed grew between calls). Plan once, memoize.
  private lazy val planned: Array[InputPartition] = plan()

  override def planInputPartitions(): Array[InputPartition] = planned

  private def plan(): Array[InputPartition] = {
    // A pushed LIMIT keeps the single-partition path: the page budget caps
    // planning-time round-trips AND a global row limit over a fan-out would
    // admit rows from the wrong end of the order. Fan-out is for full
    // backfills, where there is no limit by definition.
    if (opts.backfillPartitions > 1 && limit.isEmpty)
      planBackfillPartitions()
    else {
      // with a pushed limit the head probe stops after `limit` events — the
      // page budget caps planning-time round-trips too
      val head = HttpFeedClient.drainHead(opts.url, opts.startId, 0,
        maxEvents = limit.getOrElse(Int.MaxValue), auth = opts.auth)
      if (head == opts.startId) Array.empty
      else Array(HttpFeedInputPartition(opts.url, opts.startId, head, limit, opts.auth))
    }
  }

  /** Parallel-backfill plan: the `feed_backfill_partition_plan` operator's
    * split wired into the source, with two strategies picked by the feed's
    * id scheme (the spec blesses both, `README.md:156-159`):
    *
    *  1. **Sequence-prefixed ids — O(log feed) plan.** Seq prefixes are
    *     positionally interpretable (`README.md:159`) and the server must
    *     honor cursors for ABSENT ids (`README.md:153-154`), so the head
    *     is found by binary-searching synthesized `lpad(seq)::` cursors
    *     ([[HttpFeedClient.probeHeadSeq]]) and (start, head] splits by
    *     sequence arithmetic — ZERO histogram walk. This kills the one
    *     serial O(feed) driver stage the connector had: planning a
    *     1000-executor backfill now costs ~2·log₂(feed) requests instead
    *     of paging the whole feed through the driver before any executor
    *     starts (BASELINE.md records the old Amdahl ceiling).
    *  2. **Opaque/UUIDv6 ids — histogram fallback.** Positions are not
    *     synthesizable, so the planning walk records the page histogram
    *     (free — finding the head already pages the whole range) and
    *     [[HttpFeedBackfill.equiDepthPartitions]] emits page-aligned
    *     ranges. */
  private def planBackfillPartitions(): Array[InputPartition] =
    planSeqSplit().getOrElse {
      val pages = HttpFeedClient.drainPageHistogram(opts.url, opts.startId, 0,
        auth = opts.auth)
      if (pages.isEmpty) Array.empty
      else HttpFeedBackfill.equiDepthPartitions(opts, opts.startId, pages)
    }

  /** Sequence-arithmetic split, or None when the feed's ids are not
    * sequence-prefixed OR the server fails the positional-cursor
    * validation probe ([[HttpFeedClient.validateSeqCursor]] — a server
    * that PARSES the sequence out of `lastEventId` would skip the
    * boundary sequence at every synthesized partition bound; it gets the
    * real-id histogram plan instead, which is correct on both server
    * types). Scheme detection samples the first page (one request — both
    * its first and last id must parse with the same pad width); a feed is
    * a single totally-ordered id stream (`README.md:9`, :150-151), so one
    * scheme governs the whole feed — a mid-stream scheme switch would
    * already have broken the server's own ordering contract.
    *
    * Sequences may have gaps (a DB sequence is monotonic, not dense), so
    * equi-WIDTH seq ranges approximate equi-DEPTH row buckets; each range
    * is exact-by-construction in COVERAGE (the union telescopes to
    * (startId, headId]) and only approximate in balance. When the probe
    * pages themselves disagree about live density (heavily-compacted
    * feeds), [[HttpFeedBackfill.densityQuantileBounds]] refines the
    * boundaries from a piecewise density model at O(N) extra requests —
    * still no O(feed) walk. */
  private def planSeqSplit(): Option[Array[InputPartition]] = {
    val first = HttpFeedClient.fetchPage(opts.url, opts.startId, 0, opts.auth,
      cache = Some(HttpFeedClient.sharedCache))
    if (first.isEmpty) return Some(Array.empty)
    HttpFeedClient.detectSeqScheme(opts.url, first, opts.auth).map { case (w, lastSeq) =>
      val (headSeq, probeSamples) =
        HttpFeedClient.probeHeadSeqSampled(opts.url, lastSeq, w, opts.auth)
      // resolve the real head id (≤ one page shares the head sequence +
      // the empty-page confirm): partitions end at real ids when possible
      val headId = HttpFeedClient.drainHead(opts.url,
        HttpFeedClient.seqCursor(headSeq, w), 0, auth = opts.auth)
      val firstSeq =
        HttpFeedClient.parseSeqId(first.events.head.get("id").asText()).get._1
      val loSeq = firstSeq - 1
      val samples = HttpFeedClient.SeqSample(firstSeq, lastSeq,
        first.events.length) +: probeSamples
      val bounds = HttpFeedBackfill.seqSplitBounds(opts, loSeq, headSeq, w, samples)
      HttpFeedBackfill.seqRangePartitions(opts, opts.startId, headId, bounds, w)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new HttpFeedReaderFactory
}

/** Shared equi-depth range splitter for bounded replays (batch `spark.read`
  * AND a pinned Trigger.AvailableNow backlog): assigns page `j` with
  * cumulative-before count `cumb` to bucket `cumb·N div total` — the
  * `feed_backfill_partition_plan` operator's exact formula — and emits one
  * (startId, endId] InputPartition per non-empty bucket. Ranges are
  * page-aligned (a page is never split) and replayable by the spec's own
  * `lastEventId` contract (`README.md:150-159`): each executor re-pages
  * its range independently, so the initial 100 TB replay — the longest
  * job this source ever runs — scales by N instead of serializing through
  * one task. Rows arrive partition-ordered, not globally ordered; a
  * consumer needing the feed's total order sorts by id, which at this
  * scale it had to do anyway after any shuffle. */
private[graft] object HttpFeedBackfill {

  /** Sequence covered through-and-including by an offset id under the seq
    * scheme: a real id `lpad(k)::suffix` covers through k; a synthesized
    * bare cursor `lpad(k)::` positions strictly BEFORE sequence k, so it
    * covers only through k − 1. None when the id does not parse with the
    * feed's pad width (→ caller falls back to a single partition). */
  def seqBoundOf(id: String, width: Int): Option[Long] =
    HttpFeedClient.parseSeqId(id).collect {
      case (k, w) if w == width =>
        if (id.length == width + graft.udf.SeqId.Sep.length) k - 1 else k
    }

  /** Overflow-safe equi-width internal boundaries for (loSeq, hiSeq]:
    * bound(i) = ⌊loSeq + span·i/n⌋ computed as
    * `loSeq + span/n·i + span%n·i/n` — exact (span = q·n + r ⇒
    * span·i/n = q·i + ⌊r·i/n⌋, and r·i < n² ≤ 2⁶² for Int partition
    * counts) where the naive `span·i` wraps Long for 18-digit sequence
    * bases ([[HttpFeedClient.parseSeqId]] admits prefixes to 18 digits). */
  def uniformSeqBounds(loSeq: Long, hiSeq: Long, n: Int): IndexedSeq[Long] = {
    val span = hiSeq - loSeq
    val nn = n.toLong
    (1L until nn).map(i => loSeq + span / nn * i + span % nn * i / nn)
  }

  /** Pick the internal split boundaries for (loSeq, headSeq]: uniform
    * sequence arithmetic when the probe pages saw roughly one live
    * density everywhere, or quantile boundaries from a probed density
    * model when they did not (heavily-compacted/gappy feeds, where
    * equi-width ranges give skewed partition depths). The gap check is
    * FREE: the head-probe's own pages sampled the backlog (gallop =
    * geometric stride over the whole span, bisection = concentrated near
    * the head), so disagreement among them is direct evidence of
    * non-uniform live density. */
  def seqSplitBounds(opts: HttpFeedOptions, loSeq: Long, headSeq: Long,
                     width: Int,
                     samples: IndexedSeq[HttpFeedClient.SeqSample]): IndexedSeq[Long] = {
    // span-1 samples (a probe that landed on the head's own sequence)
    // carry no density information — keeping them would false-flag every
    // sparse-but-uniform feed as gappy
    val densities = samples.collect {
      case s if s.seqLast > s.seqFirst && s.count > 0 =>
        s.count.toDouble / (s.seqLast - s.seqFirst + 1)
    }
    val gappy = densities.nonEmpty && densities.max > 3.0 * densities.min
    if (gappy)
      densityQuantileBounds(opts, loSeq, headSeq, width)
    else
      uniformSeqBounds(loSeq, headSeq, opts.backfillPartitions)
  }

  /** Balance refinement for gappy/compacted seq feeds at O(K) extra
    * requests (K = max(16, 2N) — bounded, never the O(feed) walk): probe
    * one page at the start of each of K equal-width grid segments of
    * (loSeq, headSeq]. Each probe page is an EXACT local measurement —
    * `count` events over a known sequence span — so the segments form a
    * piecewise-constant live-density model (leading gap [gridStart,
    * firstLiveSeq) is exactly empty; the page's density extends through
    * the segment). The N−1 internal boundaries then sit at the model
    * CDF's N-quantiles, interpolated within their segment. Approximate in
    * balance (the model is sampled), exact in coverage (boundaries only
    * feed [[seqRangePartitions]], whose union telescopes regardless). */
  def densityQuantileBounds(opts: HttpFeedOptions, loSeq: Long, headSeq: Long,
                            width: Int): IndexedSeq[Long] = {
    val n = opts.backfillPartitions
    val k = math.max(16, 2 * n)
    val grid = uniformSeqBounds(loSeq, headSeq, k)
    val segStarts = loSeq +: grid
    val segEnds = grid :+ headSeq
    // (firstLiveSeq, density, mass) per grid segment (segStart, segEnd]
    val segs = segStarts.zip(segEnds).map { case (g0, g1) =>
      if (g1 <= g0) (g1, 0.0, 0.0)
      else {
        val page = HttpFeedClient.fetchPage(opts.url,
          HttpFeedClient.seqCursor(g0 + 1, width), 0, opts.auth,
          cache = Some(HttpFeedClient.sharedCache))
        val sample = for {
          firstEvent <- page.events.headOption
          (f, _) <- HttpFeedClient.parseSeqId(firstEvent.get("id").asText())
          lastId <- page.lastId
          (l, _) <- HttpFeedClient.parseSeqId(lastId)
        } yield (f, l, page.events.length)
        sample match {
          case Some((f, l, c)) if f <= g1 =>
            val d = c.toDouble / math.max(1L, l - f + 1)
            (f, d, d * (g1 - f + 1))
          case _ => (g1, 0.0, 0.0) // segment is entirely a gap
        }
      }
    }
    val total = segs.iterator.map(_._3).sum
    if (total <= 0) return uniformSeqBounds(loSeq, headSeq, n)
    (1 until n).map { i =>
      val q = total * i / n
      var cum = 0.0
      var bound = headSeq
      var found = false
      segs.zip(segEnds).foreach { case ((f, d, m), g1) =>
        if (!found) {
          if (cum + m >= q && d > 0) {
            val within = math.max(1L, math.round((q - cum) / d))
            bound = math.min(g1, f - 1 + within)
            found = true
          } else cum += m
        }
      }
      math.min(math.max(bound, loSeq + 1), headSeq)
    }
  }

  /** Emit the (startId, endId] partitions for a seq-arithmetic split:
    * internal boundary b becomes the synthesized cursor(b+1) — "after all
    * events with seq ≤ b", a legal wire value per the positional-cursor
    * contract the planner VALIDATED at detect time — and the final
    * partition ends at `endId` itself (a real id when the head resolve
    * succeeded). Deduped/clamped so the union telescopes exactly to
    * (startId, endId] whatever the boundary quality. */
  def seqRangePartitions(opts: HttpFeedOptions, startId: String, endId: String,
                         internalBounds: IndexedSeq[Long],
                         width: Int): Array[InputPartition] = {
    val parts = Array.newBuilder[InputPartition]
    var prevId = startId
    internalBounds.distinct.sorted.foreach { b =>
      val bid = HttpFeedClient.seqCursor(b + 1, width)
      if (bid > prevId && bid < endId) {
        parts += HttpFeedInputPartition(opts.url, prevId, bid, auth = opts.auth)
        prevId = bid
      }
    }
    parts += HttpFeedInputPartition(opts.url, prevId, endId, auth = opts.auth)
    parts.result()
  }

  def equiDepthPartitions(opts: HttpFeedOptions, startId: String,
                          pages: IndexedSeq[(String, Int)]): Array[InputPartition] = {
    val total = pages.iterator.map(_._2.toLong).sum
    val n = opts.backfillPartitions.toLong
    val parts = Array.newBuilder[InputPartition]
    var rangeStart = startId
    var bucketEnd = rangeStart // last page id seen in the current bucket
    var bucket = 0L
    var cumb = 0L
    pages.foreach { case (pageLastId, count) =>
      val b = cumb * n / total
      if (b != bucket) {
        parts += HttpFeedInputPartition(opts.url, rangeStart, bucketEnd,
          auth = opts.auth)
        rangeStart = bucketEnd
        bucket = b
      }
      bucketEnd = pageLastId
      cumb += count
    }
    parts += HttpFeedInputPartition(opts.url, rangeStart, bucketEnd,
      auth = opts.auth)
    parts.result()
  }
}

/** The (startId, endId] page range one task reads (row budget optional;
  * the auth header rides along to the executor — a production deployment
  * would resolve credentials from a provider instead of the plan). */
case class HttpFeedInputPartition(url: String, startId: String, endId: String,
                                  limit: Option[Int] = None,
                                  auth: Option[String] = None)
    extends InputPartition

class HttpFeedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HttpFeedPartitionReader(partition.asInstanceOf[HttpFeedInputPartition])
}

/** Executor-side reader: pages through (startId, endId] with the protocol's
  * cursor loop (`README.md:95-109`), stopping at the empty page or once the
  * bound is passed. Rows beyond endId (data that arrived after the batch
  * was planned) are excluded so the batch is exactly the planned range.
  *
  * Compaction racing a planned range is safe: cursor POSITIONS survive
  * deletion (`README.md:153-154`), so if the server compacts between
  * planning and reading, the task still terminates, stays within
  * (startId, endId], and returns exactly the rows that survive in that
  * range — the batch legitimately shrinks, it never hangs, loses a
  * survivor, or spills past its bound (pinned by HttpSourceSuite's
  * compaction-between-planning-and-reading test).
  */
class HttpFeedPartitionReader(p: HttpFeedInputPartition)
    extends PartitionReader[InternalRow] {

  private var cursor = p.startId
  private var page: IndexedSeq[JsonNode] = IndexedSeq.empty
  private var idx = 0
  private var emitted = 0
  private var exhausted = false
  private var current: InternalRow = _

  private def str(n: JsonNode, field: String): UTF8String = {
    val v = n.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  private def toRow(n: JsonNode): InternalRow = {
    val timeUs = Option(n.get("time_us")).filterNot(_.isNull).map(_.asLong())
    // datacontenttype passes through from the wire verbatim (non-JSON
    // payloads ride as-is, e.g. base64 data with a binary media type);
    // only a MISSING field takes the spec default (README.md:315)
    val ct = Option[Any](str(n, "datacontenttype"))
      .getOrElse(UTF8String.fromString("application/json"))
    // extension attributes (README.md:318): every envelope key that is not
    // a core attribute survives the wire verbatim as a string entry, in
    // wire order — `traceparent`, `partitionkey`, … Non-textual extension
    // values ride as their compact-JSON rendering.
    val fields = n.fields()
    val extKeys = scala.collection.mutable.ArrayBuffer[Any]()
    val extVals = scala.collection.mutable.ArrayBuffer[Any]()
    while (fields.hasNext) {
      val e = fields.next()
      if (!HttpFeedPartitionReader.CoreAttributes.contains(e.getKey)) {
        extKeys += UTF8String.fromString(e.getKey)
        extVals += (if (e.getValue.isNull) null
          else UTF8String.fromString(
            if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString))
      }
    }
    val ext = new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(extKeys.toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(extVals.toArray))
    new GenericInternalRow(Array[Any](
      str(n, "specversion"), str(n, "id"), str(n, "type"), str(n, "source"),
      timeUs.map(Long.box).orNull, str(n, "subject"), str(n, "method"),
      ct, str(n, "data"), ext))
  }

  override def next(): Boolean = {
    if (p.limit.exists(emitted >= _)) return false // pushed-limit row budget
    while (idx >= page.length && !exhausted) {
      // the JVM-wide page cache serves replayed immutable full pages
      // (task retries, restart backfills) without a network round-trip —
      // only pages the server marked `Cache-Control: public, max-age=…`
      // are ever stored (reference README.md:330-332)
      val fetched = HttpFeedClient.fetchPage(p.url, cursor, 0, p.auth,
        cache = Some(HttpFeedClient.sharedCache))
      if (fetched.isEmpty) { exhausted = true }
      else {
        page = fetched.events
        idx = 0
        cursor = fetched.lastId.get
        if (cursor >= p.endId) exhausted = true // last page of the range
      }
    }
    if (idx < page.length) {
      val n = page(idx); idx += 1
      val id = n.get("id").asText()
      if (id > p.endId) { page = IndexedSeq.empty; exhausted = true; next() }
      else { current = toRow(n); emitted += 1; true }
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object HttpFeedPartitionReader {
  /** Core envelope attributes (README.md:306-316 plus the engine's
    * `time_us` metadata twin of `time`); everything else is an extension
    * attribute (README.md:318). */
  private[connector] val CoreAttributes: Set[String] = Set(
    "specversion", "id", "type", "source", "time", "time_us",
    "subject", "method", "datacontenttype", "data")
}
