package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.canon

/** §2.20 iterative training loops, event-sourcing recovery, and physical
  * layout II — the operators behind "keep the model training and the lake
  * healthy": a full two-iteration Lloyd's k-means (assign → update →
  * reassign, integer-exact end to end), snapshot-resume for the feed's
  * read model (the event-sourcing algebra that makes recovery O(|state| +
  * |tail|) instead of O(|feed|)), zone-map data skipping proven lossless,
  * the streaming small-file compaction planner, snapshot manifest diffs,
  * and exact per-group OLS trend fitting in bounded integer arithmetic.
  *
  * Scale shapes (100 TB design):
  *  - kmeans_train_iters: centroids are k×dim = tiny → broadcast to every
  *    assign; the update is a (cid, pos)-keyed partial aggregate whose
  *    reduce output is k×dim rows no matter the corpus size. Two Lloyd
  *    iterations = two broadcast-assign scans + two k×dim reduces — the
  *    exact shape a 1000-executor trainer runs, just with more iterations.
  *  - feed_snapshot_resume: compaction (latest-per-subject) is an
  *    associative max_by reduce, so the feed can be split at ANY offset:
  *    compact(prefix) ∪ suffix then compact again ≡ compact(full). The
  *    snapshot side is |subjects| rows, the tail is |Δ| — recovery reads
  *    neither scale with feed history. The oracle is the FULL-replay SQL,
  *    so a lossy split would hash-mismatch.
  *  - zonemap_prune: per-chunk min/max (the parquet row-group / data-file
  *    statistics a lakehouse keeps) prune a time-range probe to the
  *    overlapping chunks; the residual filter re-applies the predicate.
  *    The oracle aggregates the DIRECT full-scan filter — equality proves
  *    skipping lost nothing. The feed is append-ordered (event_id follows
  *    ts, SURVEY §1), so time zone-maps are tight: ~¼ of chunks scanned.
  *  - compaction_plan: the deterministic streaming bin-packer — files in
  *    layout order, running-size prefix sum, group = floor(bytes-before /
  *    target). One window per day partition (never global).
  *  - manifest_diff: two snapshot manifests full-outer-joined on the file
  *    key; manifests are per-file aggregates (thousands of rows per PB),
  *    never the data.
  *  - trend_fit_group: one map-side-combinable aggregate pass collecting
  *    (n, Σx, Σy, Σxy, Σx²); the slope comes out of the sums in bounded
  *    BIGINT (hour-scaled x, centi-scaled y — bounds in comments), with
  *    the binding |num|·10⁶ product in DECIMAL(38,0)/HUGEINT on both
  *    engines (r13 — good to ~2.6e11 rows/group).
  */
object LoopOps {

  /** Canonized embedding: float32 → exact double → floor(x·10⁴) per
    * component, as BIGINT array. Both engines do the identical
    * double-precision floor, so every distance below is integer-exact. */
  private val CanonVec =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"

  /** Integer squared distance between two canonized vectors. Bounds:
    * |component| ≤ 2·10⁴ → diff² ≤ 1.6e9, ×64 dims ≤ 1.1e11 — far inside
    * BIGINT. */
  private def sqdist(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      s"CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  /** Nearest-centroid assignment: min(struct(sqd, cid)) breaks exact-tie
    * distances on cid identically in both engines. Centroid table is k
    * rows → broadcast (BNLJ by design, allowlisted). */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("ev"),
        struct(sqdist("ev", "cv").as("sqd"), col("cid")).as("w"))
      .groupBy("vec_id").agg(min(col("w")).as("w"), first(col("ev")).as("ev"))
      .select(col("vec_id"), col("ev"), col("w.cid").as("cid"),
        col("w.sqd").as("sqd"))

  /** Lloyd update: per-(cid, pos) integer mean of member components.
    * The +20000·n shift keeps the dividend non-negative so Spark's
    * truncating `div` equals DuckDB's flooring `//` (components can be
    * negative; floor(Σv/n) is the contract). Reduce output is k×dim rows. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("ev")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(expr("(sum(v) + 20000 * count(1)) div count(1) - 20000").as("v"))

  /** Exploded (cid, pos, v) centroids back to (cid, cvec) arrays;
    * array_sort on (pos, v) structs is deterministic — pos is unique. */
  private def toArrays(cexp: DataFrame): DataFrame =
    cexp.groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, v))), s -> s.v)")
        .as("cv"))

  // zone-map probe window: [2024-01-10, 2024-01-17) as epoch micros
  private val ZmLoUs = 1704844800000000L
  private val ZmHiUs = 1705449600000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two full Lloyd iterations of k-means (k = 8 seed vectors), every
    // arithmetic step on floor-canonized integer components so assignment
    // and centroid update are bit-equal across engines: assign₁ (broadcast
    // seeds) → update (k×dim reduce) → assign₂ → per-cluster size, total
    // within-cluster squared distance, and a position-weighted centroid
    // checksum. The multi-iteration twin of kmeans_assign_step, the same
    // way graph_pagerank_conv extends graph_pagerank_step.
    "kmeans_train_iters" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), expr(CanonVec).as("ev"))
      val c0 = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("ev").as("cv"))
      val c1e = update(assign(emb, c0))
      val a2 = assign(emb, toArrays(c1e))
      val ck = c1e.groupBy("cid")
        .agg(sum(col("v") * (col("pos") + 1)).as("cent_ck"))
      a2.groupBy("cid")
        .agg(count(lit(1)).as("n"), sum("sqd").as("sum_sqd"))
        .join(broadcast(ck), "cid")
        .select(col("cid"), col("n"), col("sum_sqd"), col("cent_ck"))
        .orderBy("cid")
    }),

    // Event-sourcing snapshot resume (reference README.md:168-179 read
    // model + README.md:79-82 full-replay consistency): materialize the
    // read-model SNAPSHOT at the feed's midpoint offset, replay only the
    // TAIL after it, and merge by re-compacting the union. Latest-per-
    // subject is an associative reduce, so the split is lossless at any
    // offset — the oracle is the full-replay read model itself.
    "feed_snapshot_resume" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.createOrReplaceTempView("events")
      val mid = expr("(SELECT (min(event_id) + max(event_id)) div 2 FROM events)")
      def compact(df: DataFrame): DataFrame = {
        val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
        df.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }
      // snapshot keeps tombstone rows: state must remember a deletion so
      // a tail with no newer event for that subject stays deleted
      val snapshot = compact(ev.filter(col("event_id") <= mid))
      val tail = ev.filter(col("event_id") > mid)
      compact(snapshot.unionByName(tail))
        .filter(col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"), canon(col("value")).as("value_c"), col("props"))
        .orderBy("user_id")
    }),

    // Zone-map data skipping proven lossless: per-100-row-chunk min/max
    // ts (the file-statistics a lakehouse catalog keeps), a 7-day probe
    // scans only overlapping chunks + residual filter; per-type aggregates
    // must equal the direct full-scan filter (the oracle computes exactly
    // that), with the chunks-scanned/total counters carried alongside.
    "zonemap_prune" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("ts_us"), canon(col("value")).as("vc"),
          expr("event_id div 100").as("chunk"))
      val zm = ev.groupBy("chunk")
        .agg(min("ts_us").as("mn"), max("ts_us").as("mx"))
      val hit = col("mx") >= ZmLoUs && col("mn") < ZmHiUs
      val sel = zm.filter(hit).select("chunk")
      val stats = zm.agg(count(lit(1)).as("n_chunks_total"),
        sum(when(hit, 1L).otherwise(0L)).as("n_chunks_scanned"))
      ev.join(broadcast(sel), "chunk")
        .filter(col("ts_us") >= ZmLoUs && col("ts_us") < ZmHiUs)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), sum("vc").as("sum_v_c"))
        .crossJoin(broadcast(stats))
        .orderBy("event_type")
    }),

    // Streaming small-file compaction planner: one "file" per (day, hour)
    // of the feed (bytes modeled as 200 + 50·rows), files taken in layout
    // order, running bytes-before prefix sum per day, compaction group =
    // floor(bytes-before / 16000). Deterministic, single window per day
    // partition; emits per-group file counts, sizes, and hour spans.
    "compaction_plan" -> ((s, d) => {
      val files = Tables.events(s, d)
        .groupBy(to_date(timestamp_micros(col("ts_us"))).as("day"),
          hour(timestamp_micros(col("ts_us"))).cast("long").as("hr"))
        .agg((lit(200L) + lit(50L) * count(lit(1))).as("bytes"))
      val w = Window.partitionBy("day").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("before", coalesce(sum("bytes").over(w), lit(0L)))
        .withColumn("grp", expr("before div 16000"))
        .groupBy("day", "grp")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("tot_bytes"),
          min("hr").as("hr_lo"), max("hr").as("hr_hi"))
        .orderBy("day", "grp")
    }),

    // Snapshot manifest diff: yesterday's manifest (docs with id ≤ 80% of
    // head) vs today's quality-curated manifest (n_chars ≥ 120), keyed by
    // (source, doc_id div 50) data files; full outer join classifies each
    // file added / removed / changed / unchanged with both sides' counts.
    "manifest_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      docs.createOrReplaceTempView("documents")
      val cut = expr("(SELECT (max(doc_id) * 8) div 10 FROM documents)")
      def manifest(df: DataFrame): DataFrame =
        df.groupBy(col("source"), expr("doc_id div 50").as("file_id"))
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
      val v1 = manifest(docs.filter(col("doc_id") <= cut))
      val v2 = manifest(docs.filter(col("n_chars") >= 120))
      v1.select(col("source"), col("file_id"), col("n_docs").as("n1"),
          col("bytes").as("b1"))
        .join(v2.select(col("source"), col("file_id"),
          col("n_docs").as("n2"), col("bytes").as("b2")),
          Seq("source", "file_id"), "full_outer")
        .select(col("source"), col("file_id"),
          coalesce(col("n1"), lit(0L)).as("n1"),
          coalesce(col("n2"), lit(0L)).as("n2"),
          when(col("n1").isNull, "added")
            .when(col("n2").isNull, "removed")
            .when(col("n1") === col("n2") && col("b1") === col("b2"),
              "unchanged")
            .otherwise("changed").as("status"))
        .orderBy("source", "file_id")
    }),

    // Exact per-group OLS slope in bounded integer arithmetic: x = hours
    // since the group's first event (≤ ~720), y = centi-canonized value
    // (≤ 4.9e4); one aggregate pass collects (n, Σx, Σy, Σxy, Σx²), then
    // slope = Σ(x-x̄)(y-ȳ) / Σ(x-x̄)² from the sums with floor-integer
    // means. |num| ≤ n·720·4.9e4 ≈ 3.5e7·n, so the sums and num/den
    // stay BIGINT to ~2.6e11 rows/group; the binding |num|·10⁶ product
    // (past int64 from n ≈ 2e5/group) runs in DECIMAL(38,0)/HUGEINT on
    // both engines, quotient back to BIGINT.
    // slope_ppm truncates toward zero via sign·(|num|·10⁶ div den) —
    // written the same way in the oracle so Spark's truncating `div` and
    // DuckDB's flooring `//` cannot diverge on negative slopes.
    "trend_fit_group" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("ts_us"),
          canon(col("value"), 100L).as("y"))
      val t0 = ev.groupBy("event_type").agg(min("ts_us").as("t0"))
      val xy = ev.join(broadcast(t0), "event_type")
        .withColumn("x", expr("(ts_us - t0) div 3600000000"))
      val sums = xy.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      sums
        .withColumn("xb", expr("sx div n"))
        .withColumn("yb", expr("sy div n"))
        .withColumn("num",
          expr("sxy - xb * sy - yb * sx + n * xb * yb"))
        .withColumn("den", expr("sxx - 2 * xb * sx + n * xb * xb"))
        .select(col("event_type"), col("n"), col("xb"), col("yb"),
          col("num"), col("den"),
          (signum(col("num")).cast("long") *
            expr("(CAST(abs(num) AS DECIMAL(38,0)) * 1000000) div den"))
            .as("slope_ppm"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "kmeans_train_iters" ->
      """WITH e AS (SELECT vec_id, gs AS pos,
        |    CAST(floor(CAST(embedding[gs] AS DOUBLE) * 10000) AS BIGINT) AS v
        |  FROM embeddings, generate_series(1, 64) AS t(gs)),
        |c0 AS (SELECT vec_id AS cid, pos, v FROM e WHERE vec_id < 8),
        |d1 AS (SELECT e.vec_id, c0.cid, sum((e.v - c0.v) * (e.v - c0.v)) AS sqd
        |  FROM e JOIN c0 ON e.pos = c0.pos GROUP BY e.vec_id, c0.cid),
        |a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sqd, cid) AS rn
        |  FROM d1) t WHERE rn = 1),
        |c1 AS (SELECT a1.cid, e.pos,
        |    (sum(e.v) + 20000 * count(*)) // count(*) - 20000 AS v
        |  FROM a1 JOIN e ON a1.vec_id = e.vec_id GROUP BY a1.cid, e.pos),
        |d2 AS (SELECT e.vec_id, c1.cid, sum((e.v - c1.v) * (e.v - c1.v)) AS sqd
        |  FROM e JOIN c1 ON e.pos = c1.pos GROUP BY e.vec_id, c1.cid),
        |a2 AS (SELECT vec_id, cid, sqd FROM (SELECT vec_id, cid, sqd,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sqd, cid) AS rn
        |  FROM d2) t WHERE rn = 1),
        |ck AS (SELECT cid, CAST(sum(v * pos) AS BIGINT) AS cent_ck
        |  FROM c1 GROUP BY cid)
        |SELECT a2.cid, count(*) AS n, CAST(sum(a2.sqd) AS BIGINT) AS sum_sqd,
        |  any_value(ck.cent_ck) AS cent_ck
        |FROM a2 JOIN ck ON a2.cid = ck.cid
        |GROUP BY a2.cid ORDER BY a2.cid""".stripMargin,

    // the FULL-replay read model — identical to feed_read_model's oracle:
    // the snapshot+tail merge must reproduce it bit for bit
    "feed_snapshot_resume" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |  CAST(floor(value * 10000) AS BIGINT) AS value_c, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,

    // the per-type aggregates come from the DIRECT filter — no chunk
    // logic — so any row lost or duplicated by the pruned scan mismatches;
    // the chunk counters replay the same zone-map arithmetic
    "zonemap_prune" ->
      """WITH zm AS (SELECT event_id // 100 AS chunk,
        |    min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |  FROM events GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks_total,
        |    CAST(sum(CASE WHEN mx >= 1704844800000000 AND mn < 1705449600000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_chunks_scanned FROM zm)
        |SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_v_c,
        |  st.n_chunks_total, st.n_chunks_scanned
        |FROM events, st
        |WHERE epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705449600000000
        |GROUP BY event_type, st.n_chunks_total, st.n_chunks_scanned
        |ORDER BY event_type""".stripMargin,

    "compaction_plan" ->
      """WITH f AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(date_part('hour', ts) AS BIGINT) AS hr,
        |    200 + 50 * count(*) AS bytes
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT day, hr, bytes,
        |    coalesce(sum(bytes) OVER (PARTITION BY day ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM f)
        |SELECT day, CAST(before // 16000 AS BIGINT) AS grp, count(*) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS tot_bytes,
        |  min(hr) AS hr_lo, max(hr) AS hr_hi
        |FROM g GROUP BY day, grp ORDER BY day, grp""".stripMargin,

    "manifest_diff" ->
      """WITH v1 AS (SELECT source, doc_id // 50 AS file_id,
        |    count(*) AS n_docs, sum(n_chars) AS bytes
        |  FROM documents
        |  WHERE doc_id <= (SELECT (max(doc_id) * 8) // 10 FROM documents)
        |  GROUP BY 1, 2),
        |v2 AS (SELECT source, doc_id // 50 AS file_id,
        |    count(*) AS n_docs, sum(n_chars) AS bytes
        |  FROM documents WHERE n_chars >= 120 GROUP BY 1, 2)
        |SELECT coalesce(v1.source, v2.source) AS source,
        |  coalesce(v1.file_id, v2.file_id) AS file_id,
        |  coalesce(v1.n_docs, 0) AS n1, coalesce(v2.n_docs, 0) AS n2,
        |  CASE WHEN v1.n_docs IS NULL THEN 'added'
        |       WHEN v2.n_docs IS NULL THEN 'removed'
        |       WHEN v1.n_docs = v2.n_docs AND v1.bytes = v2.bytes
        |         THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2
        |  ON v1.source = v2.source AND v1.file_id = v2.file_id
        |ORDER BY source, file_id""".stripMargin,

    "trend_fit_group" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us,
        |    CAST(floor(value * 100) AS BIGINT) AS y FROM events),
        |t0 AS (SELECT event_type, min(ts_us) AS t0 FROM ev GROUP BY 1),
        |xy AS (SELECT ev.event_type, (ts_us - t0) // 3600000000 AS x, y
        |  FROM ev JOIN t0 ON ev.event_type = t0.event_type),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy GROUP BY 1),
        |m AS (SELECT *, sx // n AS xb, sy // n AS yb FROM s),
        |r AS (SELECT event_type, n, xb, yb,
        |    sxy - xb * sy - yb * sx + n * xb * yb AS num,
        |    sxx - 2 * xb * sx + n * xb * xb AS den FROM m)
        |SELECT event_type, n, CAST(xb AS BIGINT) AS xb, CAST(yb AS BIGINT) AS yb,
        |  CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
        |  CAST(CASE WHEN num >= 0
        |       THEN (CAST(num AS HUGEINT) * 1000000) // den
        |       ELSE -((CAST(-num AS HUGEINT) * 1000000) // den)
        |       END AS BIGINT) AS slope_ppm
        |FROM r ORDER BY event_type""".stripMargin
  )
}
