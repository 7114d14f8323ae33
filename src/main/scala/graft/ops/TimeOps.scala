package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.api.TimeSeries
import graft.io.Tables
import graft.io.Tables.{canon, canon100}

/** §2.16 temporal analytics — regular-grid resampling with forward fill,
  * ordered funnel conversion, and per-type inter-arrival statistics over
  * the event feed. All oracle-checked; values are quantized BEFORE any
  * fill/sum so every output is integer-exact and shuffle-order
  * independent.
  *
  * Scale shapes:
  *  - resample: events reduce to one row per (user, hour) map-side, the
  *    grid explodes from per-key spans (size = span/bucket, independent
  *    of event volume), and the fill window is PARTITIONED by user;
  *  - funnel: one user-keyed conditional aggregate per stage;
  *  - inter-arrival deltas: windows PARTITIONED by (type, user) — never
  *    a handful of giant per-type partitions.
  */
object TimeOps {

  private val HourUs = 3600000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hourly resample + forward fill for users < 10: each hour bucket in
    // a user's own activity span carries the hour's LAST value
    // (canonicalized before the fill, so carried values are integers);
    // empty hours inherit the previous hour and are flagged as gaps.
    "ts_resample_ffill" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") < 10)
      TimeSeries.resampleFfill(ev, col("user_id"), col("ts_us"),
          canon(col("value")), col("event_id"), HourUs)
        .select(col("key").as("user_id"), col("bucket").as("h"),
          col("filled").as("filled_c"), col("gap"))
        .orderBy("user_id", "h")
    }),

    // Ordered signup → click → purchase funnel: per user the first
    // signup, the first click AFTER it, the first purchase after THAT;
    // aggregated to per-decile conversion counts.
    "funnel_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d)
      TimeSeries.funnelStages(ev, col("user_id"), col("event_type"),
          col("ts_us"), Seq("signup", "click", "purchase"))
        .groupBy((col("key") % 10).as("user_bucket"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("t_0").isNotNull, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("t_1").isNotNull, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("t_2").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
        .orderBy("user_bucket")
    }),

    // Per-type inter-arrival statistics: consecutive same-type deltas
    // WITHIN each user (window partitioned by (type, user) — at 100 TB a
    // per-type-only window would be 5 giant partitions), aggregated to
    // per-type n / min / max / floor-canon mean seconds.
    "ts_interarrival_stats" -> ((s, d) => {
      val w = Window.partitionBy("event_type", "user_id")
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .withColumn("delta_us", col("ts_us") - col("prev_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_deltas"),
          min(col("delta_us")).as("min_us"),
          max(col("delta_us")).as("max_us"),
          canon100(sum(col("delta_us")) * lit(1.0) /
            (count(lit(1)) * lit(1000000.0))).as("mean_sec_c"))
        .orderBy("event_type")
    }),

    // CUSUM mean-shift screen: per (type, user) series, the running sum
    // of centi-canon deviations from the SERIES integer mean; the
    // changepoint candidate is the |cusum| peak. Per type, report the
    // user whose series deviates hardest. Windows are per-series (the
    // file's scale rule — never 5 giant per-type partitions), and both
    // argmax selections are max(struct(...)) aggregates, not sorts:
    // (mac, −event_id) picks the peak then the EARLIEST event on ties,
    // (mac, −user_id) picks the strongest series then the smallest user
    // — unique tiebreakers make both selections total.
    "ts_changepoint_cusum" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("event_id"),
          col("ts_us"), canon(col("value"), 100L).as("y"))
      val st = ev.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"))
        .select(col("event_type"), col("user_id"), col("n"),
          expr("sy div n").as("yb")) // sy ≥ 0 (values non-negative) → div ≡ //
      val w = Window.partitionBy("event_type", "user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val peak = ev.join(st, Seq("event_type", "user_id"))
        .withColumn("cusum", sum(col("y") - col("yb")).over(w))
        .groupBy("event_type", "user_id")
        .agg(max(struct(abs(col("cusum")).as("mac"),
          (-col("event_id")).as("ne"), col("ts_us").as("ts"),
          col("n").as("n"))).as("p"))
      peak.groupBy("event_type")
        .agg(max(struct(col("p.mac").as("mac"),
          (-col("user_id")).as("nu"), col("p.ne").as("ne"),
          col("p.ts").as("ts"), col("p.n").as("n"))).as("b"))
        .select(col("event_type"), (-col("b.nu")).as("user_id"),
          col("b.n").as("n"), col("b.mac").as("max_abs_cusum"),
          (-col("b.ne")).as("cp_event_id"), col("b.ts").as("cp_ts_us"))
        .orderBy("event_type")
    }),

    // Period-over-period change: weekly canon-value sums per event type,
    // each week vs the previous OBSERVED week (lag over the |type×week|
    // aggregate relation — the window input is period-count-sized at any
    // data volume). Delta in canon units; relative change in integer ppm
    // via sign·(|Δ|·10⁶ div prev), rows emitted only where a previous
    // week exists and prev > 0 (integer div by zero diverges between
    // engines: Spark nulls, DuckDB errors).
    "ts_period_over_period" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts_us div 604800000000").as("week"))
        .agg(sum(canon(col("value"))).as("v"))
      val w = Window.partitionBy("event_type").orderBy("week")
      wk.withColumn("prev", lag(col("v"), 1).over(w))
        .filter(col("prev").isNotNull && col("prev") > 0)
        .select(col("event_type"), col("week"), col("v"), col("prev"),
          (col("v") - col("prev")).as("delta"),
          (signum(col("v") - col("prev")).cast("long") *
            expr("(abs(v - prev) * 1000000) div prev")).as("pct_ppm"))
        .orderBy("event_type", "week")
    }),

    // Marketing attribution, last-touch: each purchase is credited to
    // the most recent PRIOR click/view by the same user (strictly-before
    // frame; 'none' when the purchase has no prior touch). Purchase
    // counts and canon value sums per touch channel — 3 rows out.
    "attribution_touch" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"), canon(col("value")).as("vc"))
        .withColumn("touch",
          last(when(col("event_type").isin("click", "view"),
            col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("touch"), lit("none")).as("touch"), col("vc"))
        .groupBy("touch")
        .agg(count(lit(1)).as("n_purchases"), sum("vc").as("sum_value_c"))
        .orderBy("touch")
    }),

    // Batch sessionization with explicit session IDs: a >30-min silence
    // starts a new session (cumulative-flag gaps-and-islands, window
    // PARTITIONED by user); per session: event count, span, distinct
    // types, canon value sum. The session-ID twin of the windowed
    // stream_session_30m counts.
    "sessionize_ids" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"),
          max("ts_us").as("end_us"),
          countDistinct("event_type").as("n_types"),
          sum(canon(col("value"))).as("sum_value_c"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "sid")
    }),

    // Interval-union coverage: treat each event as a 5-minute activity
    // interval and measure, per user, the UNION length of those
    // overlapping intervals plus the island count — the dedup-then-sum
    // every billing/engagement meter needs (naively summing intervals
    // double-counts overlap). Islands via gaps-and-islands on the
    // running max end; all windows user-partitioned, all integers µs.
    "ts_interval_union_coverage" -> ((s, d) => {
      val len = 300000000L // 5 min in µs
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val runMaxPrev = max(col("ts_us") + len)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val marked = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("pmax", runMaxPrev)
        .withColumn("new_island",
          when(col("pmax").isNull || col("ts_us") > col("pmax"), 1L).otherwise(0L))
        .withColumn("iid", sum(col("new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy("user_id", "iid")
        .agg(min(col("ts_us")).as("is_start"),
          max(col("ts_us") + len).as("is_end"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("is_end") - col("is_start")).as("covered_us"))
        .orderBy("user_id")
    }),

    // Top user journeys: each 30-min-gap session reduced to its first-3
    // event-type path, the 20 most common paths ranked — the "what do
    // sessions actually look like" report next to the Markov pair view
    // (event_path_transitions sees edges; this sees whole openings).
    // Same gaps-and-islands sessionization as sessionize_ids; paths
    // assemble via struct-sorted collect (no cross-engine string_agg
    // ordering ambiguity); all windows user-/session-partitioned.
    "session_path_topk" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val sess = Tables.events(s, d)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wS = Window.partitionBy("user_id", "sid")
        .orderBy(col("ts_us"), col("event_id"))
      sess.withColumn("rn", row_number().over(wS))
        .filter(col("rn") <= 3)
        .groupBy("user_id", "sid")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type").as("t")))),
          x => x.getField("t")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
        .orderBy(col("n_sessions").desc, col("path"))
    }),

    // Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    // slopes over the daily-count series — outlier-days can't drag the
    // fit the way least squares lets them. The pair relation is
    // CALENDAR² per type (days × days — grows with time, never with
    // data rows), slopes floor-quantize through one exact double ratio
    // (numerators can be negative, so floor-of-ratio, never integer
    // div), and the median is the DOUBLED-midrank pick (sum of the two
    // middle order statistics) — all-integer output, no percentile
    // interpolation to match across engines.
    "ts_theil_sen_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val a = daily.select(col("event_type"), col("day").as("d1"), col("c").as("c1"))
      val b = daily.select(col("event_type"), col("day").as("d2"), col("c").as("c2"))
      val pairs = a.join(b, Seq("event_type")).where(col("d1") < col("d2"))
        .withColumn("slope_c",
          floor((col("c2") - col("c1")) * lit(1000000.0) / (col("d2") - col("d1")))
            .cast("long"))
      val w = Window.partitionBy("event_type").orderBy("slope_c")
      pairs
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
        // doubled median: weight 2 when the lower and upper middle
        // positions coincide (odd n), 1+1 otherwise — integer `div` only
        .withColumn("wt",
          (col("rn") === expr("(np + 1) div 2")).cast("long") +
            (col("rn") === expr("np div 2 + 1")).cast("long"))
        .filter(col("wt") > 0)
        .groupBy("event_type")
        .agg(first(col("np")).as("n_pairs"),
          sum(col("slope_c") * col("wt")).as("med2_slope_c"))
        .join(daily.groupBy("event_type").agg(count(lit(1)).as("n_days")), Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("n_pairs"), col("med2_slope_c"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "ts_interval_union_coverage" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |m AS (SELECT *, max(us + 300000000) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM e),
        |f AS (SELECT *, CASE WHEN pmax IS NULL OR us > pmax THEN 1 ELSE 0 END
        |    AS ni FROM m),
        |s AS (SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid FROM f),
        |isl AS (SELECT user_id, iid, min(us) AS is_start,
        |    max(us + 300000000) AS is_end
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(is_end - is_start) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,

    "session_path_topk" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM l),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |    ORDER BY us, event_id) AS rn FROM s),
        |p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    "ts_theil_sen_trend" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(floor((b.c - a.c) * 1000000.0 / (b.day - a.day)) AS BIGINT) AS slope_c
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (SELECT event_type, slope_c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope_c) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS np
        |  FROM p),
        |m AS (SELECT event_type, np,
        |    CAST(sum(slope_c * (CASE WHEN rn = (np + 1) // 2 THEN 1 ELSE 0 END
        |      + CASE WHEN rn = np // 2 + 1 THEN 1 ELSE 0 END)) AS BIGINT) AS med2_slope_c
        |  FROM r WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
        |  GROUP BY event_type, np)
        |SELECT m.event_type, d.n_days, m.np AS n_pairs, m.med2_slope_c
        |FROM m JOIN (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1) d
        |  USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "sessionize_ids" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type, CAST(floor(value * 10000) AS BIGINT) AS vc FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |        THEN 1 ELSE 0 END AS new_sess FROM l),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |  CAST(sum(vc) AS BIGINT) AS sum_value_c,
        |  max(us) - min(us) AS dur_us
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,

    "ts_resample_ffill" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 10000) AS BIGINT) AS v
        |  FROM events WHERE user_id < 10),
        |hr AS (SELECT user_id, h, v FROM (
        |    SELECT user_id, us // 3600000000 AS h, v,
        |      row_number() OVER (PARTITION BY user_id, us // 3600000000
        |        ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hr GROUP BY user_id),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span),
        |f AS (SELECT g.user_id, g.h, arg_max(hr.v, hr.h) AS filled_c
        |  FROM g JOIN hr ON hr.user_id = g.user_id AND hr.h <= g.h
        |  GROUP BY g.user_id, g.h)
        |SELECT f.user_id, f.h, f.filled_c,
        |  CASE WHEN hr2.v IS NULL THEN 1 ELSE 0 END AS gap
        |FROM f LEFT JOIN hr hr2 ON hr2.user_id = f.user_id AND hr2.h = f.h
        |ORDER BY f.user_id, f.h""".stripMargin,

    "funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s0 AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN us END) AS t0
        |  FROM e GROUP BY user_id),
        |s1 AS (SELECT e.user_id,
        |    min(CASE WHEN event_type = 'click' AND us > t0 THEN us END) AS t1
        |  FROM e JOIN s0 ON e.user_id = s0.user_id GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id,
        |    min(CASE WHEN event_type = 'purchase' AND us > t1 THEN us END) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id)
        |SELECT s0.user_id % 10 AS user_bucket, count(*) AS n_users,
        |  CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM s0 JOIN s1 ON s0.user_id = s1.user_id
        |  JOIN s2 ON s0.user_id = s2.user_id
        |GROUP BY user_bucket ORDER BY user_bucket""".stripMargin,

    "ts_interarrival_stats" ->
      """WITH e AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS us
        |    FROM events),
        |d AS (SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY event_type, user_id
        |      ORDER BY us, event_id) AS delta_us
        |  FROM e)
        |SELECT event_type, count(*) AS n_deltas,
        |  min(delta_us) AS min_us, max(delta_us) AS max_us,
        |  CAST(floor((CAST(sum(delta_us) AS DOUBLE) / (count(*) * 1000000.0)) * 100)
        |    AS BIGINT) AS mean_sec_c
        |FROM d WHERE delta_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // row_number selections replicate the max(struct) tiebreaks exactly:
    // (mac DESC, event_id ASC) within a series, (mac DESC, user_id ASC)
    // across series — both orders are total (unique final key)
    "ts_changepoint_cusum" ->
      """WITH e AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
        |    CAST(floor(value * 100) AS BIGINT) AS y FROM events),
        |st AS (SELECT event_type, user_id, count(*) AS n, sum(y) // count(*) AS yb
        |  FROM e GROUP BY 1, 2),
        |cs AS (SELECT e.event_type, e.user_id, e.event_id, e.us, st.n,
        |    sum(e.y - st.yb) OVER (PARTITION BY e.event_type, e.user_id
        |      ORDER BY e.us, e.event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM e JOIN st ON e.event_type = st.event_type AND e.user_id = st.user_id),
        |pk AS (SELECT event_type, user_id, n, abs(cusum) AS mac, event_id, us
        |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type, user_id
        |      ORDER BY abs(cusum) DESC, event_id) AS rn FROM cs) t
        |  WHERE rn = 1)
        |SELECT event_type, user_id, n, CAST(mac AS BIGINT) AS max_abs_cusum,
        |  event_id AS cp_event_id, us AS cp_ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY mac DESC, user_id) AS rn FROM pk) t
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "ts_period_over_period" ->
      """WITH wk AS (SELECT event_type, epoch_us(ts) // 604800000000 AS week,
        |    sum(CAST(floor(value * 10000) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT *, lag(v) OVER (PARTITION BY event_type ORDER BY week) AS prev
        |  FROM wk)
        |SELECT event_type, week, CAST(v AS BIGINT) AS v,
        |  CAST(prev AS BIGINT) AS prev, CAST(v - prev AS BIGINT) AS delta,
        |  CAST(CASE WHEN v >= prev THEN (abs(v - prev) * 1000000) // prev
        |       ELSE -((abs(v - prev) * 1000000) // prev) END AS BIGINT) AS pct_ppm
        |FROM l WHERE prev IS NOT NULL AND prev > 0
        |ORDER BY event_type, week""".stripMargin,

    "attribution_touch" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS vc FROM events),
        |t AS (SELECT *, last_value(CASE WHEN event_type IN ('click', 'view')
        |      THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM e)
        |SELECT coalesce(touch, 'none') AS touch, count(*) AS n_purchases,
        |  CAST(sum(vc) AS BIGINT) AS sum_value_c
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch""".stripMargin
  )
}
