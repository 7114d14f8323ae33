package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.38 behavioral segmentation & distribution normalization — RFM
  * customer segments, order→ship latency quantiles, and percentile-rank
  * feature normalization, each built on the repo's 2-pass histogram
  * discipline (value-bounded relations carry every window; data rows
  * only ever pass through map-side-combinable aggregates).
  *
  * Scale shapes (100 TB notes):
  *  - rfm_segments: one pass over events → per-user (recency, frequency,
  *    monetary); fixed deterministic score bands (no data-dependent
  *    quantile boundaries) make scoring a pure projection; the segment
  *    report is a 5³-cell aggregate.
  *  - ship_latency_quantiles: latency domain is bounded (days), so
  *    exact p50/p90 come from cumulative sums over the (priority,
  *    latency) histogram — no sort, no percentile_approx.
  *  - score_percentile_norm: percentile ranks assigned by joining each
  *    doc's score bucket against the bucket histogram's cumulative
  *    counts — the 2-pass global-rank pattern, output data-sized but
  *    windows histogram-sized.
  */
object SegmentOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RFM segmentation: per user, recency (days before the feed's last
    // day), frequency (events), monetary (Σ canon value); fixed bands →
    // scores 1..5 each; report per (r, f, m) segment with user count and
    // mean monetary (integer). Fixed bands keep scoring a projection —
    // a quantile-banded variant would reuse the histogram pattern.
    "rfm_segments" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(expr("ts_us div 86400000000")).as("last_day"),
          count(lit(1)).as("freq"),
          sum(floor(col("value") * 10000).cast("long")).as("mon"))
      val scored = perUser
        .withColumn("max_day", max("last_day").over(Window.partitionBy()))
        .withColumn("rec_days", col("max_day") - col("last_day"))
        .withColumn("r", when(col("rec_days") <= 1, 5L)
          .when(col("rec_days") <= 3, 4L).when(col("rec_days") <= 7, 3L)
          .when(col("rec_days") <= 14, 2L).otherwise(1L))
        .withColumn("f", when(col("freq") >= 200, 5L)
          .when(col("freq") >= 100, 4L).when(col("freq") >= 50, 3L)
          .when(col("freq") >= 20, 2L).otherwise(1L))
        .withColumn("m", when(col("mon") >= 5000000L, 5L)
          .when(col("mon") >= 2000000L, 4L).when(col("mon") >= 1000000L, 3L)
          .when(col("mon") >= 500000L, 2L).otherwise(1L))
      scored.groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_users"),
          expr("sum(mon) div count(1)").as("mean_mon_c"))
        .orderBy("r", "f", "m")
    }),

    // Exact p50/p90 order→ship latency per order priority from the
    // (priority, latency-day) histogram: smallest latency whose
    // cumulative count reaches the target rank — integer compares only.
    "ship_latency_quantiles" -> ((s, d) => {
      val lat = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
            .as("ship_day"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("order_day")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          (col("ship_day") - col("order_day")).as("lat"))
      val hist = lat.groupBy("o_orderpriority", "lat")
        .agg(count(lit(1)).as("c"))
      val wg = Window.partitionBy("o_orderpriority")
      val wc = Window.partitionBy("o_orderpriority").orderBy("lat")
      // BOTH quantiles from ONE pass over the cumulative histogram —
      // conditional mins, so the fact join and histogram build are never
      // duplicated per quantile
      hist
        .withColumn("n", sum("c").over(wg))
        .withColumn("cum", sum("c").over(wc))
        .groupBy("o_orderpriority")
        .agg(min(when(col("cum") * 100 >= col("n") * 50, col("lat")))
            .as("p50_days"),
          min(when(col("cum") * 100 >= col("n") * 90, col("lat")))
            .as("p90_days"))
        .orderBy("o_orderpriority")
    }),

    // Weekly growth accounting — the canonical product-analytics
    // decomposition: per week, users who are NEW (first-ever activity),
    // RETAINED (active this week and last), RESURRECTED (active this
    // week, inactive last, not new) and CHURNED (active last week, not
    // this). All flags derive from the per-(user, week) activity
    // relation with user-partitioned lags; churn attributes to the week
    // AFTER the last active one.
    "growth_accounting_weekly" -> ((s, d) => {
      val weekUs = 604800000000L
      val uw = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div ${weekUs}L").as("wk"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("wk")
      val flagged = uw
        .withColumn("first_wk", min("wk").over(
          Window.partitionBy("user_id")))
        .withColumn("prev_wk", lag("wk", 1).over(w))
        .withColumn("next_wk", lead("wk", 1).over(w))
      val active = flagged.select(col("wk"),
        when(col("wk") === col("first_wk"), 1L).otherwise(0L).as("is_new"),
        when(col("prev_wk") === col("wk") - 1, 1L).otherwise(0L)
          .as("is_retained"),
        when(col("wk") =!= col("first_wk") &&
          (col("prev_wk").isNull || col("prev_wk") < col("wk") - 1), 1L)
          .otherwise(0L).as("is_resurrected"))
      val churn = flagged
        .filter(col("next_wk").isNull || col("next_wk") > col("wk") + 1)
        .groupBy((col("wk") + 1).as("wk"))
        .agg(count(lit(1)).as("n_churned"))
      active.groupBy("wk")
        .agg(count(lit(1)).as("n_active"), sum("is_new").as("n_new"),
          sum("is_retained").as("n_retained"),
          sum("is_resurrected").as("n_resurrected"))
        .join(churn, Seq("wk"), "left")
        .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
        .orderBy("wk")
    }),

    // ABC × XYZ inventory matrix: ABC = revenue class (top-20% of parts
    // by revenue = A, next 30% = B, rest = C, via the 2-pass revenue
    // histogram rank), XYZ = demand variability class from the integer
    // squared coefficient of variation of weekly quantities
    // (cv²·1e6 = (n·Σx² − (Σx)²)·1e6 div (Σx)² — no sqrt). Counts per
    // cell — the stocking-policy planning grid.
    "abc_xyz_matrix" -> ((s, d) => {
      val weekUs = 604800000000L
      val wk = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("unix_micros(cast(l_shipdate as timestamp)) div " +
            s"${weekUs}L").as("wk"),
          floor(col("l_quantity")).cast("long").as("q"))
        .groupBy("l_partkey", "wk").agg(sum("q").as("x"))
      val parts = wk.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      // ABC rank via the 2-pass VALUE-histogram (cume over distinct
      // revenue values, value-bounded) — never a data-sized global window
      val hist = parts.groupBy("sx").agg(count(lit(1)).as("c"))
      val ranked = graft.api.Histograms.cumulativeFold(hist, col("sx"),
          Seq(graft.api.Histograms.CumSpec(col("c"), "cum_ge", Some("np"))),
          ascending = false, inclusive = true)
        .select(col("sx"), expr("(cum_ge * 1000000) div np").as("rank_ppm"))
      val perPart = parts.join(ranked, "sx")
        .withColumn("abc", when(col("rank_ppm") <= 200000, "A")
          .when(col("rank_ppm") <= 500000, "B").otherwise("C"))
        .withColumn("cv2_ppm", expr(
          "((n * sxx - sx * sx) * 1000000) div (sx * sx)"))
        .withColumn("xyz", when(col("cv2_ppm") <= 100000, "X")
          .when(col("cv2_ppm") <= 400000, "Y").otherwise("Z"))
      perPart.groupBy("abc", "xyz")
        .agg(count(lit(1)).as("n_parts"), sum("sx").as("total_qty"))
        .orderBy("abc", "xyz")
    }),

    // Percentile-rank normalization of a per-doc quality score
    // (type-token ratio in ppm): pctl_ppm = rows with a strictly
    // smaller bucket ·1e6 div (n−1), assigned by joining each doc's
    // bucket against the bucket histogram's cumulative counts. Output is
    // data-sized; every window is histogram-sized.
    "score_percentile_norm" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 1)
        .withColumn("score",
          expr("(size(array_distinct(tks)) * 1000000) div size(tks)"))
        .select("doc_id", "score")
      val hist = scored.groupBy("score").agg(count(lit(1)).as("c"))
      val ranked = graft.api.Histograms.cumulativeFold(hist, col("score"),
        Seq(graft.api.Histograms.CumSpec(col("c"), "cum_lt", Some("n"))))
      scored.join(ranked.select("score", "cum_lt", "n"), "score")
        .withColumn("pctl_ppm",
          expr("(cum_lt * 1000000) div (n - 1)"))
        .select("doc_id", "score", "pctl_ppm")
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "rfm_segments" ->
      """WITH u AS (SELECT user_id,
        |    max(epoch_us(ts) // 86400000000) AS last_day,
        |    count(*) AS freq,
        |    CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS mon
        |  FROM events GROUP BY 1),
        |m AS (SELECT *, CAST(max(last_day) OVER () AS BIGINT) AS max_day
        |  FROM u),
        |sc AS (SELECT *, max_day - last_day AS rec_days,
        |    CASE WHEN max_day - last_day <= 1 THEN 5
        |      WHEN max_day - last_day <= 3 THEN 4
        |      WHEN max_day - last_day <= 7 THEN 3
        |      WHEN max_day - last_day <= 14 THEN 2 ELSE 1 END AS r,
        |    CASE WHEN freq >= 200 THEN 5 WHEN freq >= 100 THEN 4
        |      WHEN freq >= 50 THEN 3 WHEN freq >= 20 THEN 2 ELSE 1 END AS f,
        |    CASE WHEN mon >= 5000000 THEN 5 WHEN mon >= 2000000 THEN 4
        |      WHEN mon >= 1000000 THEN 3 WHEN mon >= 500000 THEN 2
        |      ELSE 1 END AS m
        |  FROM m)
        |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        |  CAST(m AS BIGINT) AS m, count(*) AS n_users,
        |  CAST(sum(mon) // count(*) AS BIGINT) AS mean_mon_c
        |FROM sc GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin,

    "growth_accounting_weekly" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS wk FROM events),
        |f AS (SELECT *, min(wk) OVER (PARTITION BY user_id) AS first_wk,
        |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
        |    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        |  FROM uw),
        |act AS (SELECT wk, count(*) AS n_active,
        |    CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN wk <> first_wk AND (prev_wk IS NULL
        |      OR prev_wk < wk - 1) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_resurrected
        |  FROM f GROUP BY 1),
        |ch AS (SELECT wk + 1 AS wk, count(*) AS n_churned FROM f
        |  WHERE next_wk IS NULL OR next_wk > wk + 1 GROUP BY 1)
        |SELECT act.wk, act.n_active, act.n_new, act.n_retained,
        |  act.n_resurrected,
        |  CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
        |FROM act LEFT JOIN ch ON act.wk = ch.wk
        |ORDER BY act.wk""".stripMargin,

    "abc_xyz_matrix" ->
      """WITH wq AS (SELECT l_partkey,
        |    epoch_us(l_shipdate) // 604800000000 AS wk,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT l_partkey, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx FROM wq GROUP BY 1),
        |h AS (SELECT sx, count(*) AS c FROM p GROUP BY 1),
        |r AS (SELECT sx, CAST(sum(c) OVER (ORDER BY sx DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_ge,
        |    CAST(sum(c) OVER () AS BIGINT) AS np FROM h),
        |j AS (SELECT p.*, (r.cum_ge * 1000000) // r.np AS rank_ppm,
        |    ((p.n * p.sxx - p.sx * p.sx) * 1000000) // (p.sx * p.sx)
        |      AS cv2_ppm
        |  FROM p JOIN r ON p.sx = r.sx),
        |cls AS (SELECT sx,
        |    CASE WHEN rank_ppm <= 200000 THEN 'A'
        |      WHEN rank_ppm <= 500000 THEN 'B' ELSE 'C' END AS abc,
        |    CASE WHEN cv2_ppm <= 100000 THEN 'X'
        |      WHEN cv2_ppm <= 400000 THEN 'Y' ELSE 'Z' END AS xyz
        |  FROM j)
        |SELECT abc, xyz, count(*) AS n_parts,
        |  CAST(sum(sx) AS BIGINT) AS total_qty
        |FROM cls GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin,

    "ship_latency_quantiles" ->
      """WITH lat AS (SELECT o.o_orderpriority,
        |    epoch_us(l.l_shipdate) // 86400000000
        |      - epoch_us(o.o_orderdate) // 86400000000 AS lat
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h AS (SELECT o_orderpriority, lat, count(*) AS c
        |  FROM lat GROUP BY 1, 2),
        |cm AS (SELECT *, CAST(sum(c) OVER (PARTITION BY o_orderpriority)
        |      AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY o_orderpriority ORDER BY lat)
        |      AS BIGINT) AS cum FROM h)
        |SELECT o_orderpriority,
        |  min(CASE WHEN cum * 100 >= n * 50 THEN lat END) AS p50_days,
        |  min(CASE WHEN cum * 100 >= n * 90 THEN lat END) AS p90_days
        |FROM cm GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "score_percentile_norm" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS tks FROM documents
        |           WHERE len(str_split(text, ' ')) >= 1),
        |sc AS (SELECT doc_id,
        |    (CAST(len(list_distinct(tks)) AS BIGINT) * 1000000)
        |      // CAST(len(tks) AS BIGINT) AS score FROM t),
        |h AS (SELECT score, count(*) AS c FROM sc GROUP BY 1),
        |r AS (SELECT score,
        |    CAST(coalesce(sum(c) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_lt,
        |    CAST(sum(c) OVER () AS BIGINT) AS n FROM h)
        |SELECT sc.doc_id, sc.score,
        |  (r.cum_lt * 1000000) // (r.n - 1) AS pctl_ppm
        |FROM sc JOIN r ON sc.score = r.score
        |ORDER BY sc.doc_id""".stripMargin
  )
}
