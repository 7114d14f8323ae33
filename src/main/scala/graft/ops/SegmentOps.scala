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
      val wc = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wt = Window.partitionBy()
      val ranked = hist
        .withColumn("cum_lt", coalesce(sum("c").over(wc), lit(0L)))
        .withColumn("n", sum("c").over(wt))
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
