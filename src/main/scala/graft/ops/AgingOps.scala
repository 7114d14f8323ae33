package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.api.TimeSeries

/** §2.39 aging & conversion-latency reports — the receivables-style
  * aging report over open orders and the time-to-convert distribution of
  * the event funnel, both on the value-histogram discipline.
  *
  * Scale shapes (100 TB notes):
  *  - orders_aging_report: age derives from a single-row max-day
  *    broadcast; the report is a |status|×|bucket| aggregate.
  *  - funnel_time_to_convert: conversion latencies come from the
  *    funnelStages aggregates (per-user, key-shuffled); the p50/p90 are
  *    conditional mins over the (days-latency) histogram — the latency
  *    domain is bounded, so no sort and no percentile_approx.
  */
object AgingOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aging buckets for orders by status, relative to the newest order
    // date: 0-30 / 31-60 / 61-90 / 90+ days, with counts and canon
    // value totals — the AR-aging shape every finance pipeline runs.
    "orders_aging_report" -> ((s, d) => {
      val ord = Tables.orders(s, d).select(col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"),
        floor(col("o_totalprice")).cast("long").as("tp"))
      val mx = ord.agg(max("day").as("mx"))
      ord.crossJoin(broadcast(mx))
        .withColumn("age", col("mx") - col("day"))
        .withColumn("bucket",
          when(col("age") <= 30, "00-30").when(col("age") <= 60, "31-60")
            .when(col("age") <= 90, "61-90").otherwise("90+"))
        .groupBy("o_orderstatus", "bucket")
        .agg(count(lit(1)).as("n_orders"), sum("tp").as("value"))
        .orderBy("o_orderstatus", "bucket")
    }),

    // Time-to-convert for the signup → click → purchase funnel: among
    // fully-converted users, the p50/p90 of (purchase − signup) in days,
    // per user bucket — conditional mins over the latency-day histogram.
    "funnel_time_to_convert" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val lat = TimeSeries.funnelStages(ev, col("user_id"),
          col("event_type"), col("ts_us"), Seq("signup", "click", "purchase"))
        .filter(col("t_2").isNotNull)
        .select((col("key") % 10).as("user_bucket"),
          expr("(t_2 - t_0) div 86400000000").as("lat_days"))
      val hist = lat.groupBy("user_bucket", "lat_days")
        .agg(count(lit(1)).as("c"))
      val wg = Window.partitionBy("user_bucket")
      val wc = Window.partitionBy("user_bucket").orderBy("lat_days")
      hist
        .withColumn("n", sum("c").over(wg))
        .withColumn("cum", sum("c").over(wc))
        .groupBy(col("user_bucket"), col("n").as("n_converted"))
        .agg(min(when(col("cum") * 100 >= col("n") * 50, col("lat_days")))
            .as("p50_days"),
          min(when(col("cum") * 100 >= col("n") * 90, col("lat_days")))
            .as("p90_days"))
        .select("user_bucket", "n_converted", "p50_days", "p90_days")
        .orderBy("user_bucket")
    })
  )

  def oracles: Map[String, String] = Map(
    "orders_aging_report" ->
      """WITH o AS (SELECT o_orderstatus,
        |    epoch_us(o_orderdate) // 86400000000 AS day,
        |    CAST(floor(o_totalprice) AS BIGINT) AS tp FROM orders),
        |m AS (SELECT max(day) AS mx FROM o),
        |a AS (SELECT o_orderstatus, m.mx - day AS age, tp FROM o, m),
        |b AS (SELECT o_orderstatus,
        |    CASE WHEN age <= 30 THEN '00-30' WHEN age <= 60 THEN '31-60'
        |      WHEN age <= 90 THEN '61-90' ELSE '90+' END AS bucket, tp
        |  FROM a)
        |SELECT o_orderstatus, bucket, count(*) AS n_orders,
        |  CAST(sum(tp) AS BIGINT) AS value
        |FROM b GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""".stripMargin,

    "funnel_time_to_convert" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s0 AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN us END) AS t0
        |  FROM e GROUP BY user_id),
        |s1 AS (SELECT e.user_id,
        |    min(CASE WHEN event_type = 'click' AND us > t0 THEN us END) AS t1
        |  FROM e JOIN s0 ON e.user_id = s0.user_id GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id,
        |    min(CASE WHEN event_type = 'purchase' AND us > t1 THEN us END) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id),
        |conv AS (SELECT s0.user_id % 10 AS user_bucket,
        |    (s2.t2 - s0.t0) // 86400000000 AS lat_days
        |  FROM s0 JOIN s2 ON s0.user_id = s2.user_id WHERE s2.t2 IS NOT NULL),
        |h AS (SELECT user_bucket, lat_days, count(*) AS c
        |  FROM conv GROUP BY 1, 2),
        |cm AS (SELECT *, CAST(sum(c) OVER (PARTITION BY user_bucket)
        |      AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY user_bucket ORDER BY lat_days)
        |      AS BIGINT) AS cum FROM h)
        |SELECT user_bucket, n AS n_converted,
        |  min(CASE WHEN cum * 100 >= n * 50 THEN lat_days END) AS p50_days,
        |  min(CASE WHEN cum * 100 >= n * 90 THEN lat_days END) AS p90_days
        |FROM cm GROUP BY 1, 2 ORDER BY user_bucket""".stripMargin
  )
}
