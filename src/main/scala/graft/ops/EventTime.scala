package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.io.Tables.canon

/** §2.7 event-time windows, batch mode (SURVEY.md). These are the exact
  * window semantics the streaming subscription path (graft.streaming) uses;
  * Spark evaluates `window()`/`session_window()` on static frames, which is
  * what makes them oracle-checkable. The streaming variants (watermarks,
  * state) are exercised in ScalaTest.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — partial aggregation applies, no per-key state. Session
  * windows shuffle once on user_id then sort-merge sessions within each
  * partition; at 100 TB the same plan holds (sessions are per-user local).
  */
object EventTime {

  /** events with a µs-precision event-time timestamp column `ets`. */
  private def evTs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ets", timestamp_micros(col("ts_us")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1h windows: per-hour, per-type counts/sums
    "stream_tumbling_1h" -> ((s, d) => {
      evTs(s, d)
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(canon(col("value"), 100)).as("val_c"))
        .select(unix_micros(col("window.start")).as("win_us"),
          col("event_type"), col("n"), col("val_c"))
        .orderBy("win_us", "event_type")
    }),

    // sliding 1h windows every 15 min: each event lands in 4 windows
    "stream_sliding_1h_15m" -> ((s, d) => {
      evTs(s, d)
        .groupBy(window(col("ets"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_us"), col("event_type"), col("n"))
        .orderBy("win_us", "event_type")
    }),

    // session windows: 30-min inactivity gap per user
    "stream_session_30m" -> ((s, d) => {
      evTs(s, d)
        .groupBy(session_window(col("ets"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"), col("n"))
        .orderBy("user_id", "start_us")
    })
  )

  def oracles: Map[String, String] = Map(
    "stream_tumbling_1h" ->
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS win_us,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS val_c
        |FROM events GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    "stream_sliding_1h_15m" ->
      """SELECT (epoch_us(ts) // 900000000) * 900000000 - k * 900000000 AS win_us,
        |  event_type, count(*) AS n
        |FROM events, unnest(generate_series(0, 3)) t(k)
        |GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    // gaps-and-islands; break at diff >= gap (Spark window end is exclusive)
    "stream_session_30m" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM m)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us, count(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin
  )
}
