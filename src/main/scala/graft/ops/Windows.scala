package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.canon

/** §2.4 window functions + §2.5 sorts/limits/set ops (SURVEY.md).
  *
  * Scale notes: each window is one shuffle on its partition key; frames are
  * streaming (running/ROWS/RANGE) so no per-partition buffering beyond the
  * frame. Global top-k compiles to TakeOrderedAndProject (per-partition
  * heap + driver merge of k rows — no full sort at 100 TB). Set ops are
  * hash aggregates / joins on the shuffled key.
  */
object Windows {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // top-3 orders per customer by (totalprice desc, orderkey)
    "win_rank_topn_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          canon(col("o_totalprice"), 100).as("price_c"))
        .orderBy("o_custkey", "rn")
    }),

    // cumulative event value per user (exact: integer cents domain)
    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_c", sum(canon(col("value"), 100)).over(w))
        .select(col("event_id"), col("user_id"), col("running_c"))
        .orderBy("event_id")
    }),

    // per-user deltas between consecutive events
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .withColumn("prev_c", lag(canon(col("value"), 100), 1).over(w))
        .withColumn("next_c", lead(canon(col("value"), 100), 1).over(w))
        .withColumn("dt_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("prev_c"), col("next_c"), col("dt_us"))
        .orderBy("event_id")
    }),

    // moving average over previous 3 rows per supplier (ROWS frame)
    "win_sliding_frame" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-3, 0)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") < 20)
        .withColumn("mavg_c", canon(avg(canon(col("l_extendedprice"), 100)).over(w), 1))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("mavg_c"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // trailing-1-hour sum per user (RANGE frame over epoch_us)
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, d)
        .withColumn("hour_sum_c", sum(canon(col("value"), 100)).over(w))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("hour_sum_c"))
        .orderBy("event_id")
    }),

    // ranking family: quartiles, dense_rank, percent_rank. A naive
    // Window.orderBy with no partitionBy would move the whole table into
    // ONE partition; instead: 2-pass global rank — pass 1 builds a tiny
    // value-range histogram (|buckets| rows, broadcastable), pass 2 adds
    // per-bucket row_number to the broadcast cumulative offset. The sort
    // key (c_acctbal, c_custkey) is unique, so dense_rank ≡ rank ≡
    // row_number and percent_rank/ntile derive from the global rank in
    // closed form (ntile: first n%k buckets get ⌈n/k⌉ rows).
    // cume_dist + nth_value per nation (the two ranking-family functions
    // the rest of §2.4 doesn't cover): unique (acctbal, custkey) ordering
    // makes cume_dist deterministic; nth_value carries an EXPLICIT
    // rows-frame so both engines see the same frame semantics.
    "win_cume_nth" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("cume_c", Tables.canon(cume_dist().over(w)))
        .withColumn("second_key", nth_value(col("c_custkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("c_custkey"), col("c_nationkey"), col("cume_c"),
          col("second_key"))
        .orderBy("c_custkey")
    }),

    "win_ntile_dense" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val withB = cust.withColumn("b", floor(col("c_acctbal")).cast("long"))
      val wHist = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
      // histogram + running offsets: single-partition window, but only over
      // the ~1e4 distinct buckets, never over the data rows
      val offsets = withB.groupBy("b").agg(count(lit(1)).as("cb"))
        .withColumn("off", coalesce(sum("cb").over(wHist), lit(0L)))
        .select("b", "off")
      val wIn = Window.partitionBy("b").orderBy(col("c_acctbal"), col("c_custkey"))
      withB.join(broadcast(offsets), "b")
        .withColumn("rk", row_number().over(wIn).cast("long") + col("off"))
        .crossJoin(broadcast(cust.agg(count(lit(1)).as("n_total"))))
        .withColumn("quartile", expr(
          """CASE WHEN n_total DIV 4 = 0 THEN rk
            |     WHEN rk <= (n_total % 4) * (n_total DIV 4 + 1)
            |     THEN (rk - 1) DIV (n_total DIV 4 + 1) + 1
            |     ELSE (n_total % 4) + (rk - 1 - (n_total % 4) * (n_total DIV 4 + 1)) DIV (n_total DIV 4) + 1
            |END""".stripMargin))
        .withColumn("dr", col("rk"))
        // single-row table: percent_rank is defined as 0, not 0/0
        .withColumn("pr_c", canon(when(col("n_total") === 1, lit(0.0))
          .otherwise((col("rk") - 1).cast("double") / (col("n_total") - 1))))
        .select(col("c_custkey"), col("quartile"), col("dr"), col("pr_c"))
        .orderBy("c_custkey")
    }),

    // global top-20 by (extendedprice desc, orderkey, linenumber)
    "sort_multikey_topk" -> ((s, d) => {
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
        .select(col("l_orderkey"), col("l_linenumber"),
          canon(col("l_extendedprice"), 100).as("price_c"))
    }),

    // customer nations ∪ supplier nations (UNION distinct)
    "set_union_distinct" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")
    }),

    // purchasers ∩ users-with-errors
    "set_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .intersect(ev.filter(col("event_type") === "error").select("user_id"))
        .orderBy("user_id")
    }),

    // viewers ∖ purchasers
    "set_except" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "view").select("user_id")
        .except(ev.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "win_cume_nth" ->
      """SELECT c_custkey, c_nationkey,
        |  CAST(floor(cume_dist() OVER w * 10000) AS BIGINT) AS cume_c,
        |  nth_value(c_custkey, 2) OVER
        |    (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_rank_topn_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
        |FROM events ORDER BY event_id""".stripMargin,

    "win_lag_lead" ->
      """SELECT event_id, user_id,
        |  lag(CAST(floor(value * 100) AS BIGINT), 1) OVER w AS prev_c,
        |  lead(CAST(floor(value * 100) AS BIGINT), 1) OVER w AS next_c,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS dt_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,

    "win_sliding_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(floor(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS BIGINT) AS mavg_c
        |FROM lineitem WHERE l_suppkey < 20
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "win_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_sum_c
        |FROM events ORDER BY event_id""".stripMargin,

    "win_ntile_dense" ->
      """SELECT c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  dense_rank() OVER w AS dr,
        |  CAST(floor(percent_rank() OVER w * 10000) AS BIGINT) AS pr_c
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "sort_multikey_topk" ->
      """SELECT l_orderkey, l_linenumber, CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,

    "set_except" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin
  )
}
