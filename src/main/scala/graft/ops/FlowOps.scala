package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.44 flows, balances & value accounting (added round 6): the
  * time-weighted average, segmented running sums with resets, a daily
  * open-order backlog (the inventory-balance shape), order-vs-lines
  * reconciliation (a data-quality invariant every billing pipeline
  * checks), a simple CLV projection, and association-rule
  * confidence/lift over co-purchase baskets.
  *
  * Determinism: values quantized before any sum (floor(v·1e4),
  * cents for money), durations in integer microseconds, shares in
  * integer ppm, bucket labels derived from integer digit counts — no
  * float ever crosses an aggregate boundary.
  *
  * Scale shapes (100 TB notes):
  *  - twap_time_weighted: one lead() per event under a (type)-partitioned
  *    window, then ONE combinable aggregate — Σv·Δt and ΣΔt both exact.
  *  - win_reset_running_sum: two stacked user-partitioned windows
  *    (segment id = count of preceding resets, then the per-segment
  *    running sum) — the standard gaps-and-islands decomposition; no
  *    global window anywhere.
  *  - orders_backlog_daily: the only window runs over the DAY histogram
  *    (calendar-bounded), after two keyed pre-aggregations.
  *  - dq_order_reconcile: per-order line sums shuffle once on orderkey;
  *    the report is a |buckets|-sized aggregate.
  *  - basket_rules_lift: pair generation is ORDER-LOCAL off the per-order
  *    item sets (never a global self-join); supports join back on the
  *    item keys; the single-row order count broadcasts.
  */
object FlowOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Time-weighted average of `value` per event type: each reading
    // holds until the next one (step interpolation), TWAP = Σ v·Δt div
    // ΣΔt over the type's full span — vs the unweighted mean carried
    // alongside (the two diverge exactly when readings cluster).
    "twap_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .select(col("event_type"), col("ts_us"), col("event_id"),
          floor(col("value") * 10000).cast("long").as("v_c"))
        .withColumn("dt", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .filter(col("dt").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("v_c") * col("dt")).as("wsum"),
          sum(col("dt")).as("span_us"),
          sum(col("v_c")).as("vsum"))
        .withColumn("twap_c", expr("wsum div span_us"))
        .withColumn("mean_c", expr("vsum div n_intervals"))
        .select("event_type", "n_intervals", "span_us", "twap_c", "mean_c")
        .orderBy("event_type")
    }),

    // Segmented running sum with resets (gaps-and-islands): per user in
    // time order, a running total of value that RESETS after each
    // purchase — segment id = purchases strictly before the row, so a
    // purchase row closes (and belongs to) its own segment. Bounded
    // user panel (user_id < 200) keeps the output a fixture-sized
    // relation; the shape is two stacked partitioned windows.
    "win_reset_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val seg = Tables.events(s, d)
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("flag"),
          floor(col("value") * 10000).cast("long").as("v_c"))
        .withColumn("seg", coalesce(sum("flag").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val wSeg = Window.partitionBy("user_id", "seg")
        .orderBy("ts_us", "event_id")
      seg.withColumn("run_c", sum("v_c").over(wSeg))
        .select("user_id", "event_id", "seg", "run_c")
        .orderBy("user_id", "event_id")
    }),

    // Daily open-order backlog: orders open on day D = cumulative
    // opened (by order date) − cumulative fulfilled (an order is done
    // when its LAST line ships). The cumulative windows run over the
    // calendar-day histogram only.
    "orders_backlog_daily" -> ((s, d) => {
      val opened = Tables.orders(s, d)
        .groupBy(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_open"))
      val done = Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(max(unix_micros(col("l_shipdate").cast("timestamp"))).as("fus"))
        .groupBy(expr("fus div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_done"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      opened.join(done, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_open"), lit(0L)).as("n_open"),
          coalesce(col("n_done"), lit(0L)).as("n_done"))
        .withColumn("backlog", sum("n_open").over(w) - sum("n_done").over(w))
        .orderBy("day")
    }),

    // Order-total reconciliation: o_totalprice vs the order's line sum
    // Σ floor(p·(1−d)·(1+t)·100), reported as a signed-magnitude bucket
    // histogram (sign + decimal digit count of the cent difference) —
    // the invariant check a billing pipeline runs after every load.
    "dq_order_reconcile" -> ((s, d) => {
      val lines = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")) * lit(100.0)).cast("long")).as("line_c"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("tot_c"))
        .join(lines, col("o_orderkey") === col("l_orderkey"))
        .withColumn("diff", col("tot_c") - col("line_c"))
        .withColumn("bucket",
          when(col("diff") === 0, lit("0")).otherwise(concat(
            when(col("diff") > 0, lit("+")).otherwise(lit("-")),
            length(abs(col("diff")).cast("string")).cast("string"))))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          min("diff").as("min_diff"), max("diff").as("max_diff"))
        .orderBy("bucket")
    }),

    // Simple CLV projection per market segment: observed revenue per
    // customer, orders per customer, and average order value — all
    // integer cents/ppm off ONE customer⋈orders aggregate.
    "clv_simple_projection" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count_distinct(col("c_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_c"))
        .withColumn("aov_c", expr("rev_c div n_orders"))
        .withColumn("opc_ppm", expr("(n_orders * 1000000) div n_cust"))
        .withColumn("clv_c", expr("rev_c div n_cust"))
        .orderBy("c_mktsegment")),

    // Association rules over co-purchase baskets: for every directed
    // item pair (a → b) with joint support ≥ 5 orders, confidence =
    // supp(ab)/supp(a) and lift = supp(ab)·N/(supp(a)·supp(b)) in ppm.
    // Pair generation is order-local (the GraphOps edge-build shape).
    "basket_rules_lift" -> ((s, d) => {
      val lp = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val suppA = lp.groupBy(col("pk")).agg(count(lit(1)).as("supp"))
      val nOrders = lp.agg(count_distinct(col("ok")).as("n_orders"))
      val pairs = lp.groupBy("ok").agg(collect_set(col("pk")).as("pks"))
        .select(explode(col("pks")).as("a"), col("pks"))
        .select(col("a"), explode(col("pks")).as("b"))
        .where(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("supp_ab"))
        .filter(col("supp_ab") >= 5)
      pairs
        .join(suppA.select(col("pk").as("a"), col("supp").as("supp_a")), "a")
        .join(suppA.select(col("pk").as("b"), col("supp").as("supp_b")), "b")
        .crossJoin(broadcast(nOrders))
        .withColumn("conf_ppm", expr("(supp_ab * 1000000) div supp_a"))
        .withColumn("lift_ppm",
          expr("(supp_ab * n_orders * 1000000) div (supp_a * supp_b)"))
        .orderBy(col("lift_ppm").desc, col("a"), col("b")).limit(30)
        .select("a", "b", "supp_ab", "supp_a", "supp_b", "conf_ppm", "lift_ppm")
        .orderBy("a", "b")
    })
  )

  def oracles: Map[String, String] = Map(
    "twap_time_weighted" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor(value * 10000) AS BIGINT) AS v_c FROM events),
        |l AS (SELECT *, lead(ts_us, 1) OVER (PARTITION BY event_type
        |    ORDER BY ts_us, event_id) - ts_us AS dt FROM e),
        |g AS (SELECT event_type, count(*) AS n_intervals,
        |    CAST(sum(v_c * dt) AS BIGINT) AS wsum,
        |    CAST(sum(dt) AS BIGINT) AS span_us,
        |    CAST(sum(v_c) AS BIGINT) AS vsum
        |  FROM l WHERE dt IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_intervals, span_us,
        |  wsum // span_us AS twap_c, vsum // n_intervals AS mean_c
        |FROM g ORDER BY event_type""".stripMargin,

    "win_reset_running_sum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS flag,
        |    CAST(floor(value * 10000) AS BIGINT) AS v_c
        |  FROM events WHERE user_id < 200),
        |sg AS (SELECT *, CAST(coalesce(sum(flag) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS seg FROM e)
        |SELECT user_id, event_id, seg,
        |  CAST(sum(v_c) OVER (PARTITION BY user_id, seg
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS run_c
        |FROM sg ORDER BY user_id, event_id""".stripMargin,

    "orders_backlog_daily" ->
      """WITH op AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |    count(*) AS n_open FROM orders GROUP BY 1),
        |fl AS (SELECT l_orderkey, max(epoch_us(l_shipdate)) AS fus
        |  FROM lineitem GROUP BY 1),
        |dn AS (SELECT fus // 86400000000 AS day, count(*) AS n_done
        |  FROM fl GROUP BY 1),
        |m AS (SELECT coalesce(op.day, dn.day) AS day,
        |    CAST(coalesce(n_open, 0) AS BIGINT) AS n_open,
        |    CAST(coalesce(n_done, 0) AS BIGINT) AS n_done
        |  FROM op FULL OUTER JOIN dn ON op.day = dn.day)
        |SELECT day, n_open, n_done,
        |  CAST(sum(n_open) OVER w - sum(n_done) OVER w AS BIGINT) AS backlog
        |FROM m WINDOW w AS (ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "dq_order_reconcile" ->
      """WITH ln AS (SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) *
        |      (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_c
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) - line_c AS diff
        |  FROM orders JOIN ln ON o_orderkey = l_orderkey),
        |b AS (SELECT CASE WHEN diff = 0 THEN '0'
        |    ELSE concat(CASE WHEN diff > 0 THEN '+' ELSE '-' END,
        |      CAST(length(CAST(abs(diff) AS VARCHAR)) AS VARCHAR)) END AS bucket,
        |    diff FROM j)
        |SELECT bucket, count(*) AS n_orders,
        |  min(diff) AS min_diff, max(diff) AS max_diff
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "clv_simple_projection" ->
      """WITH g AS (SELECT c_mktsegment,
        |    count(DISTINCT c_custkey) AS n_cust, count(*) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_mktsegment, n_cust, n_orders, rev_c,
        |  rev_c // n_orders AS aov_c,
        |  (n_orders * 1000000) // n_cust AS opc_ppm,
        |  rev_c // n_cust AS clv_c
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    "basket_rules_lift" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |sa AS (SELECT pk, count(*) AS supp FROM lp GROUP BY 1),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM lp),
        |pr AS (SELECT a.pk AS a, b.pk AS b, count(*) AS supp_ab
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |sc AS (SELECT pr.a, pr.b, pr.supp_ab,
        |    x.supp AS supp_a, y.supp AS supp_b, n.n_orders
        |  FROM pr JOIN sa x ON pr.a = x.pk JOIN sa y ON pr.b = y.pk, n),
        |top AS (SELECT a, b, supp_ab, supp_a, supp_b,
        |    (supp_ab * 1000000) // supp_a AS conf_ppm,
        |    (supp_ab * n_orders * 1000000) // (supp_a * supp_b) AS lift_ppm
        |  FROM sc ORDER BY lift_ppm DESC, a, b LIMIT 30)
        |SELECT a, b, supp_ab, supp_a, supp_b, conf_ppm, lift_ppm
        |FROM top ORDER BY a, b""".stripMargin
  )
}
