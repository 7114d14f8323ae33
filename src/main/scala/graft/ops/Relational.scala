package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.canon

/** §2.2 relational core (SURVEY.md): scans, the full join family, and
  * subqueries over the consumer-side read-model star schema.
  *
  * Scale notes (100 TB): filters/projections push into the parquet scan
  * (verify `PushedFilters` in explain); dimension joins broadcast
  * (region/nation always; customer at sf≤1 — Catalyst's
  * autoBroadcastJoinThreshold + AQE handle the switch at scale); fact-fact
  * joins (lineitem ⋈ orders) shuffle on the join key once and would be
  * bucket-colocated in a real deployment. The as-of join is a single
  * shuffle window pass — never a per-row correlated probe.
  */
object Relational {

  private def withAll(spark: SparkSession, d: String)(f: => DataFrame): DataFrame = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.table(spark, d, t).createOrReplaceTempView(t))
    Tables.events(spark, d).createOrReplaceTempView("events")
    f
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // column-pruned, predicate-pushed scan: one ship month of lineitem
    "scan_project_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2000-02-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          canon(col("l_quantity"), 100).as("qty_c"),
          canon(col("l_extendedprice"), 100).as("price_c"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // compound predicates: AND/OR/NOT, IN, BETWEEN, LIKE, null-safe
    "filter_predicates" -> ((s, d) => {
      Tables.orders(s, d)
        .filter((col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(50000, 150000) &&
          !(col("o_orderstatus") === "F")) ||
          (col("o_orderstatus").eqNullSafe("P") && col("o_orderpriority").like("5%")))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          canon(col("o_totalprice"), 100).as("price_c"))
        .orderBy("o_orderkey")
    }),

    // fact ⋈ dim equi-join, aggregated per segment (shuffle/broadcast by size)
    "join_inner_hash" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(canon(col("o_totalprice"), 100)).as("revenue_c"))
        .orderBy("c_mktsegment")
    }),

    // The SAME fact ⋈ dim aggregate with the join FORCED to sort-merge
    // (merge hints on both sides): the plan shape every equi-join takes
    // once BOTH sides outgrow broadcast AND shuffle-hash build budgets —
    // the default at true 100 TB fact-fact scale. Verification-only
    // under join_inner_hash's oracle (SparkEntry.verifyOnly): proves the
    // at-scale physical strategy is semantics-identical, the
    // graph_kcore_shuffle pattern.
    "join_inner_merge" -> ((s, d) => {
      Tables.orders(s, d).hint("merge")
        .join(Tables.customer(s, d).hint("merge"),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(canon(col("o_totalprice"), 100)).as("revenue_c"))
        .orderBy("c_mktsegment")
    }),

    // explicit broadcast of the small dimension side
    "join_broadcast" -> ((s, d) => {
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy("n_nationkey")
    }),

    // 3-way dim chain; Catalyst reorders, both dims broadcast
    "join_multiway" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), sum(canon(col("c_acctbal"), 100)).as("bal_c"))
        .orderBy("r_name", "n_name")
    }),

    // left outer: customers incl. those with zero orders
    "join_left_outer" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // full outer presence matrix: event users vs customer keys
    "join_full_outer" -> ((s, d) => {
      val u = Tables.events(s, d).select(col("user_id")).distinct()
      val c = Tables.customer(s, d).select(col("c_custkey"))
      u.join(c, col("user_id") === col("c_custkey"), "full_outer")
        .select(coalesce(col("user_id"), col("c_custkey")).as("k"),
          col("user_id").isNotNull.as("has_event"),
          col("c_custkey").isNotNull.as("has_cust"))
        .orderBy("k")
    }),

    // EXISTS → left semi
    "join_semi" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // NOT EXISTS → left anti
    "join_anti" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // equi-join + theta residual: shipped >60 days after order
    "join_theta_range" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late"),
          sum(canon(col("l_extendedprice"), 100)).as("late_c"))
        .orderBy("o_orderpriority")
    }),

    // as-of join: latest strictly-earlier click per purchase, same user.
    // Single shuffle: union-tag + last(ignoreNulls) window — event_id is the
    // feed's total order key (ts monotone in id), so id-order == time-order.
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("last_click_id"))
        .orderBy("event_id")
    }),

    // INTERPOLATED as-of join (sensor-fusion / mark-to-market shape):
    // each purchase is valued at the LINEAR INTERPOLATION between the
    // same user's bracketing view readings — backward and forward as-of
    // in one single-shuffle union-tag pass (two windows over the same
    // per-user order), then row-local arithmetic. The one float is the
    // interpolation ratio, evaluated with the identical parse tree both
    // engines (cast-BEFORE-multiply: the value×Δt product overflows
    // int64 at µs timescales) and floored. Probes with no bracket on a
    // side fall back to the reading they do have.
    "join_asof_interpolated" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
          floor(col("value") * 10000).cast("long").as("vc"))
      val reading = when(col("event_type") === "view",
        struct(col("ts_us").as("rt"), col("vc").as("rv")))
      val wB = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wF = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      ev
        .withColumn("p", last(reading, ignoreNulls = true).over(wB))
        .withColumn("nx", first(reading, ignoreNulls = true).over(wF))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(col("p").isNotNull && col("nx").isNotNull &&
              col("nx.rt") =!= col("p.rt"), // same-µs bracket ⇒ no slope
            col("p.rv") + floor(
              (col("nx.rv") - col("p.rv")).cast("double") *
                (col("ts_us") - col("p.rt")).cast("double") /
                (col("nx.rt") - col("p.rt")).cast("double")).cast("long"))
            .otherwise(coalesce(col("p.rv"), col("nx.rv"))).as("interp_c"),
          when(col("p").isNotNull && col("nx").isNotNull &&
            col("nx.rt") =!= col("p.rt"), lit("interp"))
            .when(col("p").isNotNull, lit("prev_only"))
            .when(col("nx").isNotNull, lit("next_only"))
            .otherwise(lit("none")).as("mode"))
        .orderBy("event_id")
    }),

    // NEAREST as-of join: for each purchase, the click closest in TIME —
    // before or after — by the same user (ties → the earlier/backward
    // click). Same single-shuffle union-tag shape as join_asof, with a
    // second window scanning forward; both candidate id+ts pairs ride
    // the same per-user window order (event_id is the feed's total time
    // order), so the min-|Δt| pick is pure row-local arithmetic.
    "join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
      val isClick = when(col("event_type") === "click", col("event_id"))
      val isClickTs = when(col("event_type") === "click", col("ts_us"))
      val wb = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wf = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      ev.withColumn("bk_id", last(isClick, ignoreNulls = true).over(wb))
        .withColumn("bk_ts", last(isClickTs, ignoreNulls = true).over(wb))
        .withColumn("fw_id", first(isClick, ignoreNulls = true).over(wf))
        .withColumn("fw_ts", first(isClickTs, ignoreNulls = true).over(wf))
        .filter(col("event_type") === "purchase")
        .withColumn("near_click_id",
          when(col("bk_id").isNull, col("fw_id"))
            .when(col("fw_id").isNull, col("bk_id"))
            .when(col("ts_us") - col("bk_ts") <= col("fw_ts") - col("ts_us"),
              col("bk_id"))
            .otherwise(col("fw_id")))
        .withColumn("delta_us",
          when(col("near_click_id") === col("bk_id"), col("ts_us") - col("bk_ts"))
            .when(col("near_click_id") === col("fw_id"), col("fw_ts") - col("ts_us")))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("near_click_id"), col("delta_us"))
        .orderBy("event_id")
    }),

    // FORWARD as-of join: the first click strictly AFTER each purchase
    // by the same user (the "next maintenance after failure" direction —
    // backward/nearest/tolerance cover the other three semantics). Same
    // single-shuffle union-tag shape, forward-scanning window.
    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
      val wf = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      ev.withColumn("next_click_id",
          first(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(wf))
        .withColumn("next_click_us",
          first(when(col("event_type") === "click", col("ts_us")),
            ignoreNulls = true).over(wf))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("next_click_id"),
          (col("next_click_us") - col("ts_us")).as("wait_us"))
        .orderBy("event_id")
    }),

    // As-of with a staleness TOLERANCE: each purchase matches its most
    // recent prior click only if it happened within 10 minutes —
    // older candidates yield NULL (the "data too stale to use" rule a
    // feature-store join enforces). Same single-window shape as
    // join_asof; the tolerance is row-local arithmetic after the match.
    "join_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("ck_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("ck_us",
          last(when(col("event_type") === "click", col("ts_us")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("ok", col("ts_us") - col("ck_us") <= 600000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(col("ok"), col("ck_id")).as("click_id_10m"),
          when(col("ok"), col("ts_us") - col("ck_us")).as("staleness_us"))
        .orderBy("event_id")
    }),

    // interval join: events within 1h after the same user's signup
    "join_interval" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val sg = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("su"), col("event_id").as("signup_id"), col("ts_us").as("sts"))
      ev.join(sg, col("user_id") === col("su") &&
          col("ts_us") >= col("sts") && col("ts_us") <= col("sts") + lit(3600000000L) &&
          col("event_id") =!= col("signup_id"))
        .select(col("signup_id"), col("event_id"), col("user_id"))
        .orderBy("signup_id", "event_id")
    }),

    // scalar subquery: orders above the (floored) global average price
    "subquery_scalar" -> ((s, d) => withAll(s, d) {
      s.sql("""SELECT o_orderpriority, count(*) AS n,
              |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS sum_c
              |FROM orders
              |WHERE o_totalprice > (SELECT floor(avg(o_totalprice)) FROM orders)
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // correlated subquery: customers above their nation's average balance
    "subquery_in_correlated" -> ((s, d) => withAll(s, d) {
      s.sql("""SELECT c_custkey, CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
              |FROM customer c
              |WHERE c_acctbal > (SELECT floor(avg(c2.c_acctbal))
              |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
              |ORDER BY c_custkey""".stripMargin)
    })
  )

  def oracles: Map[String, String] = Map(
    "scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity * 100) AS BIGINT) AS qty_c,
        |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-02-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_predicates" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
        |FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH')
        |       AND o_totalprice BETWEEN 50000 AND 150000
        |       AND NOT (o_orderstatus = 'F'))
        |   OR (o_orderstatus IS NOT DISTINCT FROM 'P' AND o_orderpriority LIKE '5%')
        |ORDER BY o_orderkey""".stripMargin,

    "join_inner_hash" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // forced sort-merge twin: identical semantics, identical oracle
    "join_inner_merge" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_multiway" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT coalesce(user_id, c_custkey) AS k,
        |  user_id IS NOT NULL AS has_event,
        |  c_custkey IS NOT NULL AS has_cust
        |FROM (SELECT DISTINCT user_id FROM events) u
        |FULL OUTER JOIN (SELECT c_custkey FROM customer) c ON user_id = c_custkey
        |ORDER BY k""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_theta_range" ->
      """SELECT o_orderpriority, count(*) AS n_late,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS late_c
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "join_asof_interpolated" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS vc
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |w AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'view'
        |        THEN struct_pack(rt := us, rv := vc) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
        |    first_value(CASE WHEN event_type = 'view'
        |        THEN struct_pack(rt := us, rv := vc) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nx
        |  FROM ev)
        |SELECT event_id, user_id, us AS ts_us,
        |  CASE WHEN p IS NOT NULL AND nx IS NOT NULL AND (nx).rt <> (p).rt
        |    THEN (p).rv + CAST(floor(CAST((nx).rv - (p).rv AS DOUBLE)
        |      * CAST(us - (p).rt AS DOUBLE)
        |      / CAST((nx).rt - (p).rt AS DOUBLE)) AS BIGINT)
        |    ELSE coalesce((p).rv, (nx).rv) END AS interp_c,
        |  CASE WHEN p IS NOT NULL AND nx IS NOT NULL AND (nx).rt <> (p).rt
        |      THEN 'interp'
        |    WHEN p IS NOT NULL THEN 'prev_only'
        |    WHEN nx IS NOT NULL THEN 'next_only'
        |    ELSE 'none' END AS mode
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "join_asof" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  (SELECT max(c.event_id) FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |     AND c.event_id < p.event_id) AS last_click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    "join_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT *,
        |    min(CASE WHEN event_type = 'click' THEN event_id END)
        |      OVER f AS next_click_id,
        |    min(CASE WHEN event_type = 'click' THEN ts_us END)
        |      OVER f AS next_click_us
        |  FROM e WINDOW f AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, ts_us, next_click_id,
        |  next_click_us - ts_us AS wait_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "join_asof_tolerance" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |t AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ck_id,
        |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ck_us
        |  FROM e)
        |SELECT event_id, user_id, us AS ts_us,
        |  CASE WHEN us - ck_us <= 600000000 THEN ck_id END AS click_id_10m,
        |  CASE WHEN us - ck_us <= 600000000 THEN us - ck_us END AS staleness_us
        |FROM t WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // the window formulation mirrors the engine exactly: event_id order
    // == time order, strictly-before / strictly-after frames, tie → the
    // backward click via <=
    "join_asof_nearest" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |t AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bk_id,
        |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bk_ts,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fw_id,
        |    first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fw_ts
        |  FROM e),
        |p AS (SELECT *, CASE WHEN bk_id IS NULL THEN fw_id
        |    WHEN fw_id IS NULL THEN bk_id
        |    WHEN us - bk_ts <= fw_ts - us THEN bk_id ELSE fw_id END AS near_click_id
        |  FROM t WHERE event_type = 'purchase')
        |SELECT event_id, user_id, us AS ts_us, near_click_id,
        |  CASE WHEN near_click_id = bk_id THEN us - bk_ts
        |       WHEN near_click_id = fw_id THEN fw_ts - us END AS delta_us
        |FROM p ORDER BY event_id""".stripMargin,

    "join_interval" ->
      """SELECT s.event_id AS signup_id, e.event_id, e.user_id
        |FROM events e JOIN events s
        |  ON e.user_id = s.user_id AND s.event_type = 'signup'
        | AND epoch_us(e.ts) >= epoch_us(s.ts)
        | AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
        | AND e.event_id <> s.event_id
        |ORDER BY signup_id, e.event_id""".stripMargin,

    "subquery_scalar" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM orders
        |WHERE o_totalprice > (SELECT floor(avg(o_totalprice)) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "subquery_in_correlated" ->
      """SELECT c_custkey, CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        |FROM customer c
        |WHERE c_acctbal > (SELECT floor(avg(c2.c_acctbal))
        |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
