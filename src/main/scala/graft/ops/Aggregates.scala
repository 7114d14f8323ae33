package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.io.Tables.{canon, canon100}

/** §2.3 aggregation surface (SURVEY.md).
  *
  * Determinism at scale: SUMs over raw doubles are order-dependent (partial
  * aggregation merges in nondeterministic order), so every money SUM
  * integerizes per-row first (`floor(x*100)` cents) and sums exact BIGINTs —
  * map-side partial aggregation stays enabled and the result is
  * merge-order-independent, which is also what makes the answer stable on a
  * 1000-executor cluster. AVG/stddev keep double math (error ~1e-12
  * relative) and canonicalize coarsely.
  */
object Aggregates {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: partial+final hash aggregate
    "agg_hash_group" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(canon(col("l_quantity"), 100)).as("sum_qty_c"),
          sum(canon(col("l_extendedprice"), 100)).as("sum_base_c"),
          sum(canon(col("l_extendedprice") * (lit(1) - col("l_discount")), 100)).as("sum_disc_c"),
          sum(canon(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 100)).as("sum_charge_c"),
          canon(avg(col("l_quantity"))).as("avg_qty_c"),
          canon(avg(col("l_extendedprice"))).as("avg_price_c"),
          canon(avg(col("l_discount"))).as("avg_disc_c"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // distinct aggregate: expand + two-phase rewrite
    "agg_distinct_count" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // conditional aggregation: CASE WHEN pivots by event type
    "agg_cond_casewhen" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "purchase", canon(col("value"), 100)).otherwise(0)).as("rev_c"),
          count(when(col("event_type") === "error", lit(1))).as("n_error"))
        .orderBy("bucket")
    }),

    // ROLLUP(region, nation) with grouping_id
    "agg_rollup" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.region(s, d).createOrReplaceTempView("region")
      s.sql("""SELECT r_name, n_name, grouping_id() AS gid, count(*) AS n_cust
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP (r_name, n_name)
              |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    // CUBE(returnflag, linestatus)
    "agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(canon(col("l_extendedprice"), 100)).as("sum_c"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // GROUPING SETS ((event_type),(bucket),())
    "agg_grouping_sets" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql("""SELECT event_type, user_id % 10 AS bucket, count(*) AS n,
              |  sum(CAST(floor(value * 100) AS BIGINT)) AS val_c
              |FROM events
              |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
              |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST""".stripMargin)
    }),

    // statistics family; stddev/var coarser-canonicalized
    "agg_stats" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          canon(min(col("value"))).as("min_c"),
          canon(max(col("value"))).as("max_c"),
          canon(avg(col("value"))).as("avg_c"),
          canon100(stddev_samp(col("value"))).as("sd_c"),
          canon100(var_samp(col("value"))).as("var_c"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // exact interpolated median ≡ DuckDB quantile_cont
    "agg_median_percentile" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(canon(expr("percentile(value, 0.5D)")).as("p50_c"),
          canon(expr("percentile(value, 0.9D)")).as("p90_c"))
        .orderBy("event_type")
    }),

    // per-group argmax with deterministic tie-break
    "agg_arg_minmax" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          max_by(col("event_id"), struct(col("value"), col("event_id"))).as("top_event"),
          min_by(col("event_id"), struct(col("value"), col("event_id"))).as("bot_event"),
          canon(max(col("value"))).as("top_val_c"))
        .orderBy("event_type")
    }),

    // ordered list aggregation (determinism rule 6); the sorted array is
    // serialized to a CSV string so the oracle harness can hash it
    "agg_collect_sorted" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("c_custkey") < 200)
        .groupBy("n_name")
        .agg(array_join(sort_array(collect_list(col("c_custkey"))).cast("array<string>"), ",").as("custkeys"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    }),

    // PIVOT surface: long→wide reshape of per-bucket event-type counts
    // with an EXPLICIT pivot value list (mandatory for a stable schema —
    // and for skipping the extra distinct-values job a valueless pivot
    // runs). Nulls for absent cells zero-filled so both engines agree.
    "agg_pivot_wide" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy("bucket")
    }),

    // Exact mode per group (the aggregate SQL's MODE() without relying
    // on engine-specific tie rules): modal order priority per customer
    // market segment, tie → lexicographically smallest priority. The
    // argmax is a min(struct(-n, priority)) AGGREGATE over the
    // (segment, priority) count relation — no window, no sort; the
    // count relation is |segments|×|priorities| rows at any data size.
    "agg_mode_exact" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .groupBy("c_mktsegment")
        .agg(min(struct((-col("n")).as("nn"), col("o_orderpriority").as("p")))
          .as("m"))
        .select(col("c_mktsegment"), col("m.p").as("mode_priority"),
          (-col("m.nn")).as("n_mode"))
        .orderBy("c_mktsegment")
    }),

    // HLL sketch distinct (no oracle: implementations differ; ScalaTest
    // bounds-checks vs exact count instead)
    "agg_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    // row_number (n DESC, priority ASC) replicates min(struct(-n, p))
    "agg_mode_exact" ->
      """SELECT c_mktsegment, o_orderpriority AS mode_priority,
        |  CAST(n AS BIGINT) AS n_mode
        |FROM (SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY count(*) DESC, o_orderpriority) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_orderpriority) t
        |WHERE rk = 1 ORDER BY c_mktsegment""".stripMargin,

    "agg_pivot_wide" ->
      """SELECT user_id % 10 AS bucket,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "agg_hash_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  CAST(floor(avg(l_quantity) * 10000) AS BIGINT) AS avg_qty_c,
        |  CAST(floor(avg(l_extendedprice) * 10000) AS BIGINT) AS avg_price_c,
        |  CAST(floor(avg(l_discount) * 10000) AS BIGINT) AS avg_disc_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct_count" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_cond_casewhen" ->
      """SELECT user_id % 10 AS bucket,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_c,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events GROUP BY user_id % 10 ORDER BY bucket""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, GROUPING(r_name, n_name) AS gid, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n, CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT event_type, user_id % 10 AS bucket, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS val_c
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST""".stripMargin,

    "agg_stats" ->
      """SELECT event_type,
        |  CAST(floor(min(value) * 10000) AS BIGINT) AS min_c,
        |  CAST(floor(max(value) * 10000) AS BIGINT) AS max_c,
        |  CAST(floor(avg(value) * 10000) AS BIGINT) AS avg_c,
        |  CAST(floor(stddev_samp(value) * 100) AS BIGINT) AS sd_c,
        |  CAST(floor(var_samp(value) * 100) AS BIGINT) AS var_c,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_median_percentile" ->
      """SELECT event_type,
        |  CAST(floor(quantile_cont(value, 0.5) * 10000) AS BIGINT) AS p50_c,
        |  CAST(floor(quantile_cont(value, 0.9) * 10000) AS BIGINT) AS p90_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_arg_minmax" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rmax,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rmin
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rmax = 1 THEN event_id END) AS top_event,
        |  max(CASE WHEN rmin = 1 THEN event_id END) AS bot_event,
        |  CAST(floor(max(value) * 10000) AS BIGINT) AS top_val_c
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT n_name, array_to_string(list(c_custkey ORDER BY c_custkey), ',') AS custkeys,
        |  count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey < 200
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
