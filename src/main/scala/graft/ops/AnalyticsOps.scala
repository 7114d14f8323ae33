package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.canon

/** §2.15 composed analytics — multi-join TPC-H-shaped queries over the
  * star schema, the "can I run my whole report on this engine" check on
  * top of the per-operator §2.2/§2.3 coverage. All oracle-checked.
  *
  * Determinism: revenue terms are floor-canonicalized PER ROW
  * (`floor(extendedprice·(1−discount)·100)`) and summed as integers, so
  * group totals are independent of shuffle merge order (rule 1); dates
  * project as `epoch_us` (rule 2); every output ends in a total order
  * with a unique tiebreak (rule 3).
  *
  * Scale shapes: dimension tables (region, nation, supplier) broadcast
  * explicitly; fact-fact joins (orders ⋈ lineitem, customer ⋈ orders)
  * shuffle on their keys with date/flag/segment filters pushed to the
  * parquet scans; top-k outputs end in `TakeOrderedAndProject`.
  */
object AnalyticsOps {

  /** Per-row floor-canonicalized revenue: floor(p·(1−d)·100) as BIGINT. */
  private def rev: org.apache.spark.sql.Column =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
      .cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3 shape (shipping priority): top-10 unshipped orders of one market
    // segment by revenue — 3-way join, date filters on both fact sides.
    "q3_shipping_priority" -> ((s, d) => {
      val cut = lit("1998-01-01").cast("timestamp")
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cut)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cut)
        .groupBy(col("l_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"))
        .agg(sum(rev).as("rev_c"), count(lit(1)).as("n_items"))
        .orderBy(desc("rev_c"), col("l_orderkey"))
        .limit(10)
    }),

    // Q5 shape (local supplier volume): revenue per nation of one region
    // and year where the supplier sits in the customer's nation — the
    // classic 6-table chain; region/nation/supplier broadcast.
    "q5_local_supplier" -> ((s, d) => {
      val dims = Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      Tables.customer(s, d)
        .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("rev_c"), count(lit(1)).as("n_items"))
        .orderBy(desc("rev_c"), col("n_name"))
    }),

    // Q10 shape (returned items): top-20 customers by revenue lost to
    // returns in a half-year window, with their nation.
    "q10_returned_items" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-07-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .groupBy(col("c_custkey"), col("c_name"),
          canon(col("c_acctbal"), 100).as("acctbal_c"), col("n_name"))
        .agg(sum(rev).as("rev_c"), count(lit(1)).as("n_items"))
        .orderBy(desc("rev_c"), col("c_custkey"))
        .limit(20)
    }),

    // Q18 shape (large orders): orders whose total quantity tops the
    // threshold — an aggregate subquery joined back to its facts.
    "q18_big_orders" -> ((s, d) => {
      val bigOrders = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(canon(col("l_quantity"), 100)).as("totqty_c"))
        .filter(col("totqty_c") > 30000L)
      Tables.orders(s, d)
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"),
          canon(col("o_totalprice"), 100).as("price_c"), col("totqty_c"))
        .orderBy(desc("totqty_c"), col("o_orderkey"))
        .limit(50)
    }),

    // ABC revenue classification per brand: parts ranked by canon
    // revenue within their brand, cumulative share against the brand
    // total (integer×100 compare — no float thresholds), A ≤ 80 %,
    // B ≤ 95 %, C above; reported as per-(brand, class) counts and
    // revenue. Both windows are BRAND-partitioned; the revenue relation
    // is parts-sized, not lineitem-sized.
    "abc_class_revenue" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(sum(canon(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("rv"))
      val wCum = Window.partitionBy("p_brand")
        .orderBy(col("rv").desc, col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("p_brand")
      rev.withColumn("cum", sum("rv").over(wCum))
        .withColumn("tot", sum("rv").over(wAll))
        .withColumn("cls", when(col("cum") * 100 <= col("tot") * 80, "A")
          .when(col("cum") * 100 <= col("tot") * 95, "B").otherwise("C"))
        .groupBy("p_brand", "cls")
        .agg(count(lit(1)).as("n_parts"), sum("rv").as("rev_c"))
        .orderBy("p_brand", "cls")
    }),

    // Per-supplier scorecard: lineitem volume, canon net revenue,
    // return rate in integer ppm, distinct parts supplied — the
    // composed "vendor health" report. One broadcast dim join + one
    // combinable aggregate.
    "supplier_scorecard" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("n_items"),
          sum(canon(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("rev_c"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_ret"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .withColumn("ret_ppm", expr("(n_ret * 1000000) div n_items"))
        .orderBy("s_suppkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS rev_c,
        |  count(*) AS n_items
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, odate_us
        |ORDER BY rev_c DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS rev_c,
        |  count(*) AS n_items
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |GROUP BY n_name
        |ORDER BY rev_c DESC, n_name""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_c, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS rev_c,
        |  count(*) AS n_items
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, acctbal_c, n_name
        |ORDER BY rev_c DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS totqty_c
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING totqty_c > 30000)
        |SELECT c_custkey, c_name, o_orderkey, epoch_us(o_orderdate) AS odate_us,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c, totqty_c
        |FROM orders
        |  JOIN big ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY totqty_c DESC, o_orderkey LIMIT 50""".stripMargin,

    "abc_class_revenue" ->
      """WITH rev AS (SELECT p_brand, p_partkey,
        |    sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS rv
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |c AS (SELECT p_brand, p_partkey, rv,
        |    sum(rv) OVER (PARTITION BY p_brand ORDER BY rv DESC, p_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rv) OVER (PARTITION BY p_brand) AS tot
        |  FROM rev)
        |SELECT p_brand,
        |  CASE WHEN cum * 100 <= tot * 80 THEN 'A'
        |       WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS cls,
        |  count(*) AS n_parts, CAST(sum(rv) AS BIGINT) AS rev_c
        |FROM c GROUP BY 1, 2 ORDER BY p_brand, cls""".stripMargin,

    "supplier_scorecard" ->
      """SELECT s_suppkey, s_name, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_ret,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST((sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS ret_ppm
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin
  )
}
