package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** §2.43 relational completeness — the TPC-H query-shape tail (added
  * round 6): the EXISTS-subquery aggregate (Q4), the single-table
  * predicate-pushdown aggregate (Q6), the nested market-share ratio
  * (Q8), the disjunctive multi-predicate join (Q19), and the
  * semi/anti-composition over per-order supplier behavior (Q21). The
  * fixture star schema lacks l_commitdate / l_receiptdate / l_shipmode /
  * p_container, so those queries keep their SHAPE with the available
  * columns (lateness = shipdate vs orderdate; Q19's triples use
  * brand × size × quantity).
  *
  * Determinism: revenue floor-canonicalized per row before integer sums;
  * date arithmetic in epoch microseconds; ppm shares by integer div.
  *
  * Scale shapes (100 TB notes):
  *  - q4: EXISTS = left-semi join; the date filter reaches the orders
  *    scan, the semi join shuffles on orderkey only.
  *  - q6: pure scan-side predicates (shipdate year, discount band,
  *    quantity cap) — the whole query is one combinable aggregate over a
  *    pruned scan; the canonical pushdown check.
  *  - q8: dimension chain (region→nation→customer) and part/supplier
  *    broadcast; the two fact joins shuffle on custkey/orderkey; the
  *    share is a conditional-sum ratio inside ONE aggregate pass.
  *  - q19: the OR-of-triples predicate evaluates on the joined row —
  *    brand/size prune the broadcast part side, quantity prunes the
  *    lineitem scan (each triple's quantity bound is scan-pushable as
  *    the disjunction's envelope 1..30).
  *  - q21: two keyed aggregates (order×supplier, then order) replace
  *    the correlated EXISTS/NOT EXISTS pair — every step map-side
  *    combinable, no per-row subquery execution.
  */
object TpchTailOps {

  /** floor(p·(1−d)·100): per-row canonicalized revenue cents. */
  private def rev = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    * lit(100.0)).cast("long")

  private val Day30Us = 30L * 86400000000L
  private val Day60Us = 60L * 86400000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q4 shape: orders of a half-year window with at least one line
    // shipped ≥ 30 days after the order date (EXISTS → left-semi join);
    // count per order priority.
    "q4_late_exists" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-07-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            unix_micros(col("l_shipdate").cast("timestamp")) >=
              unix_micros(col("o_orderdate").cast("timestamp")) + lit(Day30Us),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Q6 shape: forecast-revenue-change — one pruned scan, one aggregate.
    // All three predicates are scan-side; discount compared in integer
    // cents (floor(d·100) ∈ [5,7]) so the band is float-safe.
    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2000-01-01").cast("timestamp") &&
          floor(col("l_discount") * 100).cast("long").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * col("l_discount") * lit(100.0))
            .cast("long")).as("rev_c"))),

    // Q8 shape: market share of supplier-nation NATION_2 within ASIA's
    // STANDARD-part order volume, per order year — the nested ratio
    // computed as a conditional sum inside one aggregate.
    "q8_market_share" -> ((s, d) => {
      val asiaNations = Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val suppNation = Tables.supplier(s, d)
        .join(Tables.nation(s, d),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.customer(s, d)
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "STANDARD").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(rev).as("total_c"),
          sum(when(col("supp_nation") === "NATION_2", rev).otherwise(0L))
            .as("target_c"))
        .withColumn("share_ppm", expr("(target_c * 1000000) div total_c"))
        .orderBy("yr")
    }),

    // Q19 shape: disjunction of three (brand, size-band, quantity-band)
    // triples over lineitem ⋈ part — revenue and row count in one pass.
    "q19_disjunctive_revenue" -> ((s, d) => {
      def triple(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
          col("l_quantity") >= qLo && col("l_quantity") <= qHi
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(triple("Brand#12", 1, 15, 1, 11) ||
          triple("Brand#23", 10, 30, 10, 20) ||
          triple("Brand#34", 20, 50, 20, 30))
        .agg(count(lit(1)).as("n_items"), sum(rev).as("rev_c"))
    }),

    // Q21 shape: suppliers who were the ONLY late shipper in a
    // multi-supplier order (late = shipped > 60 days after order date) —
    // the EXISTS/NOT-EXISTS pair recast as two keyed aggregates.
    "q21_waiting_suppliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(unix_micros(col("l_shipdate").cast("timestamp")) >
            unix_micros(col("o_orderdate").cast("timestamp")) + lit(Day60Us), 1L)
            .otherwise(0L).as("late"))
      val os = li.groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("late")).as("sl"))
      val st = os.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum(col("sl")).as("n_late"))
      os.filter(col("sl") === 1L)
        .join(st, "l_orderkey")
        .filter(col("n_supp") >= 2 && col("n_late") === 1L)
        .groupBy("l_suppkey").agg(count(lit(1)).as("n_orders"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .orderBy(col("n_orders").desc, col("s_suppkey")).limit(20)
        .select("s_suppkey", "s_name", "n_orders")
        .orderBy("s_suppkey")
    }),

    // Q13 shape: customer order-count distribution — how many customers
    // placed k orders, INCLUDING k = 0 (the left outer join every
    // "engagement histogram" needs); two cascaded aggregates.
    "q13_custdist" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15 shape: top supplier(s) by revenue over the 1997-Q1 ship
    // window — the revenue "view" is one keyed aggregate; the max joins
    // back as a single-row broadcast (the VIEW + WHERE total = max
    // composition).
    "q15_top_supplier" -> ((s, d) => {
      val win = Tables.lineitem(s, d)
        .withColumn("ym", expr("(year(cast(l_shipdate as timestamp)) * 100 + " +
          "month(cast(l_shipdate as timestamp)))").cast("long"))
        .filter(col("ym") >= 199701L && col("ym") <= 199703L)
      val revenue = win.groupBy(col("l_suppkey"))
        .agg(sum(rev).as("total_rev_c"))
      val top = revenue.agg(max("total_rev_c").as("mx"))
      revenue.crossJoin(broadcast(top))
        .filter(col("total_rev_c") === col("mx"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_c"))
        .orderBy("s_suppkey")
    }),

    // Q17 shape: revenue impact of small-quantity orders for one brand —
    // lines with quantity below 20% of their part's average. The
    // fractional-average comparison cross-multiplies to stay integral
    // (5·q·n < Σq), so no float threshold exists anywhere; the per-part
    // stats relation is part-sized and broadcasts back.
    "q17_small_qty_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#13").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), floor(col("l_quantity")).cast("long").as("q"),
          rev.as("rc"))
      val stats = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"))
      li.join(stats, "l_partkey")
        .filter(col("q") * 5 * col("n") < col("sq"))
        .agg(count(lit(1)).as("n_small"),
          sum(col("rc")).as("rev_c"),
          expr("CAST(sum(rc) div 7 AS BIGINT)").as("avg_yearly_c"))
    }),

    // Q22 shape: LAPSED high-balance customers — above the
    // positive-balance average (cross-multiplied: bal·n > Σbal, no
    // float threshold) with no order since 1999 (anti join against the
    // recent-order window) — grouped by nation. The global average is a
    // single-row broadcast.
    "q22_idle_customers" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val avgRow = cust.filter(col("bal_c") > 0)
        .agg(count(lit(1)).as("n_pos"), sum("bal_c").as("sum_pos"))
      val recent = Tables.orders(s, d)
        .filter(expr("year(cast(o_orderdate as timestamp))") >= 1999)
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgRow))
        .filter(col("bal_c") * col("n_pos") > col("sum_pos"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
        .orderBy("c_nationkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q13_custdist" ->
      """WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM co
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH win AS (SELECT l_suppkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS rc
        |  FROM lineitem
        |  WHERE year(l_shipdate) * 100 + month(l_shipdate) BETWEEN 199701 AND 199703),
        |rev AS (SELECT l_suppkey, CAST(sum(rc) AS BIGINT) AS total_rev_c
        |  FROM win GROUP BY 1),
        |mx AS (SELECT max(total_rev_c) AS mx FROM rev)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey, mx
        |WHERE total_rev_c = mx.mx ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, CAST(floor(l_quantity) AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS rc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |st AS (SELECT l_partkey, count(*) AS n, CAST(sum(q) AS BIGINT) AS sq
        |  FROM li GROUP BY 1)
        |SELECT count(*) AS n_small, CAST(sum(rc) AS BIGINT) AS rev_c,
        |  CAST(sum(rc) AS BIGINT) // 7 AS avg_yearly_c
        |FROM li JOIN st ON li.l_partkey = st.l_partkey
        |WHERE q * 5 * n < sq""".stripMargin,

    "q22_idle_customers" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        |a AS (SELECT count(*) AS n_pos, CAST(sum(bal_c) AS BIGINT) AS sum_pos
        |  FROM c WHERE bal_c > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM c, a
        |WHERE bal_c * n_pos > sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c.c_custkey AND year(o_orderdate) >= 1999)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q4_late_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND epoch_us(l_shipdate) >= epoch_us(o_orderdate) + 2592000000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
        |    AS BIGINT) AS rev_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-01-01'
        |  AND CAST(floor(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,

    "q8_market_share" ->
      """WITH sn AS (SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        |base AS (SELECT year(o_orderdate) AS yr,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rc,
        |    sn.supp_nation
        |  FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |    JOIN orders ON c_custkey = o_custkey
        |    JOIN lineitem ON o_orderkey = l_orderkey
        |    JOIN part ON l_partkey = p_partkey
        |    JOIN sn ON l_suppkey = sn.s_suppkey
        |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'),
        |g AS (SELECT CAST(yr AS BIGINT) AS yr,
        |    CAST(sum(rc) AS BIGINT) AS total_c,
        |    CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rc ELSE 0 END)
        |      AS BIGINT) AS target_c
        |  FROM base GROUP BY 1)
        |SELECT yr, total_c, target_c,
        |  (target_c * 1000000) // total_c AS share_ppm
        |FROM g ORDER BY yr""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS rev_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity >= 1 AND l_quantity <= 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity >= 10 AND l_quantity <= 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey,
        |    CASE WHEN epoch_us(l_shipdate) >
        |        epoch_us(o_orderdate) + 5184000000000 THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |os AS (SELECT l_orderkey, l_suppkey, max(late) AS sl
        |  FROM li GROUP BY 1, 2),
        |st AS (SELECT l_orderkey, count(*) AS n_supp,
        |    CAST(sum(sl) AS BIGINT) AS n_late FROM os GROUP BY 1),
        |w AS (SELECT os.l_suppkey FROM os JOIN st USING (l_orderkey)
        |  WHERE os.sl = 1 AND st.n_supp >= 2 AND st.n_late = 1),
        |c AS (SELECT l_suppkey, count(*) AS n_orders FROM w GROUP BY 1),
        |top AS (SELECT s_suppkey, s_name, n_orders
        |  FROM c JOIN supplier ON l_suppkey = s_suppkey
        |  ORDER BY n_orders DESC, s_suppkey LIMIT 20)
        |SELECT s_suppkey, s_name, n_orders FROM top ORDER BY s_suppkey""".stripMargin
  )
}
