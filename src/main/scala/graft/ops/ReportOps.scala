package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.36 composed analytics II & remaining scalar/window surfaces — the
  * TPC-H-shaped flow reports Q7/Q14/Q16 re-expressed on this star
  * schema, first/last_value frames, and the regexp extraction surface.
  *
  * Scale shapes (100 TB notes):
  *  - q7_nation_volume: dims (nation, supplier, customer via orders)
  *    broadcast where small; the two fact joins shuffle on their keys;
  *    the (nation, nation, year) aggregate is tiny.
  *  - q14_promo_share: one lineitem⋈part key shuffle, conditional sums
  *    per ship-month — the promo share is integer-ppm.
  *  - q16_brand_suppliers: distinct (brand, supplier)/(brand, part)
  *    pairs via map-side-combinable distinct aggregates.
  *  - win_first_last: (user, day)-partitioned frames only.
  *  - fn_regex_extract: pure per-row regex projection.
  */
object ReportOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q7-shaped bilateral trade volume: revenue flowing supplier-nation
    // → customer-nation per ship year across DIFFERENT nations — top-20
    // flows by volume (unique key makes the order total).
    "q7_nation_volume" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_suppkey"),
        expr("year(cast(l_shipdate as timestamp))").cast("long").as("yr"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("long").as("rev"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"),
          col("n_nationkey").as("sn"))
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"),
          col("n_nationkey").as("cn"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("sn") =!= col("cn"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(sum("rev").as("volume"), count(lit(1)).as("n_lines"))
        .orderBy(col("volume").desc, col("supp_nation"),
          col("cust_nation"), col("yr"))
        .limit(20)
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // Q14-shaped promo share: per ship month, the integer-ppm share of
    // revenue from PROMO-type parts.
    "q14_promo_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        expr("(year(cast(l_shipdate as timestamp)) * 100 + " +
          "month(cast(l_shipdate as timestamp)))").cast("long").as("ym"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("long").as("rev"))
      li.join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("ym")
        .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
            .as("promo_rev"),
          sum("rev").as("total_rev"))
        .withColumn("promo_ppm", expr("(promo_rev * 1000000) div total_rev"))
        .select("ym", "promo_rev", "total_rev", "promo_ppm")
        .orderBy("ym")
    }),

    // Q16-shaped brand coverage: per part brand, distinct suppliers that
    // have shipped it and distinct parts shipped — the supplier-
    // relationship breadth report (no partsupp table in this schema;
    // the observed lineitem pairs are the relation).
    "q16_brand_suppliers" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count_distinct(col("l_suppkey")).as("n_suppliers"),
          count_distinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand")),

    // first/last/nth value frames per (user, day): the session's opening
    // and closing event types plus the second event — explicit full-day
    // frames (unbounded both sides).
    "win_first_last" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          col("ts_us"), col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id", "day")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev
        .withColumn("first_type", first("event_type").over(w))
        .withColumn("last_type", last("event_type").over(w))
        .withColumn("second_type", nth_value(col("event_type"), 2).over(w))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"),
          min("first_type").as("first_type"),
          min("last_type").as("last_type"),
          min("second_type").as("second_type"))
        .orderBy("user_id", "day")
    }),

    // Regexp surface: extract the leading word, count vowels via
    // regexp_extract_all, flag digit presence — per part row, pure
    // projection.
    "fn_regex_extract" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          expr("size(regexp_extract_all(p_name, '[aeiou]', 0))")
            .cast("long").as("n_vowels"),
          when(col("p_name").rlike("[0-9]"), 1L).otherwise(0L)
            .as("has_digit"),
          regexp_replace(col("p_brand"), "#", "-").as("brand_norm"))
        .orderBy("p_partkey"))
  )

  def oracles: Map[String, String] = Map(
    "q7_nation_volume" ->
      """SELECT * FROM (
        |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS yr,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount))
        |    AS BIGINT)) AS BIGINT) AS volume,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE sn.n_nationkey <> cn.n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY volume DESC, supp_nation, cust_nation, yr LIMIT 20)
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,

    "q14_promo_share" ->
      """WITH j AS (SELECT
        |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount)) AS BIGINT)
        |      AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT ym,
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
        |      AS BIGINT) AS promo_rev,
        |    CAST(sum(rev) AS BIGINT) AS total_rev
        |  FROM j GROUP BY ym)
        |SELECT ym, promo_rev, total_rev,
        |  (promo_rev * 1000000) // total_rev AS promo_ppm
        |FROM g ORDER BY ym""".stripMargin,

    "q16_brand_suppliers" ->
      """SELECT p_brand,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "win_first_last" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |w AS (SELECT user_id, day, event_type,
        |    first_value(event_type) OVER fr AS first_type,
        |    last_value(event_type) OVER fr AS last_type,
        |    nth_value(event_type, 2) OVER fr AS second_type
        |  FROM e WINDOW fr AS (PARTITION BY user_id, day
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, count(*) AS n,
        |  min(first_type) AS first_type, min(last_type) AS last_type,
        |  min(second_type) AS second_type
        |FROM w GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,

    "fn_regex_extract" ->
      """SELECT p_partkey,
        |  coalesce(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]', 0)) AS BIGINT)
        |    AS n_vowels,
        |  CAST(CASE WHEN regexp_matches(p_name, '[0-9]') THEN 1 ELSE 0 END
        |    AS BIGINT) AS has_digit,
        |  replace(p_brand, '#', '-') AS brand_norm
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin
  )
}
