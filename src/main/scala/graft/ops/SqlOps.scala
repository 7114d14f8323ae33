package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** §2.41 SQL-text entry & inferred pivots — the `spark.sql` front door
  * (temp views + a multi-CTE ANSI query through Spark's parser/analyzer,
  * proving the engine is usable as a SQL endpoint, not only through the
  * DataFrame API) and the value-inferring pivot path.
  *
  * Scale shapes (100 TB notes):
  *  - sql_text_entry: the SQL text lowers to the SAME Catalyst plan the
  *    DataFrame API produces — broadcast dims, key-shuffled fact joins,
  *    partial aggregation; nothing about the entry path changes physics.
  *  - agg_pivot_inferred: Spark's pivot-without-values runs one DISTINCT
  *    collect over the pivot column (bounded: |event types|) before
  *    planning — fine for low-cardinality pivots, the documented
  *    anti-pattern for unbounded ones (use explicit values there).
  */
object SqlOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-CTE ANSI SQL through spark.sql over temp views: revenue and
    // order counts per market segment for orders with ≥ 3 lineitems —
    // CTE + join + HAVING-style filtering, parsed not built.
    "sql_text_entry" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        WITH big AS (
          SELECT l_orderkey, count(*) AS n_lines,
                 sum(cast(floor(l_extendedprice) AS bigint)) AS rev
          FROM v_lineitem GROUP BY l_orderkey HAVING count(*) >= 3
        )
        SELECT c.c_mktsegment, count(*) AS n_orders,
               sum(big.n_lines) AS n_lines, sum(big.rev) AS rev
        FROM big
        JOIN v_orders o ON big.l_orderkey = o.o_orderkey
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment""")
    }),

    // Pivot with INFERRED values: per user bucket, one column per
    // observed event type (Spark collects the distinct pivot values —
    // bounded here — then plans the same conditional aggregate as the
    // explicit-values form).
    "agg_pivot_inferred" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(expr("user_id % 10").as("user_bucket"))
        .pivot("event_type")
        .count()
        .orderBy("user_bucket"))
  )

  def oracles: Map[String, String] = Map(
    "sql_text_entry" ->
      """WITH big AS (SELECT l_orderkey, count(*) AS n_lines,
        |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 3)
        |SELECT c.c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(big.n_lines) AS BIGINT) AS n_lines,
        |  CAST(sum(big.rev) AS BIGINT) AS rev
        |FROM big
        |JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "agg_pivot_inferred" ->
      """SELECT user_id % 10 AS user_bucket,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin
  )
}
