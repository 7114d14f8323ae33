package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.40 journeys, repeat behavior & market concentration — second-order
  * Markov transitions over user journeys, the repeat-purchase rate, and
  * the Herfindahl-Hirschman concentration index, each a pure-integer
  * aggregate chain.
  *
  * Scale shapes (100 TB notes):
  *  - journey_second_order: two user-partitioned lags, then a
  *    |types|³-bounded transition aggregate; probabilities integer-ppm
  *    within each context pair.
  *  - repeat_purchase_rate: (part, customer) distinct-order counts
  *    shuffle once on the pair key; the per-part report is a second
  *    combinable aggregate.
  *  - supplier_hhi: HHI·1e6 = Σ cnt² · 1e6 div total² — all integer, one
  *    (brand, supplier) aggregate then a brand aggregate.
  */
object JourneyOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Second-order Markov transitions: P(next | prev2, prev1) over each
    // user's time-ordered event types — counts and within-context ppm,
    // top-30 contexts by count (ties lexicographic).
    "journey_second_order" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val tri = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type").as("nxt"))
        .withColumn("p1", lag(col("nxt"), 1).over(w))
        .withColumn("p2", lag(col("nxt"), 2).over(w))
        .filter(col("p2").isNotNull)
        .groupBy("p2", "p1", "nxt").agg(count(lit(1)).as("c"))
      val wCtx = Window.partitionBy("p2", "p1")
      tri
        .withColumn("ctx_n", sum("c").over(wCtx))
        .withColumn("p_ppm", expr("(c * 1000000) div ctx_n"))
        .orderBy(col("c").desc, col("p2"), col("p1"), col("nxt"))
        .limit(30)
        .select("p2", "p1", "nxt", "c", "ctx_n", "p_ppm")
        .orderBy("p2", "p1", "nxt")
    }),

    // Repeat-purchase rate per part: customers who bought it in ≥2
    // DISTINCT orders over customers who bought it at all — top-20 parts
    // by repeat ppm (min 5 buyers; ties by part key).
    "repeat_purchase_rate" -> ((s, d) => {
      val pc = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"), col("o_custkey"))
        .agg(count_distinct(col("l_orderkey")).as("n_orders"))
      pc.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_buyers"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L))
            .as("n_repeat"))
        .filter(col("n_buyers") >= 5)
        .withColumn("repeat_ppm", expr("(n_repeat * 1000000) div n_buyers"))
        .orderBy(col("repeat_ppm").desc, col("l_partkey"))
        .limit(20)
        .orderBy("l_partkey")
    }),

    // LINEAR multi-touch attribution — the equal-credit counterpart of
    // the last-touch operator: every purchase splits 1e6 credit units
    // equally across its user's touch events in the preceding hour
    // (integer div; the remainder stays unassigned, reported alongside).
    // The purchase⋈touch join is the bounded interval-join shape: keyed
    // on user, time-banded to one hour.
    "attribution_linear" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("pid"),
          col("ts_us").as("pts"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("tu"), col("event_type").as("touch"),
          col("ts_us").as("tts"))
      val joined = purchases.join(touches,
        col("pu") === col("tu") && col("tts") < col("pts") &&
          col("tts") >= col("pts") - 3600000000L)
      val perPurchase = joined.groupBy("pid")
        .agg(count(lit(1)).as("n_touch"))
      joined.join(perPurchase, "pid")
        .groupBy("touch")
        .agg(count(lit(1)).as("n_credits"),
          sum(expr("1000000 div n_touch")).as("credit_ppm_sum"))
        .orderBy("touch")
    }),

    // Supplier concentration per brand (Herfindahl-Hirschman): HHI·1e6 =
    // Σ cnt² · 1e6 div total² over each brand's supplier line shares —
    // pure integer; 1e6 = monopoly.
    "supplier_hhi" -> ((s, d) => {
      val bs = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(count(lit(1)).as("c"))
      bs.groupBy("p_brand")
        .agg(count(lit(1)).as("n_suppliers"), sum("c").as("total"),
          sum(col("c") * col("c")).as("sum_sq"))
        .withColumn("hhi_ppm", expr("(sum_sq * 1000000) div (total * total)"))
        .select("p_brand", "n_suppliers", "total", "hhi_ppm")
        .orderBy("p_brand")
    })
  )

  def oracles: Map[String, String] = Map(
    "journey_second_order" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    event_type AS nxt FROM events),
        |l AS (SELECT *, lag(nxt, 1) OVER w AS p1, lag(nxt, 2) OVER w AS p2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |t AS (SELECT p2, p1, nxt, count(*) AS c FROM l
        |  WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |x AS (SELECT *, CAST(sum(c) OVER (PARTITION BY p2, p1) AS BIGINT)
        |    AS ctx_n FROM t),
        |top AS (SELECT * FROM x ORDER BY c DESC, p2, p1, nxt LIMIT 30)
        |SELECT p2, p1, nxt, c, ctx_n, (c * 1000000) // ctx_n AS p_ppm
        |FROM top ORDER BY p2, p1, nxt""".stripMargin,

    "repeat_purchase_rate" ->
      """WITH pc AS (SELECT l_partkey, o_custkey,
        |    count(DISTINCT l_orderkey) AS n_orders
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |p AS (SELECT l_partkey, count(*) AS n_buyers,
        |    CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_repeat
        |  FROM pc GROUP BY 1),
        |f AS (SELECT *, (n_repeat * 1000000) // n_buyers AS repeat_ppm
        |  FROM p WHERE n_buyers >= 5),
        |top AS (SELECT * FROM f
        |  ORDER BY repeat_ppm DESC, l_partkey LIMIT 20)
        |SELECT l_partkey, n_buyers, n_repeat, repeat_ppm
        |FROM top ORDER BY l_partkey""".stripMargin,

    "attribution_linear" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    event_type FROM events),
        |p AS (SELECT user_id AS pu, event_id AS pid, ts_us AS pts FROM e
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS tu, event_type AS touch, ts_us AS tts
        |  FROM e WHERE event_type <> 'purchase'),
        |j AS (SELECT p.pid, t.touch FROM p JOIN t ON p.pu = t.tu
        |  AND t.tts < p.pts AND t.tts >= p.pts - 3600000000),
        |n AS (SELECT pid, count(*) AS n_touch FROM j GROUP BY 1)
        |SELECT j.touch, count(*) AS n_credits,
        |  CAST(sum(1000000 // n.n_touch) AS BIGINT) AS credit_ppm_sum
        |FROM j JOIN n ON j.pid = n.pid
        |GROUP BY 1 ORDER BY j.touch""".stripMargin,

    "supplier_hhi" ->
      """WITH bs AS (SELECT p_brand, l_suppkey, count(*) AS c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, count(*) AS n_suppliers,
        |  CAST(sum(c) AS BIGINT) AS total,
        |  (CAST(sum(c * c) AS BIGINT) * 1000000)
        |    // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS hhi_ppm
        |FROM bs GROUP BY 1 ORDER BY p_brand""".stripMargin
  )
}
