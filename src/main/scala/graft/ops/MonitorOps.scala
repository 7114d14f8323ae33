package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.30 feed monitoring & temporal decomposition — the operational
  * dashboard over a live feed: consumer lag, calendar-decomposition
  * anomalies, naive-seasonal forecast error, and burst detection. All
  * heavy lifting is one aggregation of the event stream into a
  * calendar-sized (type, day/hour) relation; every window and ratio runs
  * over that aggregate.
  *
  * Scale shapes (100 TB notes):
  *  - feed_consumer_lag: committed offsets are a 4-row synthetic table
  *    (quartiles of max id); lag counts come from ONE pass over events
  *    with each row contributing to the consumers whose offset it
  *    exceeds — a ≤4× conditional-sum fanout, no join against events.
  *  - ts_calendar_residual: the independence decomposition (T_d·S_h /
  *    total) reuses the chi-square expected-cell algebra over the
  *    |days|×24 grid.
  *  - ts_forecast_eval_naive / events_burst_detect: lag windows over the
  *    per-type daily series (calendar-sized).
  */
object MonitorOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Consumer-group lag: four synthetic consumers committed at the
    // 0/25/50/75% quantile offsets of the feed (deterministic integer
    // fractions of max event_id); per consumer: committed offset, events
    // behind head, and lag share of the feed in ppm. One pass over
    // events — each row increments the lagging consumers' counters via
    // conditional sums against the broadcast 4-row offset table.
    "feed_consumer_lag" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"))
      val mx = ev.agg(max("event_id").as("mx"), count(lit(1)).as("n"))
      val consumers = mx.select(explode(array(
          (0 to 3).map(i => struct(lit(s"consumer_$i").as("consumer"),
            expr(s"(mx * $i) div 4").as("committed"))): _*)).as("c"),
          col("n"))
        .select(col("c.consumer").as("consumer"),
          col("c.committed").as("committed"), col("n"))
      ev.crossJoin(broadcast(consumers))
        .filter(col("event_id") > col("committed"))
        .groupBy("consumer", "committed", "n")
        .agg(count(lit(1)).as("lag_events"))
        .withColumn("lag_ppm", expr("(lag_events * 1000000) div n"))
        .select("consumer", "committed", "lag_events", "lag_ppm")
        .orderBy("consumer")
    }),

    // Calendar anomaly cells: decompose the (day × hour-of-day) count
    // grid per event type under the independence model expected =
    // T_d·S_h div total (the chi-square expected-cell algebra as a TIME
    // decomposition); report the 20 largest |observed − expected|
    // residual cells — "this hour broke its daily and weekly shape".
    "ts_calendar_residual" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts_us div 86400000000").as("day"),
          expr("(ts_us div 3600000000) % 24").as("hour"))
        .agg(count(lit(1)).as("x"))
      val wT = Window.partitionBy("event_type")
      val wD = Window.partitionBy("event_type", "day")
      val wH = Window.partitionBy("event_type", "hour")
      grid
        .withColumn("td", sum("x").over(wD))
        .withColumn("sh", sum("x").over(wH))
        .withColumn("tot", sum("x").over(wT))
        .withColumn("expected", expr("(td * sh) div tot"))
        .withColumn("resid", abs(col("x") - col("expected")))
        .orderBy(col("resid").desc, col("event_type"), col("day"),
          col("hour"))
        .limit(20)
        .select("event_type", "day", "hour", "x", "expected", "resid")
        .orderBy("event_type", "day", "hour")
    }),

    // Seasonality strength per type: 1 − SSR/SST over the (day × hour)
    // grid, with the expected cell from the same independence model as
    // ts_calendar_residual. SST is cross-multiplied by n² to stay
    // integral; the final ratio is evaluated in identically-shaped
    // doubles (the exact-int inputs stay below 2^53 here).
    "ts_seasonality_strength" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts_us div 86400000000").as("day"),
          expr("(ts_us div 3600000000) % 24").as("hour"))
        .agg(count(lit(1)).as("x"))
      val wT = Window.partitionBy("event_type")
      val wD = Window.partitionBy("event_type", "day")
      val wH = Window.partitionBy("event_type", "hour")
      grid
        .withColumn("td", sum("x").over(wD))
        .withColumn("sh", sum("x").over(wH))
        .withColumn("tot", sum("x").over(wT))
        .withColumn("nc", count(lit(1)).over(wT))
        .withColumn("resid", col("x") - expr("(td * sh) div tot"))
        .groupBy(col("event_type"), col("nc"))
        .agg(sum(expr("(x * nc - tot) * (x * nc - tot)")).as("sst_s"),
          sum(col("resid") * col("resid")).as("ssr"))
        .withColumn("strength_ppm", when(col("sst_s") > 0, floor(
          (col("sst_s").cast("double") -
            col("ssr").cast("double") * col("nc").cast("double") *
              col("nc").cast("double")) /
            col("sst_s").cast("double") * lit(1000000.0)).cast("long")))
        .select(col("event_type"), col("nc").as("n_cells"),
          col("strength_ppm"))
        .orderBy("event_type")
    }),

    // Single-bin DFT spectral energy at the weekly and monthly
    // frequencies of each type's daily-count series — the periodogram
    // peaks a seasonality detector reads. cos/sin enter as
    // PRE-TABULATED integer literals over day mod 7 / day mod 30 (the
    // NDCG discount discipline: both engines index the SAME generated
    // table, so no libm in any compared value); the Fourier sums and
    // their squared moduli are exact int64 (1e3 scale keeps
    // (Σc·cos)² < 2⁶³ at any realistic daily volume).
    "ts_dft_energy" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      def lits(period: Int, f: Double => Double): Column =
        array((0 until period).map(k => lit(math.floor(
          f(2.0 * math.Pi * k / period) * 1000.0).toLong)): _*)
      val scored = daily
        .withColumn("p7", (col("day") % 7).cast("int"))
        .withColumn("p30", (col("day") % 30).cast("int"))
        .withColumn("c7", element_at(lits(7, math.cos), col("p7") + 1))
        .withColumn("s7", element_at(lits(7, math.sin), col("p7") + 1))
        .withColumn("c30", element_at(lits(30, math.cos), col("p30") + 1))
        .withColumn("s30", element_at(lits(30, math.sin), col("p30") + 1))
      scored.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("c") * col("c7")).as("a7"),
          sum(col("c") * col("s7")).as("b7"),
          sum(col("c") * col("c30")).as("a30"),
          sum(col("c") * col("s30")).as("b30"))
        .withColumn("e7", col("a7") * col("a7") + col("b7") * col("b7"))
        .withColumn("e30", col("a30") * col("a30") + col("b30") * col("b30"))
        .select(col("event_type"), col("n_days"), col("a7"), col("b7"),
          col("e7"), col("a30"), col("b30"), col("e30"))
        .orderBy("event_type")
    }),

    // SAX-style symbolization of each type's daily-count series (the
    // symbolic form motif/anomaly miners index): alphabet-4 symbols by
    // RANK quartile (exact integer rank, not normal-curve breakpoints —
    // no z-normalization float enters any compared value), then PAA
    // into 8 equal day-span segments, each reporting its day count,
    // mean level (×100 integer), and dominant symbol (mode, ties to the
    // lower symbol via the min-struct trick). Windows are per-type over
    // the calendar-sized daily relation only.
    "ts_sax_symbolize" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val wT = Window.partitionBy("event_type")
      val sym = daily
        .withColumn("r", row_number().over(
          Window.partitionBy("event_type").orderBy("c", "day")).cast("long"))
        .withColumn("n", count(lit(1)).over(wT))
        .withColumn("mnd", min("day").over(wT))
        .withColumn("mxd", max("day").over(wT))
        .withColumn("symbol", expr("((r - 1) * 4) div n"))
        .withColumn("seg", expr("((day - mnd) * 8) div (mxd - mnd + 1)"))
      sym.groupBy("event_type", "seg", "symbol")
        .agg(count(lit(1)).as("sc"), sum("c").as("csum"))
        .groupBy("event_type", "seg")
        .agg(sum("sc").as("n_days"), sum("csum").as("ctot"),
          max(struct(col("sc"), (-col("symbol")).as("ns"))).as("m"))
        .select(col("event_type"), col("seg"),
          col("n_days"), expr("(ctot * 100) div n_days").as("mean_c100"),
          (-col("m.ns")).as("dom_symbol"))
        .orderBy("event_type", "seg")
    }),

    // Naive seasonal forecast evaluation: forecast(day) = count(day−7)
    // per type; report days evaluated and the MAE in count units ×100
    // (integer). The baseline every real forecaster must beat.
    "ts_forecast_eval_naive" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.withColumn("fc", lag(col("x"), 7).over(w))
        .filter(col("fc").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("x") - col("fc"))).as("sae"))
        .withColumn("mae_x100", expr("(sae * 100) div n_days"))
        .select("event_type", "n_days", "mae_x100")
        .orderBy("event_type")
    }),

    // Longest consecutive-day activity streak per event type: the
    // classic gaps-and-islands (day − row_number is constant within a
    // run) over the calendar-sized daily relation; reports the longest
    // streak's length and start day plus the streak count.
    "ts_longest_streak" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val runs = daily
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("event_type", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      runs.groupBy("event_type")
        .agg(count(lit(1)).as("n_streaks"),
          max(struct(col("len"), (-col("start_day")).as("nd"))).as("m"))
        .select(col("event_type"), col("n_streaks"),
          col("m.len").as("longest"), (-col("m.nd")).as("start_day"))
        .orderBy("event_type")
    }),

    // Sliding 7-day median of the daily series, EXACT and window-sort
    // free: the 7 trailing values become a per-row array (7 lags),
    // array_sort picks element 4 — integer arithmetic only, emitted for
    // full windows. (A median() window function would sort per frame;
    // the lag-array form is pure projection over the calendar relation.)
    "ts_sliding_median" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagged = (0 to 6).foldLeft(daily) { (df, k) =>
        df.withColumn(s"x$k", lag(col("x"), k).over(w))
      }
      lagged.filter(col("x6").isNotNull)
        .withColumn("med7", expr(
          "array_sort(array(x0, x1, x2, x3, x4, x5, x6))[3]"))
        .select("event_type", "day", "x", "med7")
        .orderBy("event_type", "day")
    }),

    // Pareto revenue concentration: the minimum number of customers
    // covering 50/80/90% of total revenue, from the customer-revenue
    // value histogram consumed from the TOP — the 80/20 curve in three
    // integer rows.
    "orders_value_pareto" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice")).cast("long")).as("r"))
      val hist = rev.groupBy("r").agg(count(lit(1)).as("c"))
      val cum = graft.api.Histograms.cumulativeFold(hist, col("r"),
        Seq(
          graft.api.Histograms.CumSpec(col("r") * col("c"), "cum_rev", Some("tot_rev")),
          graft.api.Histograms.CumSpec(col("c"), "cum_cust", Some("tot_cust"))),
        ascending = false, inclusive = true)
      def need(p: Int) = cum
        .filter(col("cum_rev") * 100 >= col("tot_rev") * p)
        .agg(lit(p.toLong).as("threshold_pct"),
          min("cum_cust").as("n_customers"),
          min(expr("(cum_cust * 1000000) div tot_cust")).as("cust_ppm"))
      need(50).unionByName(need(80)).unionByName(need(90))
        .orderBy("threshold_pct")
    }),

    // Burst detection: 3-day centered window count vs the trailing
    // 14-day daily mean — burst score = window·14·100 div (3·trail14)
    // (≥ 100 = at or above baseline). Top-10 burst days per type.
    "events_burst_detect" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val w3 = w.rowsBetween(-1, 1)
      val w14 = w.rowsBetween(-14, -1)
      val wRk = Window.partitionBy("event_type")
        .orderBy(col("score_x100").desc, col("day"))
      daily
        .withColumn("win3", sum("x").over(w3))
        .withColumn("n14", count(lit(1)).over(w14))
        .withColumn("trail14", sum("x").over(w14))
        .filter(col("n14") === 14)
        .withColumn("score_x100",
          expr("(win3 * 14 * 100) div (3 * trail14)"))
        .withColumn("rk", row_number().over(wRk).cast("long"))
        .filter(col("rk") <= 10)
        .select("event_type", "rk", "day", "x", "score_x100")
        .orderBy("event_type", "rk")
    })
  )

  def oracles: Map[String, String] = Map(
    "ts_sax_symbolize" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS r,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    min(day) OVER (PARTITION BY event_type) AS mnd,
        |    max(day) OVER (PARTITION BY event_type) AS mxd
        |  FROM daily),
        |sym AS (SELECT event_type, day, c,
        |    ((r - 1) * 4) // n AS symbol,
        |    ((day - mnd) * 8) // (mxd - mnd + 1) AS seg
        |  FROM rk),
        |sc AS (SELECT event_type, seg, symbol, count(*) AS sc,
        |    CAST(sum(c) AS BIGINT) AS csum
        |  FROM sym GROUP BY 1, 2, 3),
        |agg AS (SELECT event_type, seg,
        |    CAST(sum(sc) AS BIGINT) AS n_days, CAST(sum(csum) AS BIGINT) AS ctot,
        |    first(symbol ORDER BY sc DESC, symbol) AS dom_symbol
        |  FROM sc GROUP BY 1, 2)
        |SELECT event_type, seg, n_days, (ctot * 100) // n_days AS mean_c100,
        |  dom_symbol
        |FROM agg ORDER BY event_type, seg""".stripMargin,

    "ts_dft_energy" -> {
      def litList(period: Int, f: Double => Double): String =
        (0 until period).map(k => math.floor(
          f(2.0 * math.Pi * k / period) * 1000.0).toLong)
          .mkString("list_value(", ", ", ")")
      s"""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |sc AS (SELECT event_type, c,
        |    ${litList(7, math.cos)}[CAST(day % 7 AS INT) + 1] AS c7,
        |    ${litList(7, math.sin)}[CAST(day % 7 AS INT) + 1] AS s7,
        |    ${litList(30, math.cos)}[CAST(day % 30 AS INT) + 1] AS c30,
        |    ${litList(30, math.sin)}[CAST(day % 30 AS INT) + 1] AS s30
        |  FROM daily),
        |agg AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(c * c7) AS BIGINT) AS a7, CAST(sum(c * s7) AS BIGINT) AS b7,
        |    CAST(sum(c * c30) AS BIGINT) AS a30, CAST(sum(c * s30) AS BIGINT) AS b30
        |  FROM sc GROUP BY event_type)
        |SELECT event_type, n_days, a7, b7, a7 * a7 + b7 * b7 AS e7,
        |  a30, b30, a30 * a30 + b30 * b30 AS e30
        |FROM agg ORDER BY event_type""".stripMargin
    },

    "feed_consumer_lag" ->
      """WITH m AS (SELECT max(event_id) AS mx, count(*) AS n FROM events),
        |c AS (SELECT 'consumer_' || i AS consumer, (mx * i) // 4 AS committed,
        |    n
        |  FROM m, unnest(generate_series(0, 3)) u(i)),
        |l AS (SELECT c.consumer, c.committed, c.n, count(*) AS lag_events
        |  FROM events e JOIN c ON e.event_id > c.committed
        |  GROUP BY 1, 2, 3)
        |SELECT consumer, CAST(committed AS BIGINT) AS committed,
        |  lag_events, (lag_events * 1000000) // n AS lag_ppm
        |FROM l ORDER BY consumer""".stripMargin,

    "ts_calendar_residual" ->
      """WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour, count(*) AS x
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT *, CAST(sum(x) OVER (PARTITION BY event_type, day)
        |      AS BIGINT) AS td,
        |    CAST(sum(x) OVER (PARTITION BY event_type, hour) AS BIGINT) AS sh,
        |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM g),
        |e AS (SELECT *, (td * sh) // tot AS expected,
        |    abs(x - (td * sh) // tot) AS resid FROM w),
        |top AS (SELECT * FROM e
        |  ORDER BY resid DESC, event_type, day, hour LIMIT 20)
        |SELECT event_type, day, hour, x, CAST(expected AS BIGINT) AS expected,
        |  CAST(resid AS BIGINT) AS resid
        |FROM top ORDER BY event_type, day, hour""".stripMargin,

    "ts_sliding_median" -> {
      val lags = (0 to 6).map(k =>
        s"lag(x, $k) OVER (PARTITION BY event_type ORDER BY day) AS x$k")
        .mkString(", ")
      s"""WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |lg AS (SELECT event_type, day, x, $lags FROM dly)
        |SELECT event_type, day, x,
        |  CAST(list_sort([x0, x1, x2, x3, x4, x5, x6])[4] AS BIGINT) AS med7
        |FROM lg WHERE x6 IS NOT NULL
        |ORDER BY event_type, day""".stripMargin
    },

    "orders_value_pareto" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |h AS (SELECT r, count(*) AS c FROM rev GROUP BY 1),
        |cm AS (SELECT *,
        |    CAST(sum(r * c) OVER (ORDER BY r DESC) AS BIGINT) AS cum_rev,
        |    CAST(sum(c) OVER (ORDER BY r DESC) AS BIGINT) AS cum_cust,
        |    CAST(sum(r * c) OVER () AS BIGINT) AS tot_rev,
        |    CAST(sum(c) OVER () AS BIGINT) AS tot_cust
        |  FROM h),
        |q AS (SELECT 50 AS threshold_pct, min(cum_cust) AS n_customers,
        |    CAST(min((cum_cust * 1000000) // tot_cust) AS BIGINT)
        |      AS cust_ppm
        |  FROM cm WHERE cum_rev * 100 >= tot_rev * 50
        |  UNION ALL
        |  SELECT 80, min(cum_cust),
        |    CAST(min((cum_cust * 1000000) // tot_cust) AS BIGINT)
        |  FROM cm WHERE cum_rev * 100 >= tot_rev * 80
        |  UNION ALL
        |  SELECT 90, min(cum_cust),
        |    CAST(min((cum_cust * 1000000) // tot_cust) AS BIGINT)
        |  FROM cm WHERE cum_rev * 100 >= tot_rev * 90)
        |SELECT CAST(threshold_pct AS BIGINT) AS threshold_pct,
        |  CAST(n_customers AS BIGINT) AS n_customers, cust_ppm
        |FROM q ORDER BY threshold_pct""".stripMargin,

    "ts_seasonality_strength" ->
      """WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour, count(*) AS x
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT *, CAST(sum(x) OVER (PARTITION BY event_type, day)
        |      AS BIGINT) AS td,
        |    CAST(sum(x) OVER (PARTITION BY event_type, hour) AS BIGINT) AS sh,
        |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nc
        |  FROM g),
        |r AS (SELECT *, x - (td * sh) // tot AS resid FROM w),
        |a AS (SELECT event_type, nc,
        |    CAST(sum((x * nc - tot) * (x * nc - tot)) AS BIGINT) AS sst_s,
        |    CAST(sum(resid * resid) AS BIGINT) AS ssr
        |  FROM r GROUP BY 1, 2)
        |SELECT event_type, nc AS n_cells,
        |  CASE WHEN sst_s > 0 THEN CAST(floor(
        |    (CAST(sst_s AS DOUBLE) - CAST(ssr AS DOUBLE) *
        |      CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE))
        |    / CAST(sst_s AS DOUBLE) * 1000000.0) AS BIGINT)
        |  ELSE NULL END AS strength_ppm
        |FROM a ORDER BY event_type""".stripMargin,

    "ts_forecast_eval_naive" ->
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT *, lag(x, 7) OVER (PARTITION BY event_type
        |    ORDER BY day) AS fc FROM dly)
        |SELECT event_type, count(*) AS n_days,
        |  CAST((sum(abs(x - fc)) * 100) // count(*) AS BIGINT) AS mae_x100
        |FROM f WHERE fc IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_longest_streak" ->
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, day - row_number() OVER (PARTITION BY event_type
        |    ORDER BY day) AS grp FROM dly),
        |runs AS (SELECT event_type, grp, count(*) AS len,
        |    CAST(min(day) AS BIGINT) AS start_day FROM r GROUP BY 1, 2),
        |n AS (SELECT event_type, count(*) AS n_streaks FROM runs GROUP BY 1),
        |best AS (SELECT event_type, len, start_day FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY len DESC, start_day) AS rn FROM runs) WHERE rn = 1)
        |SELECT n.event_type, n.n_streaks, CAST(best.len AS BIGINT) AS longest,
        |  best.start_day
        |FROM n JOIN best ON n.event_type = best.event_type
        |ORDER BY n.event_type""".stripMargin,

    "events_burst_detect" ->
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS win3,
        |    count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS n14,
        |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail14
        |  FROM dly),
        |sc AS (SELECT event_type, day, x,
        |    (win3 * 14 * 100) // (3 * trail14) AS score_x100
        |  FROM w WHERE n14 = 14),
        |rnk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY score_x100 DESC, day) AS rk FROM sc)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, day, x,
        |  CAST(score_x100 AS BIGINT) AS score_x100
        |FROM rnk WHERE rk <= 10 ORDER BY event_type, rk""".stripMargin
  )
}
