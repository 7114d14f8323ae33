package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.canon

/** §2.19 fixed-memory quantiles, no-equi-key range join, CDC merge, and
  * ANN quality evaluation — the maintenance & evaluation operators around
  * a lakehouse-resident corpus. All oracle-checked; the quantile sketch
  * and the range join are INTEGER-exact end to end (values quantized
  * before any bucketing/compare), so not a single float decides a row.
  *
  * Scale shapes:
  *  - quantile_hist: per-group state is a fixed 256-cell histogram —
  *    the fixed-memory alternative to exact `percentile`'s full value
  *    multiset; cumulative windows run over the 256-row histogram;
  *  - join_range_banded: time-banding replaces the equi-key a pure range
  *    join lacks — each probe row joins ≤ 3 band buckets instead of the
  *    whole other side (the interval-join pattern when nothing equi
  *    exists);
  *  - cdc_merge_snapshot: latest-change-per-key is one map-side-
  *    combinable max_by; the merge is a key-partitioned left join
  *    (MERGE INTO's shuffle shape);
  *  - ann_recall_eval: composes two library operators; the join is on
  *    the tiny (query, neighbor) result sets.
  */
object MaintOps {

  private val BandUs = 1800000000L // 30 minutes

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fixed-memory quantile estimation per event type: values quantized
    // to integer units, a 256-bucket equi-width histogram (pure integer
    // bucket arithmetic), p50/p95/p99 read off the cumulative counts as
    // bucket lower edges. Exact `percentile` sorts the full multiset;
    // this keeps 256 cells per group no matter the data volume — and
    // unlike t-digest/KLL the result is bit-reproducible (oracle-checked).
    "quantile_hist" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), canon(col("value")).as("vi"))
      val st = ev.groupBy("event_type")
        .agg(min("vi").as("mn"), max("vi").as("mx"), count(lit(1)).as("n"))
      val hist = ev.join(broadcast(st), "event_type")
        .withColumn("bk", expr("((vi - mn) * 256) div (mx - mn + 1)"))
        .groupBy("event_type", "bk").agg(count(lit(1)).as("c"))
      val wc = Window.partitionBy("event_type").orderBy("bk")
      val cum = hist.withColumn("cum", sum("c").over(wc))
        .join(broadcast(st), "event_type")
      def qb(p: Int): Column =
        min(when(col("cum") * 100 >= col("n") * p, col("bk")))
      cum.groupBy("event_type")
        .agg(first("n").as("n"), qb(50).as("b50"), qb(95).as("b95"),
          qb(99).as("b99"), first("mn").as("mn"), first("mx").as("mx"))
        .select(col("event_type"), col("n"),
          (col("mn") + expr("(b50 * (mx - mn + 1)) div 256")).as("est50_c"),
          (col("mn") + expr("(b95 * (mx - mn + 1)) div 256")).as("est95_c"),
          (col("mn") + expr("(b99 * (mx - mn + 1)) div 256")).as("est99_c"))
        .orderBy("event_type")
    }),

    // Range join with NO equi key: every event within ±30 min of each
    // error event, counted per error. Banding the timeline into 30-min
    // buckets gives the equi key the join lacks — each error replicates
    // to 3 adjacent buckets, each event sits in exactly ONE bucket (so a
    // qualifying pair joins exactly once; no distinct needed), and the
    // |Δt| ≤ 30 min residual runs only within colliding buckets. The
    // naive form is an inequality cross join — quadratic at 100 TB.
    "join_range_banded" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("ts_us"))
      val err = Tables.events(s, d).filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts_us").as("err_us"))
      val errB = err.withColumn("bk",
        explode(array((-1 to 1).map(i => expr(s"err_us div $BandUs") + i): _*)))
      val evB = ev.withColumn("bk", expr(s"ts_us div $BandUs"))
      evB.join(errB, "bk")
        .filter(abs(col("ts_us") - col("err_us")) <= BandUs &&
          col("event_id") =!= col("err_id"))
        .groupBy("err_id").agg(count(lit(1)).as("n_nearby"))
        .orderBy("err_id")
    }),

    // CDC merge (MERGE INTO shape): the event feed as a change stream
    // against the customer snapshot — latest change per key wins, an
    // 'error' change deletes the row, any other change updates the
    // balance, untouched rows pass through. One max_by aggregate (map-
    // side combinable: the 100 TB change log reduces before it shuffles)
    // + one key-partitioned left join.
    "cdc_merge_snapshot" -> ((s, d) => {
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val ch = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("event_id"), col("event_type"), col("value")).as("st"))
        .groupBy("user_id")
        .agg(expr("max_by(st, st.event_id)").as("st"))
        .select(col("user_id").as("c_custkey"),
          col("st.event_type").as("ch_type"), col("st.value").as("ch_value"))
      base.join(ch, Seq("c_custkey"), "left")
        .filter(col("ch_type").isNull || col("ch_type") =!= "error")
        .select(col("c_custkey"),
          when(col("ch_type").isNotNull, 1L).otherwise(0L).as("updated"),
          coalesce(canon(col("ch_value")), canon(col("c_acctbal"))).as("bal_c"))
        .orderBy("c_custkey")
    }),

    // Mergeable moment sketches: per-(type, day) partials (n, Σv, Σv²)
    // combined into per-type mean and population variance — the
    // incremental-statistics maintenance loop (nightly partials, exact
    // merge; the moments analog of quantile_hist_merge). Variance stays
    // integer: (n·Σv² − (Σv)²) div n² in v_c² units. Values quantize
    // at 1e2 (not the usual 1e4): (Σv)² must stay inside int64, and
    // v ≤ ~560 × 2e4 rows × 1e2 keeps it at ~1.3e18. (Promote to
    // DECIMAL(38,0) for finer scales or bigger types — shape unchanged.)
    "stats_moments_merge" -> ((s, d) => {
      val partials = Tables.events(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v_c"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("pn"), sum("v_c").as("ps1"),
          sum(col("v_c") * col("v_c")).as("ps2"))
      partials.groupBy("event_type")
        .agg(count(lit(1)).as("n_partials"), sum("pn").as("n"),
          sum("ps1").as("s1"), sum("ps2").as("s2"))
        .withColumn("mean_c", expr("s1 div n"))
        .withColumn("var_vc2", expr("(n * s2 - s1 * s1) div (n * n)"))
        .select("event_type", "n_partials", "n", "mean_c", "var_vc2")
        .orderBy("event_type")
    }),

    // Quantile-sketch MERGEABILITY proven differentially (the
    // sketch_kmv_merge pattern): per-(type, day) partial 256-bucket
    // histograms — what each ingest shard builds independently — merged
    // by bucket-wise sum, then the same quantile extraction as
    // quantile_hist. Lossless BECAUSE the bucket edges are global
    // (min/max fixed before bucketing, a cheap two-pass): a sketch whose
    // parameters depend on its own shard's data would not merge. The
    // oracle makes the partial stage explicit, so a lossy merge would
    // hash-mismatch; merged ≡ direct is additionally asserted in
    // MaintOpsSuite.
    "quantile_hist_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), canon(col("value")).as("vi"),
          to_date(timestamp_micros(col("ts_us"))).as("day"))
      val st = ev.groupBy("event_type")
        .agg(min("vi").as("mn"), max("vi").as("mx"), count(lit(1)).as("n"))
      val partial = ev.join(broadcast(st), "event_type")
        .withColumn("bk", expr("((vi - mn) * 256) div (mx - mn + 1)"))
        .groupBy("event_type", "day", "bk").agg(count(lit(1)).as("c"))
      val hist = partial.groupBy("event_type", "bk").agg(sum("c").as("c"))
      val wc = Window.partitionBy("event_type").orderBy("bk")
      val cum = hist.withColumn("cum", sum("c").over(wc))
        .join(broadcast(st), "event_type")
      def qb(p: Int): Column =
        min(when(col("cum") * 100 >= col("n") * p, col("bk")))
      cum.groupBy("event_type")
        .agg(first("n").as("n"), qb(50).as("b50"), qb(95).as("b95"),
          qb(99).as("b99"), first("mn").as("mn"), first("mx").as("mx"))
        .select(col("event_type"), col("n"),
          (col("mn") + expr("(b50 * (mx - mn + 1)) div 256")).as("est50_c"),
          (col("mn") + expr("(b95 * (mx - mn + 1)) div 256")).as("est95_c"),
          (col("mn") + expr("(b99 * (mx - mn + 1)) div 256")).as("est99_c"))
        .orderBy("event_type")
    }),

    // ANN quality evaluation: recall@5 of the IVF nprobe=1 search against
    // the brute-force ground truth, per query — the acceptance gate any
    // approximate index must pass before it replaces the exact path.
    // Composes the two library operators; also reports the summed
    // distance of each list (the distance-inflation signal).
    "ann_recall_eval" -> ((s, d) => {
      val truth = LlmOps.queries("vec_knn_brute")(s, d)
        .select(col("qid"), col("vec_id"), col("dist_c").as("td"))
      val approx = Pipeline.queries("ann_ivf_topk")(s, d)
        .select(col("qid"), col("vec_id"), col("dist_c").as("ad"))
      truth
        .join(approx.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
          Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
          sum("td").as("sum_truth_c"))
        .join(approx.groupBy("qid").agg(sum("ad").as("sum_ann_c")), Seq("qid"))
        .orderBy("qid")
    }),

    // SCD type-2 history build from the CDC-style event feed: per
    // subject, consecutive duplicate states collapse (change detection
    // via user-partitioned lag), each surviving change opens a version
    // valid [ts, next change − 1]; the open version is flagged current.
    // Both windows are subject-partitioned — the standard lakehouse
    // dimension-history derivation, never a self-join.
    "cdc_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val changed = Tables.events(s, d)
        .withColumn("prev_state", lag(col("event_type"), 1).over(w))
        .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type").as("state"),
          col("ts_us").as("valid_from_us"))
      val w2 = Window.partitionBy("user_id")
        .orderBy(col("valid_from_us"), col("event_id"))
      changed
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2) - 1)
        .withColumn("is_current",
          when(col("valid_to_us").isNull, 1L).otherwise(0L))
        .orderBy("user_id", "valid_from_us", "event_id")
    }),

    // Temporal dimension resolution: for a bounded probe panel of events
    // (event_id % 997 = 0), the SCD2 version VALID AT each probe's
    // timestamp — the dimension-at-event-time lookup every fact join
    // against a type-2 dimension performs. The interval join runs
    // key-first (user_id) so each probe only scans its own user's
    // few versions; the range predicate never goes global.
    "scd2_temporal_lookup" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val versions = Tables.events(s, d)
        .withColumn("prev_state", lag(col("event_type"), 1).over(w))
        .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts_us").as("valid_from_us"))
        .withColumn("valid_to_us", coalesce(
          lead(col("valid_from_us"), 1).over(
            Window.partitionBy("user_id").orderBy("valid_from_us")) - 1,
          lit(Long.MaxValue)))
      val probes = Tables.events(s, d)
        .filter(expr("event_id % 997 = 0"))
        .select(col("event_id"), col("user_id").as("pu"), col("ts_us"))
      probes.join(versions, col("pu") === col("user_id") &&
          col("ts_us") >= col("valid_from_us") &&
          col("ts_us") <= col("valid_to_us"))
        .select(col("event_id"), col("user_id"), col("state"),
          col("valid_from_us"))
        .orderBy("event_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "scd2_temporal_lookup" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS prev_state FROM e),
        |v AS (SELECT user_id, event_type AS state, us AS valid_from_us
        |      FROM c WHERE prev_state IS NULL OR prev_state <> event_type),
        |iv AS (SELECT *, coalesce(lead(valid_from_us) OVER (
        |    PARTITION BY user_id ORDER BY valid_from_us) - 1,
        |    9223372036854775807) AS valid_to_us FROM v),
        |p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_id % 997 = 0)
        |SELECT p.event_id, p.user_id, iv.state, iv.valid_from_us
        |FROM p JOIN iv ON p.user_id = iv.user_id
        |  AND p.us >= iv.valid_from_us AND p.us <= iv.valid_to_us
        |ORDER BY p.event_id""".stripMargin,

    "cdc_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS prev_state FROM e),
        |v AS (SELECT user_id, event_id, event_type AS state, us AS valid_from_us
        |      FROM c WHERE prev_state IS NULL OR prev_state <> event_type)
        |SELECT user_id, event_id, state, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, event_id) - 1 AS valid_to_us,
        |  CAST(CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, event_id) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM v ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    // merged per-day moment partials ≡ the direct global moments
    "stats_moments_merge" ->
      """WITH v AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS v_c FROM events),
        |p AS (SELECT event_type, day, count(*) AS pn,
        |    CAST(sum(v_c) AS BIGINT) AS ps1,
        |    CAST(sum(v_c * v_c) AS BIGINT) AS ps2
        |  FROM v GROUP BY 1, 2),
        |g AS (SELECT event_type, count(*) AS n_partials,
        |    CAST(sum(pn) AS BIGINT) AS n, CAST(sum(ps1) AS BIGINT) AS s1,
        |    CAST(sum(ps2) AS BIGINT) AS s2
        |  FROM p GROUP BY 1)
        |SELECT event_type, n_partials, n, s1 // n AS mean_c,
        |  (n * s2 - s1 * s1) // (n * n) AS var_vc2
        |FROM g ORDER BY event_type""".stripMargin,

    // the merge path: per-day partials summed bucket-wise must land the
    // direct histogram's exact quantile estimates (the final result is
    // day-assignment independent — merging is a plain sum)
    "quantile_hist_merge" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS vi,
        |    CAST(ts AS DATE) AS day FROM events),
        |st AS (SELECT event_type, min(vi) AS mn, max(vi) AS mx,
        |    count(*) AS n FROM v GROUP BY event_type),
        |p AS (SELECT v.event_type, day, ((vi - mn) * 256) // (mx - mn + 1) AS bk,
        |    count(*) AS c
        |  FROM v JOIN st ON v.event_type = st.event_type
        |  GROUP BY v.event_type, day, bk),
        |h AS (SELECT event_type, bk, CAST(sum(c) AS BIGINT) AS c
        |  FROM p GROUP BY event_type, bk),
        |cu AS (SELECT event_type, bk,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bk) AS cum FROM h),
        |q AS (SELECT cu.event_type,
        |    min(CASE WHEN cum * 100 >= n * 50 THEN bk END) AS b50,
        |    min(CASE WHEN cum * 100 >= n * 95 THEN bk END) AS b95,
        |    min(CASE WHEN cum * 100 >= n * 99 THEN bk END) AS b99
        |  FROM cu JOIN st ON cu.event_type = st.event_type
        |  GROUP BY cu.event_type)
        |SELECT q.event_type, st.n,
        |  CAST(mn + (b50 * (mx - mn + 1)) // 256 AS BIGINT) AS est50_c,
        |  CAST(mn + (b95 * (mx - mn + 1)) // 256 AS BIGINT) AS est95_c,
        |  CAST(mn + (b99 * (mx - mn + 1)) // 256 AS BIGINT) AS est99_c
        |FROM q JOIN st ON q.event_type = st.event_type
        |ORDER BY q.event_type""".stripMargin,

    "quantile_hist" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS vi FROM events),
        |st AS (SELECT event_type, min(vi) AS mn, max(vi) AS mx,
        |    count(*) AS n FROM v GROUP BY event_type),
        |h AS (SELECT v.event_type, ((vi - mn) * 256) // (mx - mn + 1) AS bk,
        |    count(*) AS c
        |  FROM v JOIN st ON v.event_type = st.event_type
        |  GROUP BY v.event_type, bk),
        |cu AS (SELECT event_type, bk,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bk) AS cum FROM h),
        |q AS (SELECT cu.event_type,
        |    min(CASE WHEN cum * 100 >= n * 50 THEN bk END) AS b50,
        |    min(CASE WHEN cum * 100 >= n * 95 THEN bk END) AS b95,
        |    min(CASE WHEN cum * 100 >= n * 99 THEN bk END) AS b99
        |  FROM cu JOIN st ON cu.event_type = st.event_type
        |  GROUP BY cu.event_type)
        |SELECT q.event_type, st.n,
        |  CAST(mn + (b50 * (mx - mn + 1)) // 256 AS BIGINT) AS est50_c,
        |  CAST(mn + (b95 * (mx - mn + 1)) // 256 AS BIGINT) AS est95_c,
        |  CAST(mn + (b99 * (mx - mn + 1)) // 256 AS BIGINT) AS est99_c
        |FROM q JOIN st ON q.event_type = st.event_type
        |ORDER BY q.event_type""".stripMargin,

    // Same banding as the Spark plan (each error replicated to 3 adjacent
    // 30-min buckets, each event in exactly one) so DuckDB runs the oracle
    // in near-linear time at any scale — the former theta-join form was
    // quadratic and blew the per-key budget at sf1.
    "join_range_banded" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 1800000000 AS bk FROM events),
        |err AS (SELECT event_id AS err_id, epoch_us(ts) AS err_us,
        |    epoch_us(ts) // 1800000000 + b.b AS bk
        |  FROM events, (VALUES (-1), (0), (1)) b(b) WHERE event_type = 'error')
        |SELECT err_id, count(*) AS n_nearby
        |FROM ev JOIN err USING (bk)
        |WHERE abs(ts_us - err_us) <= 1800000000 AND event_id <> err_id
        |GROUP BY err_id ORDER BY err_id""".stripMargin,

    "cdc_merge_snapshot" ->
      """WITH ch AS (SELECT user_id,
        |    arg_max(event_type, event_id) AS ch_type,
        |    arg_max(value, event_id) AS ch_value
        |  FROM events GROUP BY user_id)
        |SELECT c_custkey,
        |  CAST(CASE WHEN ch.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS updated,
        |  CAST(coalesce(floor(ch_value * 10000), floor(c_acctbal * 10000))
        |    AS BIGINT) AS bal_c
        |FROM customer LEFT JOIN ch ON c_custkey = ch.user_id
        |WHERE ch.user_id IS NULL OR ch_type <> 'error'
        |ORDER BY c_custkey""".stripMargin,

    "ann_recall_eval" -> {
      val knn = LlmOps.oracles("vec_knn_brute")
      val ivf = Pipeline.oracles("ann_ivf_topk")
      s"""WITH t AS ($knn),
        |a AS ($ivf),
        |hits AS (SELECT t.qid, t.vec_id, t.dist_c AS td,
        |    CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM t LEFT JOIN a ON t.qid = a.qid AND t.vec_id = a.vec_id)
        |SELECT h.qid, CAST(sum(h.hit) AS BIGINT) AS n_hit,
        |  CAST(sum(h.td) AS BIGINT) AS sum_truth_c,
        |  CAST(min(s.sa) AS BIGINT) AS sum_ann_c
        |FROM hits h JOIN (SELECT qid, sum(dist_c) AS sa FROM a GROUP BY qid) s
        |  ON h.qid = s.qid
        |GROUP BY h.qid ORDER BY h.qid""".stripMargin
    }
  )
}
