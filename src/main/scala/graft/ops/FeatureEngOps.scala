package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.api.Sampling
import graft.io.Tables

/** §2.45 (cont.) feature engineering for tabular/text ML (added
  * round 6): smoothed target encoding, min-max scaling, the hashing
  * trick's collision profile, session bounce analysis, and within-doc
  * lexical richness (hapax ratio).
  *
  * Determinism: smoothing and scaling are exact integer ppm (the
  * smoothed ratio is cross-multiplied into one integer division — no
  * float prior), hash buckets derive from md5, windows are partitioned.
  *
  * Scale shapes (100 TB notes):
  *  - feature_target_encode: one (category) aggregate + a broadcast
  *    1-row global prior; the cross-multiplied ppm reaches r·N·1e6, so
  *    the products run in DECIMAL(38,0) on both engines (good to
  *    ~10^15 rows; ANSI decimal overflow fails loudly past that) and
  *    the ppm quotients come back to BIGINT via integral `div`.
  *  - feature_scale_minmax: per-key min/max aggregate broadcasts back
  *    over the data for the scaled pass — two scans, no window.
  *  - feature_hash_bucket: token instances aggregate straight to the
  *    FIXED 256-bucket relation (map-side combinable).
  *  - session_bounce_stats: the sessionize_ids gaps-and-islands windows
  *    (user-partitioned), then a |types|-sized report.
  *  - text_hapax_ratio: per-doc token counts (doc-local), one ratio per
  *    doc, a |sources|-sized report.
  */
object FeatureEngOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Smoothed target encoding of p_brand against the return flag
    // (l_returnflag = 'R'), m = 10 pseudo-observations of the global
    // rate: smoothed = (r + m·R/N) / (n + m), cross-multiplied to the
    // integer ppm ((r·N + m·R)·1e6) div ((n+m)·N) so no float prior
    // ever exists.
    "feature_target_encode" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val global = li.agg(count(lit(1)).as("gn"), sum("y").as("gr"))
      li.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("y").as("r"))
        .crossJoin(broadcast(global))
        .withColumn("raw_ppm",
          expr("(CAST(r AS DECIMAL(38,0)) * 1000000) div n"))
        .withColumn("smoothed_ppm",
          expr("((CAST(r AS DECIMAL(38,0)) * gn + 10 * gr) * 1000000)" +
            " div ((n + 10) * CAST(gn AS DECIMAL(38,0)))"))
        .select("p_brand", "n", "r", "raw_ppm", "smoothed_ppm")
        .orderBy("p_brand")
    }),

    // Min-max scaling of `value` per event type: scaled v = (v −
    // min)·1e6 div (max − min), quantized BEFORE scaling; reports each
    // type's range and the mean of the scaled values (integer div per
    // row, then one exact sum).
    "feature_scale_minmax" -> ((s, d) => {
      val v = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 10000).cast("long").as("v_c"))
      val rng = v.groupBy("event_type")
        .agg(min("v_c").as("min_c"), max("v_c").as("max_c"))
      v.join(broadcast(rng), "event_type")
        .withColumn("scaled_ppm",
          expr("((v_c - min_c) * 1000000) div greatest(max_c - min_c, 1)"))
        .groupBy("event_type")
        .agg(min("min_c").as("min_c"), max("max_c").as("max_c"),
          count(lit(1)).as("n"), sum("scaled_ppm").as("ssum"))
        .withColumn("mean_scaled_ppm", expr("ssum div n"))
        .select("event_type", "min_c", "max_c", "n", "mean_scaled_ppm")
        .orderBy("event_type")
    }),

    // Equi-frequency decile binning of order value at k$ granularity:
    // bin = floor(cum_before·10 / N) over the value histogram — the
    // 2-pass histogram discipline, so deciles are assigned without any
    // rank over data rows. Reports each decile's size and k$ range
    // (deciles are exact up to bucket granularity: a heavy bucket never
    // splits).
    "feature_bin_quantile" -> ((s, d) => {
      val hist = Tables.orders(s, d)
        .select(expr("CAST(floor(o_totalprice) AS BIGINT) div 1000").as("kv"))
        .groupBy("kv").agg(count(lit(1)).as("nb"))
      graft.api.Histograms.cumulativeFold(hist, col("kv"),
          Seq(graft.api.Histograms.CumSpec(col("nb"), "cumb", Some("n"))))
        .withColumn("bin", least(expr("(cumb * 10) div n"), lit(9L)))
        .groupBy("bin")
        .agg(sum("nb").as("n_orders"), min("kv").as("lo_k"), max("kv").as("hi_k"))
        .orderBy("bin")
    }),

    // The hashing trick's collision profile: document tokens hashed
    // into 256 md5-derived buckets; per bucket the distinct-token count
    // (collisions) and instance count — the report that sizes a hashed
    // feature space.
    "feature_hash_bucket" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tk"))
        .filter(length(col("tk")) > 0)
      tok.withColumn("bucket", Sampling.hashBucket(col("tk"), 256))
        .groupBy("bucket")
        .agg(countDistinct(col("tk")).as("n_tokens"),
          count(lit(1)).as("n_instances"))
        .orderBy("bucket")
    }),

    // Bounce analysis per session entry type: sessions (30-min gap,
    // the sessionize_ids islands), their FIRST event type, and the
    // share that never get a second event.
    "session_bounce_stats" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val sess = Tables.events(s, d)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wS = Window.partitionBy("user_id", "sid")
        .orderBy(col("ts_us"), col("event_id"))
      sess.withColumn("rk", row_number().over(wS))
        .groupBy("user_id", "sid")
        .agg(max(when(col("rk") === 1, col("event_type"))).as("entry"),
          count(lit(1)).as("n_events"))
        .groupBy("entry")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
        .withColumn("bounce_ppm", expr("(n_bounce * 1000000) div n_sessions"))
        .orderBy("entry")
    }),

    // Lexical richness: per-doc hapax ratio (share of distinct tokens
    // occurring exactly once IN that doc, ppm), aggregated per source —
    // the quick richness/templatedness signal next to
    // text_repetition_stats.
    "text_hapax_ratio" -> ((s, d) => {
      val perTok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tk"))
        .filter(length(col("tk")) > 0)
        .groupBy("doc_id", "source", "tk").agg(count(lit(1)).as("c"))
      val perDoc = perTok.groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("ratio_ppm", expr("(n_hapax * 1000000) div n_distinct"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_distinct").as("sum_distinct"), sum("n_hapax").as("sum_hapax"),
          expr("sum(ratio_ppm) div count(1)").as("mean_ratio_ppm"))
        .orderBy("source")
    })
  )

  def oracles: Map[String, String] = Map(
    "feature_target_encode" ->
      """WITH li AS (SELECT p_brand,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT count(*) AS gn, CAST(sum(y) AS BIGINT) AS gr FROM li),
        |b AS (SELECT p_brand, count(*) AS n, CAST(sum(y) AS BIGINT) AS r
        |  FROM li GROUP BY 1)
        |SELECT p_brand, n, r,
        |  CAST((CAST(r AS HUGEINT) * 1000000) // n AS BIGINT) AS raw_ppm,
        |  CAST(((CAST(r AS HUGEINT) * gn + 10 * gr) * 1000000)
        |    // ((n + 10) * CAST(gn AS HUGEINT)) AS BIGINT) AS smoothed_ppm
        |FROM b, g ORDER BY p_brand""".stripMargin,

    "feature_scale_minmax" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS v_c FROM events),
        |r AS (SELECT event_type, min(v_c) AS min_c, max(v_c) AS max_c
        |  FROM v GROUP BY 1),
        |sc AS (SELECT v.event_type,
        |    ((v.v_c - r.min_c) * 1000000) // greatest(r.max_c - r.min_c, 1)
        |      AS sp, r.min_c, r.max_c
        |  FROM v JOIN r ON v.event_type = r.event_type)
        |SELECT event_type, min(min_c) AS min_c, max(max_c) AS max_c,
        |  count(*) AS n,
        |  CAST(sum(sp) AS BIGINT) // count(*) AS mean_scaled_ppm
        |FROM sc GROUP BY 1 ORDER BY event_type""".stripMargin,

    "feature_bin_quantile" ->
      """WITH h AS (SELECT CAST(floor(o_totalprice) AS BIGINT) // 1000 AS kv,
        |    count(*) AS nb FROM orders GROUP BY 1),
        |c AS (SELECT *, CAST(coalesce(sum(nb) OVER (ORDER BY kv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cumb,
        |    CAST(sum(nb) OVER () AS BIGINT) AS n FROM h),
        |b AS (SELECT least((cumb * 10) // n, 9) AS bin, nb, kv FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(sum(nb) AS BIGINT) AS n_orders,
        |  min(kv) AS lo_k, max(kv) AS hi_k
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,

    "feature_hash_bucket" -> {
      val hv = Sampling.hexDecodeSql("md5(tk)")
      s"""WITH tok AS (SELECT unnest(str_split(text, ' ')) AS tk FROM documents),
        |t AS (SELECT tk FROM tok WHERE length(tk) > 0),
        |b AS (SELECT tk, ($hv) % 256 AS bucket FROM t)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  count(DISTINCT tk) AS n_tokens, count(*) AS n_instances
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "session_bounce_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |l AS (SELECT *, lag(us) OVER w AS prev_us FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS sid FROM f),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |    ORDER BY us, event_id) AS rk FROM s),
        |sess AS (SELECT user_id, sid,
        |    max(CASE WHEN rk = 1 THEN event_type END) AS entry,
        |    count(*) AS n_events
        |  FROM rk GROUP BY 1, 2)
        |SELECT entry, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounce,
        |  (CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // count(*) AS bounce_ppm
        |FROM sess GROUP BY 1 ORDER BY entry""".stripMargin,

    "text_hapax_ratio" ->
      """WITH tok AS (SELECT doc_id, source, unnest(str_split(text, ' ')) AS tk
        |  FROM documents),
        |t AS (SELECT doc_id, source, tk, count(*) AS c FROM tok
        |  WHERE length(tk) > 0 GROUP BY 1, 2, 3),
        |pd AS (SELECT doc_id, source, count(*) AS n_distinct,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |  FROM t GROUP BY 1, 2),
        |pr AS (SELECT *, (n_hapax * 1000000) // n_distinct AS ratio_ppm
        |  FROM pd)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_distinct) AS BIGINT) AS sum_distinct,
        |  CAST(sum(n_hapax) AS BIGINT) AS sum_hapax,
        |  CAST(sum(ratio_ppm) AS BIGINT) // count(*) AS mean_ratio_ppm
        |FROM pr GROUP BY 1 ORDER BY source""".stripMargin
  )
}
