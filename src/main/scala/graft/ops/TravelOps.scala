package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** §2.35 event-sourcing time travel, sequence patterns & calendar audit —
  * the read-model diff between two feed offsets (the spec's `lastEventId`
  * cursor as a TIME-TRAVEL axis), MATCH_RECOGNIZE-style per-user sequence
  * patterns, and the per-type calendar completeness report.
  *
  * Scale shapes (100 TB notes):
  *  - read_model_time_travel: BOTH snapshots come from ONE pass over
  *    events (conditional arg-max aggregates per subject keyed on the
  *    cursor bound); the diff is the |subjects|-keyed aggregate itself,
  *    and the transition matrix is |types|²-bounded.
  *  - seq_pattern_match: each user's event-type string is built by ONE
  *    sorted-collect aggregate (bounded by that user's own activity);
  *    the regex evaluates per user row, map-side.
  *  - ts_missing_days: pure per-type aggregates (min/max/count of
  *    distinct days) — the gap count needs no calendar explode at all.
  */
object TravelOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Read-model time travel: the per-subject latest event type at feed
    // cursor T1 = max_id/2 vs T2 = max_id (the spec's lastEventId
    // semantics applied twice); output the transition matrix
    // (state@T1 → state@T2, 'none' = subject absent at T1) with counts —
    // "what changed between these two offsets" as one aggregate.
    "read_model_time_travel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val bounds = ev.agg(expr("max(event_id) div 2").as("t1"))
      ev.crossJoin(broadcast(bounds))
        .groupBy("user_id")
        .agg(
          max(when(col("event_id") <= col("t1"),
            struct(col("event_id"), col("event_type")))).as("s1"),
          max(struct(col("event_id"), col("event_type"))).as("s2"))
        .select(
          coalesce(col("s1.event_type"), lit("none")).as("state_t1"),
          col("s2.event_type").as("state_t2"))
        .groupBy("state_t1", "state_t2")
        .agg(count(lit(1)).as("n_subjects"))
        .orderBy("state_t1", "state_t2")
    }),

    // MATCH_RECOGNIZE-lite: per user, the time-ordered event-type
    // initial string; pattern 's.*c.*p' = signup, later a click, later a
    // purchase. Reported per user bucket: users, matches, match ppm.
    "seq_pattern_match" -> ((s, d) => {
      val ini = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ini"))
      val seqs = ini.groupBy("user_id")
        .agg(expr("concat_ws('', transform(" +
          "sort_array(collect_list(struct(ts_us, event_id, ini))), " +
          "x -> x.ini))").as("seq"))
      seqs
        .withColumn("matched",
          when(col("seq").rlike("s.*c.*p"), 1L).otherwise(0L))
        .groupBy(expr("user_id % 10").as("user_bucket"))
        .agg(count(lit(1)).as("n_users"), sum("matched").as("n_match"))
        .withColumn("match_ppm", expr("(n_match * 1000000) div n_users"))
        .orderBy("user_bucket")
    }),

    // Calendar completeness per event type: expected span (max−min+1
    // days), days present, days missing — no calendar explode, three
    // numbers per type from the daily aggregate.
    "ts_missing_days" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg((max("day") - min("day") + 1).as("n_expected"),
          count(lit(1)).as("n_present"))
        .withColumn("n_missing", col("n_expected") - col("n_present"))
        .select("event_type", "n_expected", "n_present", "n_missing")
        .orderBy("event_type"))
  )

  def oracles: Map[String, String] = Map(
    "read_model_time_travel" ->
      """WITH m AS (SELECT max(event_id) // 2 AS t1 FROM events),
        |g AS (SELECT user_id,
        |    arg_max(event_type, event_id)
        |      FILTER (WHERE event_id <= m.t1) AS s1,
        |    arg_max(event_type, event_id) AS s2
        |  FROM events, m GROUP BY user_id, m.t1),
        |tr AS (SELECT coalesce(s1, 'none') AS state_t1, s2 AS state_t2
        |  FROM g)
        |SELECT state_t1, state_t2, count(*) AS n_subjects
        |FROM tr GROUP BY 1, 2 ORDER BY state_t1, state_t2""".stripMargin,

    "seq_pattern_match" ->
      """WITH i AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    substr(event_type, 1, 1) AS ini FROM events),
        |sq AS (SELECT user_id,
        |    string_agg(ini, '' ORDER BY ts_us, event_id) AS seq
        |  FROM i GROUP BY user_id),
        |f AS (SELECT user_id,
        |    CASE WHEN regexp_matches(seq, 's.*c.*p') THEN 1 ELSE 0 END
        |      AS matched FROM sq)
        |SELECT user_id % 10 AS user_bucket, count(*) AS n_users,
        |  CAST(sum(matched) AS BIGINT) AS n_match,
        |  (CAST(sum(matched) AS BIGINT) * 1000000) // count(*) AS match_ppm
        |FROM f GROUP BY 1 ORDER BY user_bucket""".stripMargin,

    "ts_missing_days" ->
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(max(day) - min(day) + 1 AS BIGINT) AS n_expected,
        |  count(*) AS n_present,
        |  CAST(max(day) - min(day) + 1 - count(*) AS BIGINT) AS n_missing
        |FROM dly GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
