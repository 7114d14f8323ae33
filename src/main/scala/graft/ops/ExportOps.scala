package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** §2.42 producer-side export & dimension generation — the spec's
  * PRODUCER half in batch form (serialize the feed back to CloudEvents
  * JSON; reference README.md:27-76 envelope fields) and the calendar
  * dimension generator every warehouse bootstraps with.
  *
  * Scale shapes (100 TB notes):
  *  - feed_export_cloudevents: pure per-row JSON projection (codegen'd
  *    to_json over a struct — identical compact field-ordered output in
  *    any engine); bounded panel here, the full export is the same map.
  *  - dim_date_generate: one sequence explode spanning the feed's day
  *    range; the day-of-week is ARITHMETIC ((day+4) mod 7 — 1970-01-01
  *    was a Thursday) because dow numbering conventions differ across
  *    engines while epoch arithmetic cannot.
  */
object ExportOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Page manifest with content checksums for the persisted feed: 100-id
    // pages, per page the row count, id bounds, and md5 over the
    // id-ordered id list — what a producer publishes next to immutable
    // batches so consumers (and CDNs — feed_cache_replay) can verify
    // integrity. Checksum input is canonically ordered, so any engine
    // lands the identical digest.
    "feed_page_manifest" -> ((s, d) =>
      Tables.events(s, d).filter(col("event_id") < 20000)
        .groupBy(expr("event_id div 100").as("page"))
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          md5(array_join(transform(array_sort(collect_list(col("event_id"))),
            x => x.cast("string")), ",")).as("checksum"))
        .orderBy("page")),

    // CloudEvents envelope serialization for a bounded page of the feed
    // (event_id < 200): the spec's JSON fields in canonical order as ONE
    // compact JSON string per event — the batch form of the producer's
    // serializer.
    "feed_export_cloudevents" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          to_json(struct(
            lit("1.0").as("specversion"),
            col("event_id").cast("string").as("id"),
            col("event_type").as("type"),
            col("user_id").cast("string").as("subject"),
            col("ts_us").cast("string").as("time_us"))).as("envelope"))
        .orderBy("event_id")),

    // Serialization ROUND-TRIP proof: export each bounded-page event to
    // its CloudEvents JSON envelope, parse it back with from_json
    // (consumer side), and emit the parsed fields — the oracle states
    // the original projection, so export∘parse ≡ identity is the check.
    "feed_roundtrip_json" -> ((s, d) => {
      val schema = "specversion string, id string, type string, " +
        "subject string, time_us string"
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          to_json(struct(
            lit("1.0").as("specversion"),
            col("event_id").cast("string").as("id"),
            col("event_type").as("type"),
            col("user_id").cast("string").as("subject"),
            col("ts_us").cast("string").as("time_us"))).as("j"))
        .select(col("event_id"), from_json(col("j"), lit(schema)).as("p"))
        .select(col("event_id"),
          col("p.id").cast("long").as("parsed_id"),
          col("p.type").as("event_type"),
          col("p.subject").cast("long").as("user_id"),
          col("p.time_us").cast("long").as("ts_us"))
        .orderBy("event_id")
    }),

    // Cohort value (LTV) curve: per signup-week cohort, the CUMULATIVE
    // canon value through each week offset — windows over the
    // |cohorts|×|offsets| aggregate only.
    "cohort_value_curve" -> ((s, d) => {
      val weekUs = 604800000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div ${weekUs}L").as("wk"),
          floor(col("value") * 10000).cast("long").as("vc"))
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      val cell = ev.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_off"))
        .agg(sum("vc").as("v"), count(lit(1)).as("n_events"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort_wk").orderBy("wk_off")
      cell.withColumn("cum_value_c", sum("v").over(w))
        .select("cohort_wk", "wk_off", "n_events", "cum_value_c")
        .orderBy("cohort_wk", "wk_off")
    }),

    // Date-dimension generation over the feed's day span: epoch day,
    // arithmetic day-of-week (0 = Sunday), ISO-ish week index, month,
    // quarter, weekend flag — the conformed calendar every star schema
    // joins against.
    "dim_date_generate" -> ((s, d) => {
      val bounds = Tables.events(s, d)
        .agg(min(expr("ts_us div 86400000000")).as("mn"),
          max(expr("ts_us div 86400000000")).as("mx"))
      bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
        .withColumn("dow", expr("(day + 4) % 7"))
        .withColumn("week", expr("(day + 4) div 7"))
        .withColumn("month",
          expr("month(date_add(to_date('1970-01-01'), cast(day as int)))")
            .cast("long"))
        .withColumn("quarter",
          expr("quarter(date_add(to_date('1970-01-01'), cast(day as int)))")
            .cast("long"))
        .withColumn("is_weekend",
          when(col("dow") === 0 || col("dow") === 6, 1L).otherwise(0L))
        .orderBy("day")
    })
  )

  def oracles: Map[String, String] = Map(
    "feed_page_manifest" ->
      """SELECT event_id // 100 AS page, count(*) AS n,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id))
        |    AS checksum
        |FROM events WHERE event_id < 20000
        |GROUP BY 1 ORDER BY page""".stripMargin,

    "feed_export_cloudevents" ->
      """SELECT event_id, to_json(struct_pack(
        |    specversion := '1.0',
        |    id := CAST(event_id AS VARCHAR),
        |    type := event_type,
        |    subject := CAST(user_id AS VARCHAR),
        |    time_us := CAST(epoch_us(ts) AS VARCHAR))) AS envelope
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    // export∘parse ≡ identity: the oracle is the plain projection
    "feed_roundtrip_json" ->
      """SELECT event_id, event_id AS parsed_id, event_type, user_id,
        |  epoch_us(ts) AS ts_us
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "cohort_value_curve" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
        |    CAST(floor(value * 10000) AS BIGINT) AS vc FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
        |cell AS (SELECT c.cohort_wk, e.wk - c.cohort_wk AS wk_off,
        |    CAST(sum(e.vc) AS BIGINT) AS v, count(*) AS n_events
        |  FROM e JOIN c ON e.user_id = c.user_id GROUP BY 1, 2)
        |SELECT cohort_wk, wk_off, n_events,
        |  CAST(sum(v) OVER (PARTITION BY cohort_wk ORDER BY wk_off)
        |    AS BIGINT) AS cum_value_c
        |FROM cell ORDER BY cohort_wk, wk_off""".stripMargin,

    "dim_date_generate" ->
      """WITH b AS (SELECT min(epoch_us(ts) // 86400000000) AS mn,
        |    max(epoch_us(ts) // 86400000000) AS mx FROM events),
        |dd AS (SELECT CAST(u.day AS BIGINT) AS day
        |  FROM b, unnest(generate_series(b.mn, b.mx)) u(day))
        |SELECT day, (day + 4) % 7 AS dow, (day + 4) // 7 AS week,
        |  CAST(month(DATE '1970-01-01' + CAST(day AS INTEGER)) AS BIGINT)
        |    AS month,
        |  CAST(quarter(DATE '1970-01-01' + CAST(day AS INTEGER)) AS BIGINT)
        |    AS quarter,
        |  CAST(CASE WHEN (day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_weekend
        |FROM dd ORDER BY day""".stripMargin
  )
}
