package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series API over event streams: regular-grid resampling with
  * forward fill (gap filling for downstream models/dashboards) and
  * ordered funnel-stage extraction.
  *
  * Scale shapes:
  *  - resampling reduces events to one row per (key, bucket) with a
  *    map-side-combinable aggregate, explodes the per-key grid from the
  *    per-key span (grid size = span/bucket, independent of event
  *    volume), and forward-fills with a window PARTITIONED by key;
  *  - funnel stages are one key-keyed aggregate per stage joined on the
  *    key — no window over raw events, no cross join.
  */
object TimeSeries {

  /** Resample to a regular grid and forward-fill: per `key`, buckets of
    * `bucketUs` microseconds spanning the key's own [min, max] event
    * range; each bucket carries the LAST value in it (latest `(tsUs,
    * tie)` wins — `tie` must make that pair unique, e.g. an event id),
    * and empty buckets inherit the previous bucket's value. Returns
    * `(key, bucket, filled, gap)`; `filled` is never null (the first
    * bucket of a key always has an event), `gap` flags inherited rows.
    * The fill carries values verbatim (no arithmetic) — quantize before
    * or after freely. */
  def resampleFfill(df: DataFrame, key: Column, tsUs: Column, value: Column,
                    tie: Column, bucketUs: Long): DataFrame = {
    val ev = df.select(key.as("_graft_k"), tsUs.as("_graft_ts"),
      tie.as("_graft_tie"), value.as("_graft_v"))
      .withColumn("_graft_h", expr(s"_graft_ts div ${bucketUs}L"))
    val hourly = ev.groupBy("_graft_k", "_graft_h")
      .agg(max(struct(col("_graft_ts"), col("_graft_tie"), col("_graft_v")))
        .as("_graft_w"))
      .select(col("_graft_k"), col("_graft_h"),
        col("_graft_w._graft_v").as("_graft_hv"))
    val grid = hourly.groupBy("_graft_k")
      .agg(min(col("_graft_h")).as("_graft_h0"), max(col("_graft_h")).as("_graft_h1"))
      .select(col("_graft_k"),
        explode(sequence(col("_graft_h0"), col("_graft_h1"))).as("_graft_h"))
    val w = Window.partitionBy("_graft_k").orderBy("_graft_h")
    grid.join(hourly, Seq("_graft_k", "_graft_h"), "left")
      .withColumn("filled", last(col("_graft_hv"), ignoreNulls = true).over(w))
      .withColumn("gap", when(col("_graft_hv").isNull, 1L).otherwise(0L))
      .select(col("_graft_k").as("key"), col("_graft_h").as("bucket"),
        col("filled"), col("gap"))
  }

  /** Ordered funnel-stage times: per `key`, `t_0` = first event of
    * `stages(0)`, and `t_i` = first event of `stages(i)` STRICTLY AFTER
    * `t_{i-1}` (the classic ordered-funnel definition — a stage only
    * counts once the previous stage happened). Returns
    * `(key, t_0 … t_{n-1})`, nulls where the funnel broke off. One
    * key-keyed conditional aggregate per stage. */
  def funnelStages(df: DataFrame, key: Column, typ: Column, tsUs: Column,
                   stages: Seq[String]): DataFrame = {
    val ev = df.select(key.as("_graft_k"), typ.as("_graft_t"),
      tsUs.as("_graft_ts"))
    val first = ev.groupBy("_graft_k")
      .agg(min(when(col("_graft_t") === stages.head, col("_graft_ts")))
        .as("t_0"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val next = ev.join(acc.select(col("_graft_k"), col(s"t_${i - 1}")), "_graft_k")
        .groupBy("_graft_k")
        .agg(min(when(col("_graft_t") === st &&
            col("_graft_ts") > col(s"t_${i - 1}"), col("_graft_ts")))
          .as(s"t_$i"))
      acc.join(next, Seq("_graft_k"), "left")
    }.withColumnRenamed("_graft_k", "key")
  }
}
