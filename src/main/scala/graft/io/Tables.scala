package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet tables plus the determinism helpers
  * every oracle-checked query shares (SURVEY.md §2 determinism rules).
  *
  * Scale notes (100 TB design): all readers return plain parquet scans so
  * Catalyst keeps predicate pushdown / column pruning / partition pruning;
  * nothing here materializes or collects. The nanos shim is a session conf,
  * not a rewrite, so the vectorized parquet reader stays active.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** `events` is the persisted HTTP feed (FIXTURES.md mapping). Fixture
    * generations have shipped `ts` as parquet TIMESTAMP(NANOS) (which
    * Spark 4 reads as BIGINT nanos only under the legacy nanosAsLong
    * shim — runtime-settable, so we set it here; SURVEY.md §1.3) and as
    * plain TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ under
    * Spark 4's parquet NTZ inference). Branch on the decoded type so both
    * vintages work unchanged.
    *
    * Adds `ts_us` (epoch microseconds, BIGINT): integer division for the
    * nanos-as-long vintage, `unix_micros` for timestamp vintages — both
    * exact, matching DuckDB's `epoch_us(ts)` for the oracle. The NTZ cast
    * relies on the session timezone being UTC, which every entry point
    * (Bench / Verify / tests / the driver contract) pins.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = table(spark, sfDir, "events")
    val tsUs = t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampType => expr("unix_micros(ts)")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock -> instant needs the session zone; every entry
        // point pins UTC in code, but double-check rather than silently
        // producing host-offset-shifted microseconds.
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events(): session timezone must be UTC for the NTZ ts vintage")
        expr("unix_micros(cast(ts as timestamp))")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected nanos-as-long, " +
          "TIMESTAMP, or TIMESTAMP_NTZ)")
    }
    t.withColumn("ts_us", tsUs)
  }

  /** Float canonicalization (determinism rule 1): floor(x*scale) as BIGINT.
    * Identical semantics in Spark and DuckDB; `round` is banned (HALF_UP vs
    * half-even divergence).
    */
  def canon(c: Column, scale: Long = 10000L): Column =
    floor(c * lit(scale)).cast("long")

  /** Coarser canon for rounding-boundary-prone stats (stddev / cosine). */
  def canon100(c: Column): Column = canon(c, 100L)
}
