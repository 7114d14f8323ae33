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

  /** Inferred parquet schema per (session, path): schema inference reads
    * and decodes file footers on the DRIVER on every `spark.read.parquet`
    * call, and a sequential multi-query run re-infers the same static
    * input tables hundreds of times (a catalog-backed deployment pays
    * this once at table registration). Caching the STRUCTTYPE only —
    * never rows, plans, or results — and passing it back through
    * `.schema(...)` skips the re-inference; the scan itself is untouched
    * (same splits, pushdown, pruning). Keyed by session because inference
    * is conf-dependent (e.g. the nanosAsLong shim in [[events]]). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((spark, path),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

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

  /** Relations estimated below this are left alone: repartitioning a
    * panel-sized input to a large cluster's shuffle width produces
    * width-many near-empty tasks whose dispatch costs more than the
    * serial kernel (measured in round 16: every panel-bounded call site
    * lost). Small enough that the corpus fixtures the fan-out was
    * measured winning on (≥ ~0.5 MB at the bench SF) stay above it. */
  private val MinFanOutBytes = 64L * 1024

  /** Scale-adaptive fan-out before a CPU-heavy per-row kernel (shingling,
    * tokenize+explode, bitset/minhash encode, vector-distance pair
    * generation): when the input plan has FEWER partitions than the
    * session's shuffle width, round-robin repartition it to that width.
    *
    * Why: a small parquet file is one row group = ONE scan task no matter
    * how many cores exist, so everything fused into the scan stage —
    * including a pair join whose probe side is that scan — runs serially
    * while the rest of the box idles (the guide's "input skew" case:
    * repartition right after the read). The trigger is the MEASURED
    * partition count, not a constant: at 100 TB the same scan already has
    * ≥ width splits and this is a no-op — the big side is never shuffled.
    * The rows moved when it does fire are at most (width − 1) partitions'
    * worth of a relation that was about to be rescanned by a kernel doing
    * orders of magnitude more work per row than one shuffle write+read.
    * Results are partitioning-independent by the repo's determinism
    * discipline (merge-order-independent aggregates, total output
    * orders), so this changes WHERE rows are computed, never what. */
  def fanOut(df: DataFrame): DataFrame = {
    if (sys.env.getOrElse("SPARK_GRAFT_FANOUT", "1") == "0") return df
    // Guards for arbitrary caller inputs (the public Vectors/Curation
    // APIs accept any DataFrame, not just the scan-rooted ones internal
    // call sites pass):
    //  - streaming plans have no .rdd at build time;
    //  - a plan already carrying an exchange fans out AT that exchange,
    //    and under AQE materializing .rdd on it eagerly executes the
    //    upstream stages (which the repartitioned copy would then
    //    re-execute — no cross-query stage reuse). Scan-rooted batch
    //    plans are the only inputs where probing .rdd is free: it plans
    //    the file splits but runs no job.
    // NOTE: the width read assumes the single-threaded fixture drivers —
    // a batch query built concurrently with a streaming fixture would see
    // runToMemory's temporary width-1 pin and fan out to nothing.
    if (df.isStreaming) return df
    val qe = df.queryExecution
    if (qe.sparkPlan.find(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
      .isDefined) return df
    if (qe.optimizedPlan.stats.sizeInBytes < MinFanOutBytes) return df
    val width = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val parts = df.rdd.getNumPartitions
    // dev-only evidence print: the post-localCheckpoint plans some call
    // sites dump can't show whether/where the fan-out fired
    if (sys.env.get("SPARK_GRAFT_FANOUT_DEBUG").contains("1"))
      println(s"FANOUT parts=$parts width=$width " +
        (if (parts < width) "-> repartition" else "-> noop"))
    if (parts < width) df.repartition(width) else df
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
