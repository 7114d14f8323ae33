package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` that is SQL-expressible has a DuckDB oracle in
  * `oracleSql` under the same key, with identical column names (the driver
  * sorts columns by name before hashing). Streaming/connector-only
  * operators are exercised by ScalaTest instead.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (FeedOps.queries, FeedOps.oracles),
      (Relational.queries, Relational.oracles),
      (Aggregates.queries, Aggregates.oracles),
      (Windows.queries, Windows.oracles),
      (Scalars.queries, Scalars.oracles),
      (EventTime.queries, EventTime.oracles),
      (LlmOps.queries, LlmOps.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (TrainOps.queries, TrainOps.oracles),
      (CorpusOps.queries, CorpusOps.oracles),
      (StatsOps.queries, StatsOps.oracles),
      (SampleOps.queries, SampleOps.oracles),
      (AnalyticsOps.queries, AnalyticsOps.oracles),
      (TimeOps.queries, TimeOps.oracles),
      (FeatureOps.queries, FeatureOps.oracles),
      (GraphOps.queries, GraphOps.oracles),
      (MaintOps.queries, MaintOps.oracles),
      (LoopOps.queries, LoopOps.oracles),
      (MiningOps.queries, MiningOps.oracles),
      (AuditOps.queries, AuditOps.oracles),
      (EvalOps.queries, EvalOps.oracles),
      (MetricsOps.queries, MetricsOps.oracles),
      (QualityOps.queries, QualityOps.oracles),
      (SeqOps.queries, SeqOps.oracles),
      (RobustOps.queries, RobustOps.oracles),
      (ViewOps.queries, ViewOps.oracles),
      (MonitorOps.queries, MonitorOps.oracles),
      (RetrievalOps.queries, RetrievalOps.oracles),
      (GovernOps.queries, GovernOps.oracles),
      (DriftOps.queries, DriftOps.oracles),
      (UdafOps.queries, UdafOps.oracles),
      (TravelOps.queries, TravelOps.oracles),
      (ReportOps.queries, ReportOps.oracles),
      (MlOps.queries, MlOps.oracles),
      (SegmentOps.queries, SegmentOps.oracles),
      (AgingOps.queries, AgingOps.oracles),
      (JourneyOps.queries, JourneyOps.oracles),
      (SqlOps.queries, SqlOps.oracles),
      (ExportOps.queries, ExportOps.oracles),
      (ExtOps.queries, ExtOps.oracles),
      (TpchTailOps.queries, TpchTailOps.oracles),
      (TpchFullOps.queries, TpchFullOps.oracles),
      (FlowOps.queries, FlowOps.oracles),
      (BitGraphOps.queries, BitGraphOps.oracles),
      (ApproxOps.queries, ApproxOps.oracles),
      (FeatureEngOps.queries, FeatureEngOps.oracles),
      (InterpOps.queries, InterpOps.oracles),
      (ActiveOps.queries, ActiveOps.oracles),
      (SketchOps.queries, SketchOps.oracles),
      (SpecOps.queries, SpecOps.oracles),
      (graft.streaming.StreamOps.queries, graft.streaming.StreamOps.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * `feed_read_model` — the spec's aggregate-feed purpose in one DataFrame:
    * current full state of every live subject (reference README.md:168-179).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("feed_read_model")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** Oracle-checked but excluded from the bench headline: forced-strategy
    * duplicates whose semantics another query already times (benching the
    * deliberately suboptimal plan for this corpus measures nothing new). */
  val verifyOnly: Set[String] = Set(
    "dedup_ngram_jaccard_prefix",  // forced All-Pairs prefix + PPJoin path
    "dedup_ngram_jaccard_shuffle", // forced non-broadcast (shuffled) bitset join
    "dedup_minhash_shuffle",       // forced non-broadcast (shuffled) MinHash verify
    "dedup_weighted_jaccard_shuffle", // forced non-broadcast weighted-Jaccard verify
    "dedup_cluster_cc_dist",       // forced distributed hook+compress CC
    "graph_kcore_shuffle",         // forced non-broadcast (shuffled) k-core peel
    "join_inner_merge",            // forced sort-merge twin of join_inner_hash
    "dedup_containment_prefix",    // forced inverted-index prefix containment path
    "dedup_incremental_fullscan",  // incremental admission re-derived from the full pair run
    "dedup_keep_best_dist",        // prefix-path pairs + forced distributed CC
    "graph_triangle_count_shuffle",// forced-shuffle + built-in-kernel common neighbors
    "graph_jaccard_edges_shuffle", // forced-shuffle + built-in-kernel common neighbors
    "dedup_survivorship_dist",     // prefix-path pairs + forced distributed CC (survivorship twin)
    "corpus_health_dist"           // prefix-path pairs + forced distributed CC (corpus-health twin)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
