package graft

import org.apache.spark.sql.SparkSession

/** Developer harness (not part of the library surface): time individual
  * queries or dump their physical plans outside the full Bench run.
  *
  *   sbt "runMain graft.Profile q1 q2"            # per-query wall time
  *   sbt "runMain graft.Profile --explain q1 q2"  # physical plans
  *
  * Data dir via SPARK_GRAFT_SF_DIR (defaults to sf0.1 for timing; use
  * sf0.01 for plan dumps to match docs/PLANS.md).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.headOption.contains("--explain") ||
      args.headOption.contains("--explainf")
    // --explainf: FormattedMode (the `.explain("formatted")` shape the
    // optimization-round plan dumps under plans/ use); --explain stays
    // SimpleMode to match docs/PLANS.md.
    val formatted = args.headOption.contains("--explainf")
    val names = (if (explain) args.drop(1) else args).toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts correctness (Tables.events)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel(if (explain) "ERROR" else "WARN")
    if (!explain) {
      spark.range(100000).selectExpr("sum(id)").collect() // warmup
      graft.streaming.StreamOps.warmup(spark)
    }
    names.foreach { n =>
      if (explain) {
        val df = SparkEntry.queries(n)(spark, d)
        println(s"===== $n =====")
        println(df.queryExecution.explainString(
          if (formatted) org.apache.spark.sql.execution.FormattedMode
          else org.apache.spark.sql.execution.SimpleMode))
      } else {
        // time construction + count: streaming fixtures (and adaptive
        // plan probes) do real work eagerly while the query is BUILT —
        // timing only the terminal action would hide it (Bench times
        // both the same way)
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, d).count()
        println(f"QUERY $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$c")
      }
    }
    spark.stop()
  }
}
