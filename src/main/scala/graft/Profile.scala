package graft

// Throwaway timing harness for individual queries (not part of the library).
import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("stream_dedup_state")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect() // warmup
    graft.streaming.StreamOps.warmup(spark)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, d).count()
      println(f"QUERY $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$c")
    }
    spark.stop()
  }
}
