package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** End-to-end data-layout checks for graft.api.Layout: writing a corpus
  * partitioned by Z-order chunk and reading it back with a key filter
  * must PRUNE partitions at the scan (the mechanism that turns a 100 TB
  * scan into a few files), and the Z-value itself must be a bijection of
  * the two coordinates.
  */
class LayoutSuite extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("zValue: bijective on the 8-bit grid and locality-preserving") {
    import spark.implicits._
    val grid = spark.range(0, 256 * 4).toDF("i")
      .select((col("i") % 256).as("x"), (col("i") / 256).cast("long").as("y"))
    val zs = grid.select(col("x"), col("y"),
        graft.api.Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(zs.map(_._2).distinct.length === zs.length, "zValue must be injective")
    // interleave identity on a known point: x=3 (bits 11), y=1 (bit 1)
    // → z = y0 + 2·x0 + 4·y1 + 8·x1 = 1 + 2 + 0 + 8 = 11
    val m = zs.toMap
    assert(m((3L, 1L)) === 11L)
    assert(m((0L, 0L)) === 0L)
    assert(m((255L, 3L)) === (0 until 8).map { i =>
      (((255 >> i) & 1) << (2 * i + 1)) + (((3 >> i) & 1) << (2 * i))
    }.sum.toLong)
  }

  test("writing by z-chunk partitions prunes reads on either key range") {
    val d = TestSpark.sfDir
    val dir = java.nio.file.Files.createTempDirectory("graft_zwrite").toString
    try {
      val li = graft.io.Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val mx = li.agg(max("l_partkey").as("mp"), max("l_suppkey").as("ms"))
      val z = li.crossJoin(broadcast(mx))
        .withColumn("x", floor(col("l_partkey") * lit(16.0) / (col("mp") + 1)).cast("long"))
        .withColumn("y", floor(col("l_suppkey") * lit(16.0) / (col("ms") + 1)).cast("long"))
        .withColumn("zchunk", graft.api.Layout.zValue(col("x"), col("y"), bits = 4))
        .drop("x", "y")
      z.write.mode("overwrite").partitionBy("zchunk").parquet(dir)

      val back = spark.read.parquet(dir)
      val nAll = back.rdd.getNumPartitions // force file index; row check below
      val filtered = back.filter(col("zchunk") === 0)
      val exec = filtered.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = exec.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty,
        s"zchunk filter must become a partition filter:\n$exec")
      val prunedFiles = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters).map(_.files.length).sum
      val allFiles = scan.relation.location.listFiles(Nil, Nil).map(_.files.length).sum
      assert(prunedFiles < allFiles,
        s"pruned scan should read fewer files ($prunedFiles of $allFiles)")
      // and the pruned read returns exactly the chunk's rows
      val expected = z.filter(col("zchunk") === 0).count()
      assert(filtered.count() === expected)
      assert(nAll >= 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
