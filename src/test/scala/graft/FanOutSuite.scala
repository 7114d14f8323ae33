package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Tables.fanOut guard behavior: it must repartition ONLY scan-rooted
  * batch relations that are both under the session shuffle width and
  * above the bytes floor — every other input comes back untouched (the
  * same DataFrame reference, so no plan change at all). These are the
  * at-scale no-op branches: a 100 TB scan already has ≥ width splits,
  * an exchange-bearing plan fans out at its exchange, and a panel-sized
  * relation must never be exploded to cluster width. */
class FanOutSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fanOut repartitions a single-split scan-rooted relation to width") {
    // 100k longs = ~800 KB estimated, one partition, width 4
    val df = spark.range(0, 100000, 1, 1).toDF("id")
    val out = Tables.fanOut(df)
    assert(out ne df)
    assert(out.rdd.getNumPartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    assert(out.count() == 100000)
  }

  test("fanOut is a no-op when the input already has >= width partitions") {
    val df = spark.range(0, 100000, 1, 8).toDF("id") // 8 >= width 4
    assert(Tables.fanOut(df) eq df)
  }

  test("fanOut is a no-op below the bytes floor (panel-sized input)") {
    val df = spark.range(0, 10, 1, 1).toDF("id") // ~80 B estimate
    assert(Tables.fanOut(df) eq df)
  }

  test("fanOut is a no-op on exchange-bearing plans") {
    // the repartition IS an exchange: the plan already fans out there,
    // and probing .rdd under AQE would eagerly execute upstream stages
    val df = spark.range(0, 100000, 1, 1).toDF("id").repartition(2)
    assert(Tables.fanOut(df) eq df)
  }

  test("fanOut is a no-op on streaming inputs (and does not throw)") {
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    val df = ms.toDF()
    assert(Tables.fanOut(df) eq df)
  }
}
