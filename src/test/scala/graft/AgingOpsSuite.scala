package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AgingOps
import graft.io.Tables

/** Semantic invariants for §2.39 (AgingOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class AgingOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("orders_aging_report ≡ brute-force bucket assignment") {
    val rows = AgingOps.queries("orders_aging_report")(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val ord = Tables.orders(spark, d)
      .selectExpr("o_orderstatus",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 as day",
        "cast(floor(o_totalprice) as long) as tp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mx = ord.map(_._2).max
    def bucket(age: Long) = if (age <= 30) "00-30" else if (age <= 60) "31-60"
      else if (age <= 90) "61-90" else "90+"
    val want = ord.groupBy(o => (o._1, bucket(mx - o._2))).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    assert(rows == want)
    assert(rows.values.map(_._1).sum == ord.length)
  }

  test("funnel_time_to_convert: p50 ≤ p90, converted counts match funnel op") {
    val rows = AgingOps.queries("funnel_time_to_convert")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (n, p50, p90) =>
      assert(n > 0 && p50 >= 0 && p50 <= p90)
    }
    // total converted must equal the funnel op's purchase column
    val funnel = graft.ops.TimeOps.queries("funnel_conversion")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap // n_purchase
    rows.foreach { case (bucket, (n, _, _)) =>
      assert(n == funnel(bucket), s"bucket $bucket")
    }
  }
}
