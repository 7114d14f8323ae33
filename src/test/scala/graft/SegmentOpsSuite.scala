package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SegmentOps
import graft.io.Tables

/** Semantic invariants for §2.38 (SegmentOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class SegmentOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("rfm_segments ≡ brute-force fixed-band scoring") {
    val rows = SegmentOps.queries("rfm_segments")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "ts_us div 86400000000 as day",
        "cast(floor(value * 10000) as long) as vc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxDay = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, g) =>
      val rec = maxDay - g.map(_._2).max
      val freq = g.length.toLong
      val mon = g.map(_._3).sum
      val r = if (rec <= 1) 5L else if (rec <= 3) 4L else if (rec <= 7) 3L
        else if (rec <= 14) 2L else 1L
      val f = if (freq >= 200) 5L else if (freq >= 100) 4L
        else if (freq >= 50) 3L else if (freq >= 20) 2L else 1L
      val m = if (mon >= 5000000L) 5L else if (mon >= 2000000L) 4L
        else if (mon >= 1000000L) 3L else if (mon >= 500000L) 2L else 1L
      ((r, f, m), mon)
    }
    val want = perUser.groupBy(_._1).map { case (k, g) =>
      k -> ((g.size.toLong, g.map(_._2).sum / g.size)) }
    assert(rows == want)
    assert(rows.values.map(_._1).sum == ev.map(_._1).distinct.length)
  }

  test("ship_latency_quantiles ≡ brute-force sorted percentiles") {
    val rows = SegmentOps.queries("ship_latency_quantiles")(spark, d)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val lat = Tables.lineitem(spark, d)
      .selectExpr("l_orderkey",
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000 as sd")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ords = Tables.orders(spark, d)
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 as od")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    val byPri = lat.flatMap { case (ok, sd) =>
      ords.get(ok).map { case (pri, od) => (pri, sd - od) } }
      .groupBy(_._1)
    byPri.foreach { case (pri, g) =>
      val sorted = g.map(_._2).sorted
      def q(p: Int): Long = {
        val n = sorted.length.toLong
        sorted.zipWithIndex.collectFirst {
          case (v, i) if (i + 1) * 100L >= n * p => v }.get
      }
      val (p50, p90) = rows(pri)
      assert(p50 == q(50), s"$pri p50")
      assert(p90 == q(90), s"$pri p90")
      assert(p50 <= p90)
    }
  }

  test("score_percentile_norm: rank law and bounds") {
    val rows = SegmentOps.queries("score_percentile_norm")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val scores = rows.map(_._2)
    rows.foreach { case (_, score, pctl) =>
      val cumLt = scores.count(_ < score).toLong
      assert(pctl == cumLt * 1000000L / (n - 1))
      assert(pctl >= 0 && pctl <= 1000000L)
    }
  }
}
