package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.QualityOps
import graft.io.Tables

/** Semantic invariants for §2.26 (QualityOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class QualityOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("table_column_stats: exact ndv/min/max for spot columns") {
    val rows = QualityOps.queries("table_column_stats")(spark, d).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows.size == 8)
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_quantity", "l_returnflag").collect()
    val keys = li.map(_.getLong(0))
    val (n, ndv, mn, mx) = rows("l_orderkey")
    assert(n == keys.length && ndv == keys.distinct.length)
    assert(mn == keys.min.toString && mx == keys.max.toString)
    val qty = li.map(_.getDouble(1))
    val (qn, qndv, qmn, qmx) = rows("l_quantity")
    assert(qn == qty.length && qndv == qty.distinct.length)
    assert(qmn == math.floor(qty.min * 10000).toLong.toString)
    assert(qmx == math.floor(qty.max * 10000).toLong.toString)
    val rf = li.map(_.getString(2))
    assert(rows("l_returnflag")._2 == rf.distinct.length)
  }

  test("dq_violation_report ≡ brute-force constraint evaluation") {
    val rows = QualityOps.queries("dq_violation_report")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.size == 6)
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_quantity", "l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val orderKeys = Tables.orders(spark, d).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val lineKeys = li.map(_._1).toSet
    assert(rows("lineitem_orphan")._1 == li.length)
    assert(rows("lineitem_orphan")._2 == li.count(r => !orderKeys(r._1)))
    assert(rows("lineitem_qty_range")._2 ==
      li.count(r => r._2 < 1 || r._2 > 50))
    assert(rows("order_no_lines")._1 == orderKeys.size)
    assert(rows("order_no_lines")._2 == orderKeys.count(k => !lineKeys(k)))
    rows.foreach { case (rule, (n, v, ppm)) =>
      assert(ppm == v * 1000000L / n, rule)
    }
  }

  test("stats_histogram_grid: cells partition lineitem, shares floor-ppm") {
    val rows = QualityOps.queries("stats_histogram_grid")(spark, d).collect()
    val total = Tables.lineitem(spark, d).count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 1000000L / total)
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10)
    }
  }

  test("layout_skew_report ≡ brute-force heaviest keys") {
    val rows = QualityOps.queries("layout_skew_report")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    val counts = Tables.lineitem(spark, d).select("l_partkey").collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(rows.map(r => (r._1, r._2)).toSeq == top)
    val total = counts.values.sum
    rows.foreach { case (_, cnt, ratio) =>
      assert(ratio == cnt * 100L * counts.size / total)
    }
  }
}
