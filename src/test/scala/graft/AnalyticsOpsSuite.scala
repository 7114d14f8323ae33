package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.ops.AnalyticsOps

/** Plan-shape and semantic checks for the §2.15 composed analytics
  * queries (values are covered by the DuckDB oracle).
  */
class AnalyticsOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def plan(name: String) = {
    val e = AnalyticsOps.queries(name)(spark, d).queryExecution.executedPlan
    e match { case a: AdaptiveSparkPlanExec => a.executedPlan; case p => p }
  }

  test("q5_local_supplier: dimension joins broadcast; no cartesian") {
    val p = plan("q5_local_supplier")
    val bhj = p.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2,
      s"nation+region and supplier should broadcast, got ${bhj.size}:\n$p")
  }

  test("q3/q10: top-k plans end in TakeOrderedAndProject (no global sort)") {
    for (q <- Seq("q3_shipping_priority", "q10_returned_items")) {
      val t = plan(q).collect { case t: TakeOrderedAndProjectExec => t }
      assert(t.nonEmpty, s"$q should TakeOrderedAndProject:\n${plan(q)}")
    }
  }

  test("q18_big_orders: every returned order really tops the quantity threshold") {
    val li = graft.io.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_quantity").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100).toLong)
    val tot = li.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val rows = AnalyticsOps.queries("q18_big_orders")(spark, d).collect()
    assert(rows.nonEmpty, "threshold should catch some orders at sf0.001")
    rows.foreach { r =>
      val (ok, tq) = (r.getLong(2), r.getLong(5))
      assert(tot(ok) === tq, s"order $ok total mismatch")
      assert(tq > 30000L, s"order $ok under threshold")
    }
    // completeness: the top-50 really is the global top
    val cutoff = rows.map(_.getLong(5)).min
    val missed = tot.filter { case (k, t) =>
      t > 30000L && t > cutoff && !rows.exists(_.getLong(2) == k)
    }
    assert(missed.isEmpty, s"orders above cutoff missing: ${missed.keys.take(5)}")
  }

  test("abc_class_revenue: classes partition each brand's parts; A holds the top share") {
    val rows = AnalyticsOps.queries("abc_class_revenue")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perBrand = rows.groupBy(_._1)
    val partsPerBrand = graft.io.Tables.lineitem(spark, TestSpark.sfDir)
      .join(graft.io.Tables.part(spark, TestSpark.sfDir),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .select("p_brand", "p_partkey").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    perBrand.foreach { case (brand, cs) =>
      assert(cs.map(_._3).sum == partsPerBrand(brand).length,
        s"$brand classes partition its parts")
      assert(cs.map(_._2).distinct.length == cs.length, "one row per class")
      // A's per-part mean revenue must be >= C's (ranked classification)
      val m = cs.map(c => c._2 -> (c._4.toDouble / c._3)).toMap
      for (a <- m.get("A"); c <- m.get("C")) assert(a >= c)
    }
  }

  test("supplier_scorecard: totals and ppm re-derived from lineitem") {
    val rows = AnalyticsOps.queries("supplier_scorecard")(spark, TestSpark.sfDir)
      .collect()
    val li = graft.io.Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_suppkey", "l_returnflag", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byS = li.groupBy(_._1)
    assert(rows.map(_.getLong(2)).sum == li.length, "every lineitem counted once")
    rows.foreach { r =>
      val (k, n, nRet, nParts, ppm) = (r.getLong(0), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6))
      val mine = byS(k)
      assert(n == mine.length && nRet == mine.count(_._2 == "R"))
      assert(nParts == mine.map(_._3).distinct.length)
      assert(ppm == nRet * 1000000L / n)
    }
  }
}
