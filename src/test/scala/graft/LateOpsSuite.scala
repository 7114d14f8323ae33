package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Light semantic invariants for the late round-10 operators whose main
  * check is the DuckDB oracle — one law per operator on sf0.001.
  */
class LateOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("fn_higher_order: n_pos ≤ dim; revdot symmetric under reversal") {
    val rows = q("fn_higher_order").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 64)
      assert(r.getLong(2) == 1 || r.getLong(2) == 0)
    }
  }

  test("ts_longest_streak: longest ≤ present days; streaks partition days") {
    val missing = q("ts_missing_days").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    q("ts_longest_streak").collect().foreach { r =>
      val (exp, pres) = missing(r.getString(0))
      assert(r.getLong(2) <= pres)        // longest ≤ days present
      assert(r.getLong(1) >= 1)           // at least one streak
      // n_streaks = gaps + 1 = (expected − present) partitions + 1 only
      // when every gap is a single missing day — weaker law: ≤ missing+1
      assert(r.getLong(1) <= exp - pres + 1)
    }
  }

  test("sql_text_entry ≡ the same query built via the DataFrame API") {
    val sqlRows = q("sql_text_entry").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val big = Tables.lineitem(spark, d)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice")).cast("long")).as("rev"))
      .filter(col("n_lines") >= 3)
    val dfRows = big
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum("n_lines").as("n_lines"),
        sum("rev").as("rev"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sqlRows.sameElements(dfRows))
  }

  test("feed_export_cloudevents: every envelope parses back to its event") {
    val rows = q("feed_roundtrip_json").collect()
    assert(rows.length > 0)
    rows.foreach { r => assert(r.getLong(0) == r.getLong(1)) } // id == parsed
  }

  test("dim_date_generate: contiguous days, dow cycles mod 7") {
    val rows = q("dim_date_generate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((d1, w1, _), (d2, w2, _)) =>
        assert(d2 == d1 + 1 && w2 == (w1 + 1) % 7)
      case _ => ()
    }
    rows.foreach { case (day, dow, wk) =>
      assert(dow == (day + 4) % 7)
      assert(wk == (if (dow == 0 || dow == 6) 1L else 0L))
    }
  }

  test("dq_benford_digits: shares sum to ~1e6; digits 1..9") {
    val rows = q("dq_benford_digits").collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    val s = rows.map(_.getLong(2)).sum
    assert(s > 1000000L - 9 && s <= 1000000L)
  }

  test("table_fingerprint changes when a row changes (sensitivity)") {
    val rows = q("table_fingerprint").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size == 3)
    assert(rows("lineitem")._1 == Tables.lineitem(spark, d).count())
    // checksums are non-trivial (not all rows hashed to the same value)
    rows.values.foreach { case (n, cs) => assert(cs > n) }
  }

  test("orders_value_pareto: monotone thresholds, bounded ppm") {
    val rows = q("orders_value_pareto").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(50L, 80L, 90L))
    assert(rows.map(_._2).sameElements(rows.map(_._2).sorted))
    rows.foreach { case (_, _, ppm) => assert(ppm > 0 && ppm <= 1000000L) }
    // concentration: covering 50% of revenue needs < 50% of customers
    assert(rows.head._3 < 500000L)
  }

  test("ts_sliding_median: med7 is the middle of the window (spot check)") {
    val rows = q("ts_sliding_median").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, g) =>
      val series = g.sortBy(_._2)
      series.indices.drop(6).foreach { i =>
        val win = (0 to 6).map(k => series(i - k)._3).sorted
        val got = rows.find(r => r._1 == tpe && r._2 == series(i)._2).get._3
        assert(got == win(3), s"$tpe day ${series(i)._2}")
      }
    }
  }

  test("growth_accounting_weekly: active = new + retained + resurrected") {
    val rows = q("growth_accounting_weekly").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (active, nw, ret, res) =>
      assert(active == nw + ret + res)
    }
  }

  test("abc_xyz_matrix: cells partition the parts") {
    val rows = q("abc_xyz_matrix").collect()
    val nParts = Tables.lineitem(spark, d)
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nParts)
    rows.foreach { r =>
      assert(Set("A", "B", "C")(r.getString(0)))
      assert(Set("X", "Y", "Z")(r.getString(1)))
    }
  }

  test("vec_filtered_knn: every neighbor satisfies the predicate") {
    val allowed = Tables.embeddings(spark, d)
      .filter(col("label").isin(1, 2)).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val rows = q("vec_filtered_knn").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(allowed(r.getLong(2))))
  }

  test("attribution_linear: per-purchase credits bounded by 1e6") {
    val rows = q("attribution_linear").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // total credit ≤ purchases × 1e6 (integer div loses the remainder)
    val totalCredit = rows.map(_._3).sum
    val nPurchases = Tables.events(spark, d)
      .filter(col("event_type") === "purchase").count()
    assert(totalCredit <= nPurchases * 1000000L)
    rows.foreach { case (touch, _, _) => assert(touch != "purchase") }
  }

  test("stream_fingerprint_state ≡ batch fingerprint algebra") {
    val streamed = q("stream_fingerprint_state").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val n = streamed.values.map(_._1).sum
    val bound = Tables.events(spark, d)
      .filter(col("event_id") < graft.streaming.StreamOps.ReplayBound)
      .count()
    assert(n == bound)
  }

  test("order_size_histogram: orders partitioned; shares ≈ 1e6") {
    val rows = q("order_size_histogram").collect()
    val nOrders = Tables.lineitem(spark, d)
      .select("l_orderkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    val s = rows.map(_.getLong(2)).sum
    assert(s > 1000000L - rows.length && s <= 1000000L)
  }

  test("graph_assortativity: coefficient within [-100, 100]") {
    val r = q("graph_assortativity").collect()
    assert(r.length == 1)
    val c = r.head.getLong(1)
    assert(c >= -100 && c <= 100)
  }

  test("ab_test_lift: arms partition users; control lift = 0") {
    val rows = q("ab_test_lift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    assert(rows.head._3 == 0L) // arm 0 lift vs itself
    val nUsers = Tables.events(spark, d).select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers)
  }
}
