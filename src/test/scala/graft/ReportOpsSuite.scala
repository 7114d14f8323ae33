package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ReportOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.36 (ReportOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class ReportOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("q7_nation_volume: both directions present, volumes positive") {
    val rows = ReportOps.queries("q7_nation_volume")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r => assert(r._1 != r._2) }
    rows.foreach { r => assert(r._4 > 0 && r._5 > 0) }
  }

  test("q14_promo_share ≡ brute-force monthly conditional sums") {
    val rows = ReportOps.queries("q14_promo_share")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val types = Tables.part(spark, d).select("p_partkey", "p_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.lineitem(spark, d)
      .selectExpr("l_partkey",
        "cast(year(cast(l_shipdate as timestamp)) * 100 + " +
          "month(cast(l_shipdate as timestamp)) as long) as ym",
        "cast(floor(l_extendedprice * (1.0 - l_discount)) as long) as rev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    li.groupBy(_._2).foreach { case (ym, g) =>
      val promo = g.filter(t => types(t._1) == "PROMO").map(_._3).sum
      val total = g.map(_._3).sum
      val (gp, gt, ppm) = rows(ym)
      assert(gp == promo && gt == total)
      assert(ppm == promo * 1000000L / total)
    }
  }

  test("q16_brand_suppliers ≡ brute-force distinct pair counts") {
    val rows = ReportOps.queries("q16_brand_suppliers")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val brand = Tables.part(spark, d).select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.lineitem(spark, d).select("l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(t => brand(t._1)).foreach { case (b, g) =>
      val (ns, np, nl) = rows(b)
      assert(ns == g.map(_._2).distinct.length)
      assert(np == g.map(_._1).distinct.length)
      assert(nl == g.length)
    }
  }

  test("win_first_last ≡ brute-force per-(user, day) scan") {
    val rows = ReportOps.queries("win_first_last")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3),
        r.getString(4), Option(r.getString(5)))))
      .toMap
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "ts_us div 86400000000 as day", "ts_us",
        "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    ev.groupBy(t => (t._1, t._2)).foreach { case (key, g) =>
      val sorted = g.sortBy(t => (t._3, t._4))
      val (n, f, l, sec) = rows(key)
      assert(n == g.length)
      assert(f == sorted.head._5 && l == sorted.last._5)
      assert(sec == sorted.lift(1).map(_._5))
    }
  }

  test("fn_regex_extract: vowel counts and flags exact") {
    val rows = ReportOps.queries("fn_regex_extract")(spark, d).collect()
    assert(rows.nonEmpty)
    val names = Tables.part(spark, d).filter(col("p_partkey") < 300)
      .select("p_partkey", "p_name", "p_brand").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    rows.foreach { r =>
      val (name, brandRaw) = names(r.getLong(0))
      assert(r.getString(1) == name.takeWhile(c => c.isLetterOrDigit || c == '_'))
      assert(r.getLong(2) == name.count("aeiou".contains(_)))
      assert(r.getLong(3) == (if (name.exists(_.isDigit)) 1L else 0L))
      assert(r.getString(4) == brandRaw.replace('#', '-'))
    }
  }
}
