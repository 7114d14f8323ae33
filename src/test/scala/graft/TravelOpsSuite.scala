package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TravelOps
import graft.io.Tables

/** Semantic invariants for §2.35 (TravelOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class TravelOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val ev: Array[(Long, Long, String, Long)] =
    Tables.events(spark, d)
      .selectExpr("user_id", "event_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("read_model_time_travel ≡ brute-force snapshot diff") {
    val rows = TravelOps.queries("read_model_time_travel")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val t1 = ev.map(_._2).max / 2
    val want = ev.groupBy(_._1).toSeq.map { case (_, g) =>
      val s1 = g.filter(_._2 <= t1) match {
        case a if a.isEmpty => "none"
        case a => a.maxBy(_._2)._3
      }
      val s2 = g.maxBy(_._2)._3
      (s1, s2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows == want)
  }

  test("seq_pattern_match ≡ brute-force regex over ordered initials") {
    val rows = TravelOps.queries("seq_pattern_match")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val re = "s.*c.*p".r
    val byUser = ev.groupBy(_._1).map { case (u, g) =>
      val seq = g.sortBy(e => (e._4, e._2)).map(_._3.head).mkString
      (u, re.findFirstIn(seq).isDefined)
    }
    byUser.groupBy(_._1 % 10).foreach { case (bucket, g) =>
      val (n, m, ppm) = rows(bucket)
      assert(n == g.size)
      assert(m == g.count(_._2))
      assert(ppm == m * 1000000L / n)
    }
  }

  test("ts_missing_days: span algebra consistent per type") {
    val rows = TravelOps.queries("ts_missing_days")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    ev.groupBy(_._3).foreach { case (tpe, g) =>
      val days = g.map(_._4 / 86400000000L).distinct
      val (exp, pres, miss) = rows(tpe)
      assert(exp == days.max - days.min + 1)
      assert(pres == days.length)
      assert(miss == exp - pres)
      assert(miss >= 0)
    }
  }
}
