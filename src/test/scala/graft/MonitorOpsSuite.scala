package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MonitorOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.30 (MonitorOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class MonitorOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val daily: Map[(String, Long), Long] =
    Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap

  test("feed_consumer_lag ≡ brute-force offset counting") {
    val rows = MonitorOps.queries("feed_consumer_lag")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.size == 4)
    val ids = Tables.events(spark, d).select("event_id").collect()
      .map(_.getLong(0))
    val mx = ids.max
    (0 to 3).foreach { i =>
      val committed = mx * i / 4
      val lag = ids.count(_ > committed).toLong
      val (gotC, gotL, gotPpm) = rows(s"consumer_$i")
      assert(gotC == committed && gotL == lag)
      assert(gotPpm == lag * 1000000L / ids.length)
    }
  }

  test("ts_calendar_residual: residuals consistent with the grid algebra") {
    val rows = MonitorOps.queries("ts_calendar_residual")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 20)
    val grid = Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"),
        expr("(ts_us div 3600000000) % 24").as("hour"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val byType = grid.groupBy(_._1._1)
    rows.foreach { case (tpe, day, hour, x, expected, resid) =>
      val g = byType(tpe)
      assert(x == grid((tpe, day, hour)))
      val td = g.filter(_._1._2 == day).values.sum
      val sh = g.filter(_._1._3 == hour).values.sum
      val tot = g.values.sum
      assert(expected == td * sh / tot)
      assert(resid == math.abs(x - expected))
    }
    // top-20 is the global maximum residual set
    val allResid = grid.map { case ((tpe, day, hour), x) =>
      val g = byType(tpe)
      val e = g.filter(_._1._2 == day).values.sum *
        g.filter(_._1._3 == hour).values.sum / g.values.sum
      math.abs(x - e)
    }.toSeq.sorted.reverse
    assert(rows.map(_._6).min >= allResid.drop(20).headOption.getOrElse(0L))
  }

  test("ts_forecast_eval_naive ≡ brute-force lag-7 MAE") {
    val rows = MonitorOps.queries("ts_forecast_eval_naive")(spark, d)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    daily.keys.map(_._1).toSeq.distinct.foreach { tpe =>
      val series = daily.filter(_._1._1 == tpe).toSeq
        .map { case ((_, day), x) => (day, x) }.sortBy(_._1)
      val idx = series.toMap
      val pairs = series.collect {
        case (day, x) if idx.contains(day - 7) => math.abs(x - idx(day - 7))
      }
      val (n, mae) = rows(tpe)
      assert(n == pairs.length)
      assert(mae == pairs.sum * 100L / pairs.length, tpe)
    }
  }

  test("events_burst_detect: scores ≡ brute-force windows, rank total") {
    val rows = MonitorOps.queries("events_burst_detect")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq)
      val series = daily.filter(_._1._1 == tpe).toSeq
        .map { case ((_, day), x) => (day, x) }.sortBy(_._1)
      g.foreach { case (_, _, day, x, score) =>
        val i = series.indexWhere(_._1 == day)
        assert(series(i)._2 == x)
        val win3 = series.slice(math.max(0, i - 1), i + 2).map(_._2).sum
        val trail = series.slice(i - 14, i).map(_._2)
        assert(trail.length == 14)
        assert(score == win3 * 14L * 100L / (3L * trail.sum))
      }
    }
  }
}
