package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TimeOps

/** Semantic checks for the §2.16 temporal-analytics operators —
  * invariants the DuckDB hash-compare can't express (grid completeness,
  * fill semantics vs an independent recomputation, funnel monotonicity),
  * over the sf0.001 fixtures.
  */
class TimeOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def q(name: String) = TimeOps.queries(name)(spark, d)

  test("ts_resample_ffill: complete per-user grids, exact forward fill, no null values") {
    val ev = graft.io.Tables.events(spark, d).filter(col("user_id") < 10)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        floor(col("value") * 10000).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val rows = q("ts_resample_ffill").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gotByUser = rows.groupBy(_._1)
    assert(gotByUser.keySet === byUser.keySet)
    byUser.foreach { case (u, evs) =>
      val hours = evs.map(_._2 / 3600000000L)
      val (h0, h1) = (hours.min, hours.max)
      val got = gotByUser(u).sortBy(_._2)
      assert(got.map(_._2).toSeq === (h0 to h1).toSeq, s"user $u grid incomplete")
      // independent fill: last value (by ts, event_id) at or before each hour
      val lastPerHour = evs.groupBy(_._2 / 3600000000L).map { case (h, es) =>
        h -> es.maxBy(e => (e._2, e._3))._4
      }
      var carry = Option.empty[Long]
      (h0 to h1).zip(got).foreach { case (h, (_, gh, filled, gap)) =>
        assert(gh === h)
        lastPerHour.get(h) match {
          case Some(v) => assert(gap === 0L && filled === v, s"user $u hour $h")
          case None =>
            assert(gap === 1L, s"user $u hour $h should be a gap")
            assert(carry.contains(filled), s"user $u hour $h fill carry")
        }
        carry = Some(filled)
      }
    }
  }

  test("funnel_conversion: stage counts are monotone and bounded by users") {
    val rows = q("funnel_conversion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, nU, nS, nC, nP) =>
      assert(nS <= nU, s"bucket $b signup > users")
      assert(nC <= nS, s"bucket $b click > signup (funnel must be ordered)")
      assert(nP <= nC, s"bucket $b purchase > click")
    }
    val nUsers = graft.io.Tables.events(spark, d)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === nUsers, "buckets partition the users")
  }

  test("funnelStages API: a stage only counts strictly after the previous stage") {
    import spark.implicits._
    val ev = Seq(
      (1L, "signup", 100L), (1L, "click", 50L), (1L, "click", 200L),
      (2L, "click", 10L), (2L, "signup", 20L), // click only BEFORE signup
      (3L, "signup", 5L)
    ).toDF("u", "t", "ts")
    val got = graft.api.TimeSeries
      .funnelStages(ev, col("u"), col("t"), col("ts"), Seq("signup", "click"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(got(1L) === ((Some(100L), Some(200L))), "pre-signup click must not count")
    assert(got(2L) === ((Some(20L), None)), "click before signup is not a conversion")
    assert(got(3L) === ((Some(5L), None)))
  }

  test("ts_interarrival_stats: deltas are non-negative and counts are consistent") {
    val rows = q("ts_interarrival_stats").collect()
    assert(rows.length === 5, "one row per event type")
    val evCount = graft.io.Tables.events(spark, d)
      .groupBy("event_type", "user_id").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val expectedDeltas = evCount.groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(x => math.max(0L, x._2 - 1)).sum }
    rows.foreach { r =>
      val (t, n, minUs, maxUs) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === expectedDeltas(t), s"type $t delta count")
      assert(minUs >= 0L && maxUs >= minUs, s"type $t bounds")
    }
  }

  test("ts_changepoint_cusum matches driver-side per-series recomputation") {
    val out = q("ts_changepoint_cusum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length === 5, "one row per event type")
    val ev = graft.io.Tables.events(spark, d)
      .select(col("event_type"), col("user_id"), col("event_id"),
        col("ts_us"), floor(col("value") * 100).cast("long").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val bySeries = rows.groupBy(_._2).map { case (u, es) =>
        val s = es.sortBy(e => (e._4, e._3))
        val yb = s.map(_._5).sum / s.length // values >= 0, so / == floor-div
        var acc = 0L
        val peaks = s.map { e => acc += e._5 - yb; (math.abs(acc), e._3, e._4) }
        val (mac, eid, ts) = peaks.maxBy(p => (p._1, -p._2))
        (u, s.length.toLong, mac, eid, ts)
      }
      val best = bySeries.maxBy(x => (x._3, -x._1))
      (t, best._1, best._2, best._3, best._4, best._5)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected)
  }

  test("attribution_touch matches driver-side last-touch replay") {
    val out = q("attribution_touch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.io.Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), floor(col("value") * 10000).cast("long").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val credit = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var touch: String = null
      es.sortBy(e => (e._3, e._2)).flatMap { e =>
        val r = if (e._4 == "purchase")
          Some((if (touch == null) "none" else touch, e._5)) else None
        if (e._4 == "click" || e._4 == "view") touch = e._4
        r
      }
    }
    val expected = credit.groupBy(_._1)
      .map { case (t, xs) => t -> (xs.size.toLong, xs.map(_._2).sum) }
    assert(out.keySet == expected.keySet)
    expected.foreach { case (t, (n, sv)) => assert(out(t) == ((n, sv)), s"channel $t") }
    // every purchase credited exactly once
    assert(out.values.map(_._1).sum == ev.count(_._4 == "purchase"))
  }

  test("ts_period_over_period: deltas and ppm reproduce from the emitted sums") {
    val out = q("ts_period_over_period").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, prev, delta, ppm) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(prev > 0 && delta == v - prev)
      val expect = math.signum(v - prev) * (math.abs(v - prev) * 1000000L / prev)
      assert(ppm == expect)
    }
    // each type's weeks strictly increase (lag ran over a total order)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val weeks = rows.map(_.getLong(1))
      assert(weeks.sorted.sameElements(weeks) && weeks.distinct.length == weeks.length)
    }
  }

  test("agg_mode_exact: the mode really is the max count, ties break lexicographically") {
    val out = SparkEntry.queries("agg_mode_exact")(spark, d).collect()
    assert(out.nonEmpty)
    val counts = graft.io.Tables.orders(spark, d)
      .join(graft.io.Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    out.foreach { r =>
      val (seg, p, n) = (r.getString(0), r.getString(1), r.getLong(2))
      val segCounts = counts.filter(_._1 == seg)
      assert(n == segCounts.map(_._3).max, s"$seg mode count")
      val best = segCounts.filter(_._3 == n).map(_._2).min
      assert(p == best, s"$seg tie must break to the smallest priority")
    }
  }

  test("sessionize_ids: intra-session gaps <= 30min, inter-session gaps > 30min") {
    val sess = SparkEntry.queries("sessionize_ids")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val events = graft.io.Tables.events(spark, d)
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, ts) => (u, ts.map(_._2).sorted) }
    val gap = 1800000000L
    sess.groupBy(_._1).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._3).sum == events(u).length, s"user $u events partitioned")
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, end1), (_, _, _, start2, _)) =>
          assert(start2 - end1 > gap, "sessions separated by > 30min")
        case _ => ()
      }
      sorted.foreach { case (_, _, n, st, en) =>
        val inSess = events(u).filter(t => t >= st && t <= en)
        assert(inSess.length == n.toInt, "session span contains exactly its events")
        inSess.sliding(2).foreach {
          case Array(a, b) => assert(b - a <= gap, "no intra-session silence > 30min")
          case _ => ()
        }
      }
    }
  }
}
