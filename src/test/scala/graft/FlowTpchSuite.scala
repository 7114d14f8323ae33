package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Brute-force invariants for the round-6 §2.43/§2.44 batch (TpchTailOps,
  * FlowOps, BitGraphOps) on the sf0.001 fixture — driver-side
  * re-derivations; the DuckDB oracle checks the same queries at sf0.01+.
  */
class FlowTpchSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, d)
    .select($"o_orderkey", $"o_custkey", unix_micros($"o_orderdate".cast("timestamp")),
      $"o_orderpriority", floor($"o_totalprice" * 100).cast("long"))
    .as[(Long, Long, Long, String, Long)].collect()

  private lazy val lines = Tables.lineitem(spark, d)
    .select($"l_orderkey", $"l_suppkey", $"l_partkey",
      unix_micros($"l_shipdate".cast("timestamp")), $"l_quantity",
      floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100).cast("long"))
    .as[(Long, Long, Long, Long, Double, Long)].collect()

  test("q4_late_exists ≡ brute-force EXISTS over the half-year window") {
    val got = SparkEntry.queries("q4_late_exists")(spark, d)
      .as[(String, Long)].collect().toMap
    val lo = 915148800000000L  // 1999-01-01 UTC in us
    val hi = 930787200000000L  // 1999-07-01
    val lateOrders = lines.groupBy(_._1).view.mapValues(_.map(_._4)).toMap
    val want = orders.filter(o => o._3 >= lo && o._3 < hi)
      .filter(o => lateOrders.getOrElse(o._1, Array.empty[Long])
        .exists(_ >= o._3 + 30L * 86400000000L))
      .groupBy(_._4).view.mapValues(_.size.toLong).toMap
    assert(got == want && got.nonEmpty)
  }

  test("q21_waiting_suppliers: every reported supplier is the unique late one") {
    val got = SparkEntry.queries("q21_waiting_suppliers")(spark, d)
      .select("s_suppkey", "n_orders").as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    val odate = orders.map(o => o._1 -> o._3).toMap
    val perOrder = lines.groupBy(_._1).map { case (ok, ls) =>
      val bySupp = ls.groupBy(_._2).view
        .mapValues(_.exists(_._4 > odate(ok) + 60L * 86400000000L)).toMap
      (ok, bySupp)
    }
    val want = perOrder.values
      .filter(m => m.size >= 2 && m.count(_._2) == 1)
      .flatMap(_.find(_._2).map(_._1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (s, n) => assert(want.get(s).contains(n), s"supplier $s") }
    // top-20 by count: nothing outside the report beats anything inside
    val inMin = got.values.min
    want.filterNot(w => got.contains(w._1)).foreach { case (_, n) =>
      assert(n <= inMin) }
  }

  test("q8_market_share: target ≤ total, share is floor-ppm of the ratio") {
    val rows = SparkEntry.queries("q8_market_share")(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, target, ppm) =>
      assert(target <= total && target >= 0)
      assert(ppm == target * 1000000L / total)
    }
  }

  test("q6 + q19 single-row aggregates match driver recomputation") {
    val q6 = SparkEntry.queries("q6_forecast_revenue")(spark, d)
      .as[(Long, Long)].collect().head
    val li6 = Tables.lineitem(spark, d)
      .select(unix_micros($"l_shipdate".cast("timestamp")), $"l_quantity",
        floor($"l_discount" * 100).cast("long"),
        floor($"l_extendedprice" * $"l_discount" * 100).cast("long"))
      .as[(Long, Double, Long, Long)].collect()
    val lo = 915148800000000L; val hi = 946684800000000L
    val sel = li6.filter(r => r._1 >= lo && r._1 < hi &&
      r._3 >= 5 && r._3 <= 7 && r._2 < 24)
    assert(q6 == ((sel.length.toLong, sel.map(_._4).sum)))

    val q19 = SparkEntry.queries("q19_disjunctive_revenue")(spark, d)
      .as[(Long, Long)].collect().head
    val parts = Tables.part(spark, d).select("p_partkey", "p_brand", "p_size")
      .as[(Long, String, Int)].collect().map(p => p._1 -> (p._2, p._3)).toMap
    val sel19 = lines.filter { l =>
      val (b, sz) = parts(l._3); val q = l._5
      (b == "Brand#12" && sz >= 1 && sz <= 15 && q >= 1 && q <= 11) ||
      (b == "Brand#23" && sz >= 10 && sz <= 30 && q >= 10 && q <= 20) ||
      (b == "Brand#34" && sz >= 20 && sz <= 50 && q >= 20 && q <= 30)
    }
    assert(q19 == ((sel19.length.toLong, sel19.map(_._6).sum)))
  }

  test("twap_time_weighted ≡ brute-force step-interpolated average") {
    val got = SparkEntry.queries("twap_time_weighted")(spark, d)
      .select("event_type", "twap_c", "mean_c").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ev = Tables.events(spark, d)
      .select($"event_type", $"ts_us", $"event_id",
        floor($"value" * 10000).cast("long"))
      .as[(String, Long, Long, Long)].collect()
    ev.groupBy(_._1).foreach { case (t, es) =>
      val s = es.sortBy(e => (e._2, e._3))
      val iv = s.zip(s.tail).map { case (a, b) => (a._4, b._2 - a._2) }
      val (ws, span, vs) = (iv.map(x => x._1 * x._2).sum, iv.map(_._2).sum,
        iv.map(_._1).sum)
      assert(got(t) == ((Math.floorDiv(ws, span), Math.floorDiv(vs, iv.length.toLong))), s"type $t")
    }
  }

  test("win_reset_running_sum: segment boundaries at purchases, sums restart") {
    val rows = SparkEntry.queries("win_reset_running_sum")(spark, d)
      .select("user_id", "event_id", "seg", "run_c")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, d).filter($"user_id" < 200)
      .select($"user_id", $"event_id", $"ts_us", $"event_type",
        floor($"value" * 10000).cast("long"))
      .as[(Long, Long, Long, String, Long)].collect()
      .map(e => (e._1, e._2) -> e).toMap
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val ordered = rs.sortBy(r =>
        (ev((u, r._2))._3, r._2)) // user's time order
      var seg = 0L; var run = 0L
      ordered.foreach { case (_, eid, gotSeg, gotRun) =>
        val e = ev((u, eid))
        run += e._5
        assert(gotSeg == seg, s"user $u event $eid segment")
        assert(gotRun == run, s"user $u event $eid running sum")
        if (e._4 == "purchase") { seg += 1; run = 0 }
      }
    }
  }

  test("orders_backlog_daily: cumulative identity and terminal backlog") {
    val rows = SparkEntry.queries("orders_backlog_daily")(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sameElements(rows.map(_._1).sorted))
    var (co, cd) = (0L, 0L)
    rows.foreach { case (_, o, dn, b) =>
      co += o; cd += dn
      assert(b == co - cd)
    }
    assert(co == orders.length.toLong, "all orders opened")
    assert(cd == lines.map(_._1).distinct.length.toLong, "orders with lines fulfilled")
  }

  test("dq_order_reconcile: buckets partition orders-with-lines; ranges consistent") {
    val rows = SparkEntry.queries("dq_order_reconcile")(spark, d)
      .select("bucket", "n_orders", "min_diff", "max_diff")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == lines.map(_._1).distinct.length.toLong)
    rows.foreach { case (b, _, mn, mx) =>
      assert(mn <= mx)
      if (b == "0") assert(mn == 0 && mx == 0)
      else {
        assert((b.head == '+') == (mn > 0))
        val digits = b.tail.toInt
        assert(math.abs(mn).toString.length == digits ||
          math.abs(mx).toString.length == digits)
      }
    }
  }

  test("clv_simple_projection ≡ brute-force per-segment value accounting") {
    val got = SparkEntry.queries("clv_simple_projection")(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val seg = Tables.customer(spark, d).select("c_custkey", "c_mktsegment")
      .as[(Long, String)].collect().toMap
    val bysSeg = orders.groupBy(o => seg(o._2))
    got.foreach { case (s, nc, no, rev, aov, opc, clv) =>
      val os = bysSeg(s)
      assert(nc == os.map(_._2).distinct.length.toLong)
      assert(no == os.length.toLong)
      assert(rev == os.map(_._5).sum)
      assert(aov == rev / no && opc == no * 1000000L / nc && clv == rev / nc)
    }
    assert(got.map(_._3).sum == orders.length.toLong)
  }

  test("basket_rules_lift: support bounds and exact recomputation per rule") {
    val got = SparkEntry.queries("basket_rules_lift")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val baskets = lines.map(l => (l._1, l._3)).distinct
    val suppA = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = baskets.map(_._1).distinct.length.toLong
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (a, b, sab, sa, sb, conf, lift) =>
      assert(sa == suppA(a) && sb == suppA(b))
      val want = byOrder.values.count(s => s(a) && s(b)).toLong
      assert(sab == want && sab >= 5 && sab <= math.min(sa, sb))
      assert(conf == sab * 1000000L / sa && conf <= 1000000L)
      assert(lift == sab * n * 1000000L / (sa * sb))
    }
  }

  test("vec_hamming_topk: hamming distances exact; rerank picks the distance-best of the shortlist") {
    val rows = SparkEntry.queries("vec_hamming_topk")(spark, d)
      .select("qid", "rk", "vec_id", "hd", "dist")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def words(v: Array[Float]): (Long, Long) = {
      var w1 = 0L; var w2 = 0L
      for (i <- 0 until 32) if (v(i) >= 0) w1 |= 1L << i
      for (i <- 0 until 32) if (v(32 + i) >= 0) w2 |= 1L << i
      (w1, w2)
    }
    def qv(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 100000).toLong)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val (q1, q2) = words(emb(q))
      val qq = qv(emb(q))
      // brute shortlist: top-20 by (hamming, id)
      val hds = emb.toSeq.filter(_._1 != q).map { case (id, v) =>
        val (w1, w2) = words(v)
        (id, java.lang.Long.bitCount(w1 ^ q1) + java.lang.Long.bitCount(w2 ^ q2))
      }
      val short = hds.sortBy(t => (t._2, t._1)).take(20)
      rs.foreach { case (_, _, id, hd, dist) =>
        assert(short.exists(_._1 == id), s"q$q: $id not in hamming top-20")
        assert(hds.find(_._1 == id).get._2.toLong == hd)
        val xv = qv(emb(id))
        val want = xv.zip(qq).map { case (x, y) => (x - y) * (x - y) }.sum
        assert(dist == want)
      }
      // the 5 reported are the exact-distance best of the shortlist
      val best = short.map { case (id, _) =>
        (qv(emb(id)).zip(qq).map { case (x, y) => (x - y) * (x - y) }.sum, id)
      }.sorted.take(5).map(_._2)
      assert(rs.sortBy(_._2).map(_._3).toSeq == best.toSeq, s"q$q rerank")
    }
  }

  test("graph_bfs_layers ≡ brute-force BFS from each source") {
    val rows = SparkEntry.queries("graph_bfs_layers")(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val adj = lines.map(l => (l._1, l._3)).distinct.groupBy(_._1).values.toSeq
      .flatMap { items =>
        val ps = items.map(_._2).distinct.toSeq
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (src <- Seq(1L, 2L, 3L) if adj.contains(src)) {
      var visited = Set(src); var frontier = Set(src)
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- visited
        val want = next.size.toLong
        val gotRow = rows.find(r => r._1 == src && r._2 == h).map(_._3)
        if (want > 0) assert(gotRow.contains(want), s"src $src hop $h")
        else assert(gotRow.isEmpty, s"src $src hop $h should be absent")
        visited ++= next; frontier = next
      }
      assert(rows.find(r => r._1 == src && r._2 == 0).map(_._3).contains(1L))
    }
  }

  test("graph_modularity: degree sums total the edge count; contributions bounded") {
    val rows = SparkEntry.queries("graph_modularity")(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val m2 = rows.map(_._2).sum // Σ d_c = directed edge count
    assert(rows.map(_._3).sum <= m2, "internal edges cannot exceed all edges")
    rows.foreach { case (_, dc, ic, qc) =>
      assert(ic <= dc, "internal degree bounded by total degree")
      val want = math.floor((ic.toDouble / m2 -
        (dc.toDouble / m2) * (dc.toDouble / m2)) * 1000000.0).toLong
      assert(qc == want)
    }
  }
}
