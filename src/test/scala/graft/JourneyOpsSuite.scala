package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.JourneyOps
import graft.io.Tables

/** Semantic invariants for §2.40 (JourneyOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class JourneyOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("journey_second_order ≡ brute-force trigram scan") {
    val rows = JourneyOps.queries("journey_second_order")(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.length == 30)
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(3)
        .collect { case Seq(a, b, c) => (a, b, c) }.toSeq
    }
    val counts = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = tris.groupBy(t => (t._1, t._2)).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { case ((p2, p1, nxt), (c, ctxN, ppm)) =>
      assert(c == counts((p2, p1, nxt)))
      assert(ctxN == ctx((p2, p1)))
      assert(ppm == c * 1000000L / ctxN)
    }
    // top-30 by count: nothing outside beats the minimum inside
    val inSet = rows.map(_._1).toSet
    val minIn = rows.map(_._2._1).min
    counts.filterNot(kv => inSet(kv._1)).values
      .foreach(c => assert(c <= minIn))
  }

  test("repeat_purchase_rate: repeat ⊆ buyers, threshold respected") {
    val rows = JourneyOps.queries("repeat_purchase_rate")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, buyers, repeat, ppm) =>
      assert(buyers >= 5 && repeat <= buyers)
      assert(ppm == repeat * 1000000L / buyers)
    }
  }

  test("supplier_hhi ≡ brute-force share-square sum; bounds") {
    val rows = JourneyOps.queries("supplier_hhi")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val brand = Tables.part(spark, d).select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.lineitem(spark, d).select("l_partkey", "l_suppkey")
      .collect().map(r => (brand(r.getLong(0)), r.getLong(1)))
    li.groupBy(_._1).foreach { case (b, g) =>
      val bySupp = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = bySupp.values.sum
      val hhi = bySupp.values.map(c => c * c).sum * 1000000L / (total * total)
      val (n, tot, gHhi) = rows(b)
      assert(n == bySupp.size && tot == total && gHhi == hhi, b)
      // HHI ∈ (1e6/n_suppliers, 1e6]
      assert(gHhi <= 1000000L && gHhi * n >= 1000000L - n)
    }
  }
}
