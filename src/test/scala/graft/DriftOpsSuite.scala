package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DriftOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.33 (DriftOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class DriftOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("drift_l1_buckets ≡ brute-force vintage shares") {
    val rows = DriftOps.queries("drift_l1_buckets")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
    val docs = Tables.documents(spark, d).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n0 = docs.count(_._1 % 2 == 0).toLong
    val n1 = docs.count(_._1 % 2 == 1).toLong
    var l1 = 0L
    val byBand = docs.groupBy(_._2 / 50)
    byBand.foreach { case (band, g) =>
      val c0 = g.count(_._1 % 2 == 0).toLong
      val c1 = g.count(_._1 % 2 == 1).toLong
      val p0 = c0 * 1000000L / n0
      val p1 = c1 * 1000000L / n1
      l1 += math.abs(p1 - p0)
      val got = rows.toMap.apply(band)
      assert((got._1, got._2, got._3, got._4, got._5) ==
        ((c0, c1, p0, p1, math.abs(p1 - p0))), s"band $band")
    }
    rows.foreach { case (_, (_, _, _, _, _, tot)) => assert(tot == l1) }
  }

  test("rec_coverage_metrics consistent with the rec table") {
    val row = DriftOps.queries("rec_coverage_metrics")(spark, d).collect()
    assert(row.length == 1)
    val r = row.head
    val recs2 = graft.ops.GraphOps.queries("graph_cn_recommend")(spark, d)
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    val nSources = recs2.map(_._1).distinct.length.toLong
    assert(r.getLong(0) == nSources)
    assert(r.getLong(1) == recs2.length)
    val perItem = recs2.map(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(r.getLong(2) == perItem.size)
    val shared = perItem.values.map(k => k * (k - 1) / 2).sum
    val possible = nSources * (nSources - 1) / 2 * 3
    assert(r.getLong(4) == shared * 1000000L / possible)
  }

  test("price_index_period: positive ppm index over shared parts") {
    val row = DriftOps.queries("price_index_period")(spark, d).collect()
    assert(row.length == 1)
    val (nParts, ppm) = (row.head.getLong(0), row.head.getLong(1))
    assert(nParts > 0)
    // prices are era-independent in the synthetic fixture, so the index
    // must land near parity (but exactly deterministic)
    assert(ppm > 500000L && ppm < 2000000L)
  }

  test("emb_centroid_shift ≡ brute-force quantized centroid algebra") {
    val rows = DriftOps.queries("emb_centroid_shift")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 10000).toLong).toArray,
        r.getInt(2).toLong))
    emb.groupBy(_._3).foreach { case (label, g) =>
      val even = g.filter(_._1 % 2 == 0)
      val odd = g.filter(_._1 % 2 == 1)
      val dim = g.head._2.length
      var shift = 0L
      (0 until dim).foreach { p =>
        val me = math.floor(
          even.map(_._2(p)).sum.toDouble * 10000.0 / even.length).toLong
        val mo = math.floor(
          odd.map(_._2(p)).sum.toDouble * 10000.0 / odd.length).toLong
        shift += (me - mo) * (me - mo)
      }
      val (ne, no, gotShift) = rows(label)
      assert(ne == even.length && no == odd.length)
      assert(gotShift == shift, s"label $label")
    }
  }

  test("vocab_growth_heaps: monotone, final decile = full corpus") {
    val rows = DriftOps.queries("vocab_growth_heaps")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 10)
    assert(rows.map(_._3).sameElements(rows.map(_._3).sorted))  // docs mono
    assert(rows.map(_._4).sameElements(rows.map(_._4).sorted))  // tokens mono
    assert(rows.map(_._5).sameElements(rows.map(_._5).sorted))  // vocab mono
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val last = rows.last
    assert(last._3 == docs.length)
    assert(last._4 == docs.map(_._2.length.toLong).sum)
    assert(last._5 == docs.flatMap(_._2).distinct.length)
  }
}
