package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RobustOps
import graft.io.Tables

/** Semantic invariants for §2.28 (RobustOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class RobustOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val li: Array[(String, Long, Long)] =
    Tables.lineitem(spark, d)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1)).toLong,
        math.floor(r.getDouble(2)).toLong))

  test("agg_weighted_median ≡ brute-force weighted median") {
    val rows = RobustOps.queries("agg_weighted_median")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    li.groupBy(_._1).foreach { case (flag, g) =>
      val (totalW, wm) = rows(flag)
      val tw = g.map(_._3).sum
      assert(totalW == tw)
      val sorted = g.map(t => (t._2, t._3)).sortBy(_._1)
      var cum = 0L
      val expected = sorted.find { case (_, w) =>
        cum += w; cum * 2 >= tw }.get._1
      assert(wm == expected, flag)
    }
  }

  test("agg_trimmed_mean ≡ brute-force sorted trim") {
    val rows = RobustOps.queries("agg_trimmed_mean")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    li.groupBy(_._1).foreach { case (flag, g) =>
      val ps = g.map(_._2).sorted
      val n = ps.length.toLong
      val (lo, hi) = (n / 10, n - n / 10)
      val kept = ps.slice(lo.toInt, hi.toInt)
      val (nKept, tmc) = rows(flag)
      assert(nKept == kept.length)
      assert(tmc == kept.sum * 100L / kept.length, flag)
    }
  }

  test("agg_gini_index ≡ brute-force midrank Gini; in [0, 1e6)") {
    val rows = RobustOps.queries("agg_gini_index")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val ord = Tables.orders(spark, d)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1)).toLong))
    ord.groupBy(_._1).foreach { case (pri, g) =>
      val vs = g.map(_._2)
      val n = vs.length.toLong
      val sv = vs.sum
      // doubled midranks via bucket counts
      val byV = vs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      var cumLt = 0L
      var num = 0L
      byV.foreach { case (v, c) =>
        val r2 = 2 * cumLt + c + 1
        num += c * (r2 - n - 1) * v
        cumLt += c
      }
      val (gotN, gini) = rows(pri)
      assert(gotN == n)
      assert(gini == num * 1000000L / (n * sv), pri)
      assert(gini >= 0 && gini < 1000000L)
    }
  }

  test("vec_power_iteration ≡ brute-force integer AᵀA·1") {
    val rows = RobustOps.queries("vec_power_iteration")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val vecs = Tables.embeddings(spark, d).select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * 10000).toLong).toArray)
    val dim = vecs.head.length
    assert(rows.size == dim)
    val qs = vecs.map(_.sum)
    (0 until dim).foreach { j =>
      val sj = vecs.zip(qs).map { case (v, q) => v(j) * q }.sum
      assert(rows(j.toLong) == sj, s"dim $j")
    }
  }
}
