package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlOps
import graft.io.Tables

/** Semantic invariants for §2.37 (MlOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class MlOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("linreg_normal_acc ≡ brute-force Gram accumulation; symmetric PSD-ish") {
    val rows = MlOps.queries("linreg_normal_acc")(spark, d).collect()
      .map(r => ((r.getString(2), r.getLong(0), r.getLong(1)), r.getLong(3)))
      .toMap
    val li = Tables.lineitem(spark, d)
      .select("l_discount", "l_tax", "l_extendedprice", "l_quantity")
      .collect().map { r =>
        val x = Array(1L, math.floor(r.getDouble(0) * 100).toLong,
          math.floor(r.getDouble(1) * 100).toLong,
          math.floor(r.getDouble(2)).toLong)
        (x, math.floor(r.getDouble(3)).toLong)
      }
    for (i <- 0 until 4; j <- i until 4) {
      val want = li.map { case (x, _) => x(i) * x(j) }.sum
      assert(rows(("xtx", i.toLong, j.toLong)) == want, s"xtx($i,$j)")
    }
    (0 until 4).foreach { i =>
      val want = li.map { case (x, y) => x(i) * y }.sum
      assert(rows(("xty", i.toLong, -1L)) == want, s"xty($i)")
    }
    // diagonal dominance sanity: xtx(0,0) = row count
    assert(rows(("xtx", 0L, 0L)) == li.length)
  }

  test("stump_split_gain ≡ brute-force split scan; best split minimizes") {
    val rows = MlOps.queries("stump_split_gain")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 10)
    val docs = Tables.documents(spark, d).select("n_chars", "lang")
      .collect().map(r => (r.getLong(0) / 25, r.getString(1) == "en"))
    val bands = docs.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.count(_._2).toLong))
      .toSeq.sortBy(_._1)
    val nt = bands.map(_._2._1).sum
    val post = bands.map(_._2._2).sum
    var nl = 0L; var posl = 0L
    val all = bands.flatMap { case (band, (n, pos)) =>
      nl += n; posl += pos
      if (nl < nt) {
        val nr = nt - nl; val posr = post - posl
        val negl = nl - posl; val negr = nr - posr
        val g = ((nl.toDouble - (posl * posl + negl * negl).toDouble / nl) +
          (nr.toDouble - (posr * posr + negr * negr).toDouble / nr)) /
          nt * 1000000.0
        Some((band, nl, nr, posl, posr, math.floor(g).toLong))
      } else None
    }
    val want = all.sortBy(t => (t._6, t._1)).take(10).sortBy(_._1)
    assert(rows.toSeq == want)
  }
}
