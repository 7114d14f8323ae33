package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ViewOps
import graft.io.Tables

/** Semantic invariants for §2.29 (ViewOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class ViewOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("ivm_agg_merge ≡ full recompute (the IVM differential claim)") {
    val rows = ViewOps.queries("ivm_agg_merge")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ord = Tables.orders(spark, d)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1)).toLong))
    val want = ord.groupBy(_._1).map { case (k, g) =>
      k -> (g.length.toLong, g.map(_._2).sum) }
    assert(rows == want)
  }

  test("join_null_safe_eq: null bucket joins; counts = |C_k|·|S_k|") {
    val rows = ViewOps.queries("join_null_safe_eq")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def keyOf(k: Long): Long = if (k == 13L) -1L else k
    val cust = Tables.customer(spark, d)
      .selectExpr("cast(c_nationkey as long)").collect()
      .map(r => keyOf(r.getLong(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val supp = Tables.supplier(spark, d)
      .selectExpr("cast(s_nationkey as long)").collect()
      .map(r => keyOf(r.getLong(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = cust.keySet.intersect(supp.keySet)
      .map(k => k -> cust(k) * supp(k)).toMap
    assert(rows == want)
    assert(rows.contains(-1L), "null bucket must join under <=>")
  }

  test("fn_generators_outer: no rows dropped; buckets partition embeddings") {
    val rows = ViewOps.queries("fn_generators_outer")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ids = Tables.embeddings(spark, d).select("vec_id").collect()
      .map(_.getLong(0))
    val byMod = ids.groupBy(_ % 4).view.mapValues(_.length.toLong).toMap
    // v = -1 bucket: one row per mod-0 vec (outer keeps them)
    assert(rows(-1L)._1 == byMod.getOrElse(0L, 0L))
    assert(rows(-1L)._2 == -byMod.getOrElse(0L, 0L)) // pos -1 each
    // v = k bucket: every vec with mod >= k contributes one row at pos k-1
    (1L to 3L).foreach { k =>
      val n = (k to 3L).map(m => byMod.getOrElse(m, 0L)).sum
      assert(rows(k)._1 == n)
      assert(rows(k)._2 == n * (k - 1))
    }
  }

  test("olap_parent_share: shares sum to ≤1e6 per region, ranks total") {
    val rows = ViewOps.queries("olap_parent_share")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val regionRev = g.map(_._3).sum
      g.foreach { case (_, _, rev, ppm, _) =>
        assert(ppm == rev * 1000000L / regionRev)
      }
      // floor shares: sum within (1e6 - |nations|, 1e6]
      assert(g.map(_._4).sum <= 1000000L)
      assert(g.map(_._4).sum > 1000000L - g.length)
      assert(g.map(_._5).sorted.toSeq == (1L to g.length).toSeq)
    }
  }
}
