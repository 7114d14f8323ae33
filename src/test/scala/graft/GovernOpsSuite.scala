package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GovernOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.32 (GovernOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class GovernOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("k_anonymity_check ≡ brute-force combo counting") {
    val rows = GovernOps.queries("k_anonymity_check")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4))))
    val combos = Tables.customer(spark, d)
      .selectExpr("cast(c_nationkey as long)", "c_mktsegment",
        "cast(floor(c_acctbal) as bigint) div 1000").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val kAnon = combos.values.min
    val want = combos.filter(_._2 < 5)
      .map { case (k, n) => (k, (n, kAnon)) }
    assert(rows.toMap == want)
  }

  test("retention_sweep_plan: purge+retain = totals, cutoff = max−21") {
    val rows = GovernOps.queries("retention_sweep_plan")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "ts_us div 86400000000 as day").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cutoff = ev.map(_._2).max - 21
    ev.groupBy(_._1).foreach { case (tpe, g) =>
      val purge = g.count(_._2 < cutoff).toLong
      val retain = g.count(_._2 >= cutoff).toLong
      val (gp, gr, ppm) = rows(tpe)
      assert(gp == purge && gr == retain)
      assert(ppm == purge * 1000000L / (purge + retain))
    }
  }

  test("edit_distance_pairs ≡ brute-force blocked Levenshtein") {
    val rows = GovernOps.queries("edit_distance_pairs")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val docs = Tables.documents(spark, d)
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val blocked = docs.groupBy(t => (t._2, t._3 / 50, t._4.split(" ")(0)))
    val want = blocked.values.flatMap { g =>
      g.toSeq.flatMap { x =>
        g.toSeq.collect {
          case y if x._1 < y._1 &&
            lev(x._4.take(60), y._4.take(60)) <= 30 =>
            (x._1, y._1) -> lev(x._4.take(60), y._4.take(60)).toLong
        }
      }
    }.toMap
    assert(rows == want)
    assert(want.nonEmpty, "blocking should admit at least one pair at sf0.001")
  }

  test("source_formats_roundtrip: all three formats agree") {
    val rows = GovernOps.queries("source_formats_roundtrip")(spark, d)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3))))
    assert(rows.map(_._1).toSeq == Seq("csv", "json", "parquet"))
    assert(rows.map(_._2).distinct.length == 1,
      "CSV/JSON/parquet must land identical aggregates")
    val sample = Tables.lineitem(spark, d)
      .filter(expr("l_orderkey % 100 = 0"))
    assert(rows.head._2._1 == sample.count())
  }
}
