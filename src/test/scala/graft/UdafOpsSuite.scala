package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.UdafOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.34 (UdafOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class UdafOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("udaf_minhash_group ≡ brute-force per-seed minima") {
    val rows = UdafOps.queries("udaf_minhash_group")(spark, d).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val docs = Tables.documents(spark, d).select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    docs.groupBy(_._1).foreach { case (src, g) =>
      (0 to 3).foreach { seed =>
        val want = g.map(t => UdafOps.seedHash24(seed.toLong, t._2)).min
        assert(rows((src, seed.toLong)) == want, s"$src seed $seed")
      }
    }
  }

  test("udaf_bitmask_or ≡ brute-force OR; popcount consistent") {
    val rows = UdafOps.queries("udaf_bitmask_or")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val bit = Map("click" -> 1L, "error" -> 2L, "purchase" -> 4L,
      "signup" -> 8L, "view" -> 16L)
    val ev = Tables.events(spark, d).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0) % 100, r.getString(1)))
    ev.groupBy(_._1).foreach { case (bucket, g) =>
      val mask = g.map(t => bit.getOrElse(t._2, 32L)).reduce(_ | _)
      val (gotMask, nTypes) = rows(bucket)
      assert(gotMask == mask, s"bucket $bucket")
      assert(nTypes == java.lang.Long.bitCount(mask).toLong)
    }
  }

  test("udaf_topk_group ≡ rank-window top-3 (the window-free claim)") {
    val rows = UdafOps.queries("udaf_topk_group")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, d)
      .select(col("event_type"), floor(col("value") * 10000).cast("long"),
        col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (tpe, g) =>
      g.sortBy { case (_, v, id) => (-v, id) }.take(3).zipWithIndex
        .map { case ((_, v, id), i) => (tpe, i + 1L, v, id) }
    }
    assert(rows.toSeq == want)
  }
}
