package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RetrievalOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.31 (RetrievalOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class RetrievalOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val emb: Array[(Long, Array[Long])] =
    Tables.embeddings(spark, d).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 10000).toLong).toArray))

  test("vec_maxsim_topk ≡ brute-force sub-vector late interaction") {
    val rows = RetrievalOps.queries("vec_maxsim_topk")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def maxsim(q: Array[Long], dd: Array[Long]): Long =
      (0 until 8).map { i =>
        (0 until 8).map { j =>
          (0 until 8).map(k => q(i * 8 + k) * dd(j * 8 + k)).sum
        }.max
      }.sum
    val queries = emb.filter(_._1 < 5)
    val want = queries.sortBy(_._1).flatMap { case (qid, qv) =>
      emb.filter(_._1 != qid)
        .map { case (id, dv) => (id, maxsim(qv, dv)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1L, id, s) }
    }
    assert(rows.toSeq == want.toSeq)
  }

  test("ts_downsample_lttb: one point per interior bucket, max area") {
    val rows = RetrievalOps.queries("ts_downsample_lttb")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, g) =>
      val series = g.sortBy(_._2).map(t => (t._2, t._3))
      val buckets = series.zipWithIndex
        .groupBy { case (_, i) => i / 5 }.view
        .mapValues(_.map(_._1)).toMap
      val interior = buckets.keys.filter(b =>
        buckets.contains(b - 1) && buckets.contains(b + 1)).toSeq.sorted
      val got = rows.filter(_._1 == tpe)
      assert(got.map(_._2).toSeq == interior.map(_.toLong))
      got.foreach { case (_, b, day, x, area2) =>
        val (na, sda, sxa) = {
          val a = buckets(b.toInt - 1)
          (a.length.toLong, a.map(_._1).sum, a.map(_._2).sum)
        }
        val (nc, sdc, sxc) = {
          val c = buckets(b.toInt + 1)
          (c.length.toLong, c.map(_._1).sum, c.map(_._2).sum)
        }
        def area(dy: Long, xx: Long): Long = math.abs(
          (sda - dy * na) * (sxc - xx * nc) - (sdc - dy * nc) * (sxa - xx * na))
        val best = buckets(b.toInt)
          .map { case (dy, xx) => (area(dy, xx), dy, xx) }
          .maxBy { case (a2, dy, _) => (a2, -dy) }
        assert((day, x, area2) == ((best._2, best._3, best._1)), s"$tpe b$b")
      }
    }
  }

  test("text_overlap_stitch ≡ brute-force boundary products") {
    val rows = RetrievalOps.queries("text_overlap_stitch")(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val toks = Tables.documents(spark, d).select("text").collect()
      .map(_.getString(0).split(" ")).filter(_.length >= 3)
    val firsts = toks.map(_.take(3).mkString(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val lasts = toks.map(_.takeRight(3).mkString(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val selfs = toks.filter(t =>
        t.take(3).mkString(" ") == t.takeRight(3).mkString(" "))
      .map(_.take(3).mkString(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = lasts.keySet.intersect(firsts.keySet).flatMap { b =>
      val pairs = lasts(b) * firsts(b) - selfs.getOrElse(b, 0L)
      if (pairs > 0) Some(b -> ((lasts(b), firsts(b), pairs))) else None
    }.toMap
    assert(rows == want)
  }

  test("sample_bernoulli_hash: rate ≈ 1/8, ≡ hashBucket predicate") {
    val got = RetrievalOps.queries("sample_bernoulli_hash")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val all = Tables.documents(spark, d).select("doc_id").collect()
      .map(_.getLong(0))
    val wantIds = Tables.documents(spark, d)
      .filter(graft.api.Sampling.hashBucket(col("doc_id"), 8) === 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == wantIds)
    // 3-sigma binomial band around 1/8
    val p = got.size.toDouble / all.length
    assert(p > 0.125 - 3 * math.sqrt(0.125 * 0.875 / all.length))
    assert(p < 0.125 + 3 * math.sqrt(0.125 * 0.875 / all.length))
  }
}
