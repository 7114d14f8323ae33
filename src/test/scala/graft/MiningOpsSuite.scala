package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.MiningOps
import graft.io.Tables

/** Semantic invariants for §2.21 (MiningOps) — each operator's clever
  * path (prefix filter, distinct-name dictionary, window-form skyline)
  * is re-derived by a brute-force formulation on the sf0.001 fixture and
  * compared exactly. The DuckDB oracle checks the same queries at
  * sf0.01+; these tests pin the ALGEBRAIC equivalences the fast paths
  * rely on.
  */
class MiningOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  test("dedup_containment ≡ brute-force all-pairs containment") {
    val got = MiningOps.queries("dedup_containment")(spark, d)
      .select("d1", "d2", "shared", "n1", "n2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // brute force: distinct 5-gram sets per doc, all same-lang ordered
    // pairs, exact intersection — no prefix filter, no dictionary
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).sliding(5).toSet))
    val want = (for {
      (id1, l1, g1) <- docs
      (id2, l2, g2) <- docs
      if l1 == l2 && (g1.size < g2.size || (g1.size == g2.size && id1 < id2))
      shared = (g1 & g2).size
      if 5 * shared >= 4 * g1.size
    } yield (id1, id2, shared.toLong, g1.size.toLong, g2.size.toLong)).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain at least one containment pair")
  }

  test("join_fuzzy_levenshtein: aggregate pair counts ≡ row-level brute force") {
    val got = MiningOps.queries("join_fuzzy_levenshtein")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val parts = Tables.part(spark, d)
      .select(col("p_partkey"), col("p_type"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val brute = (for {
      (k1, t1, n1) <- parts
      (k2, t2, n2) <- parts
      if k1 < k2 && t1 == t2 && math.abs(n1.length - n2.length) <= 2
      dist = lev(n1, n2) if dist <= 2
    } yield {
      val (lo, hi) = if (n1 <= n2) (n1, n2) else (n2, n1)
      ((lo, hi), dist)
    }).groupBy(_._1)
      .map { case (k, v) => (k, (v.map(_._2).min.toLong, v.size.toLong)) }
    assert(got == brute)
  }

  test("index_inverted_build: per-block postings reassemble to global df/tf") {
    val rows = MiningOps.queries("index_inverted_build")(spark, d).collect()
    // block postings must be disjoint doc ranges that sum to global df
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val df = rs.head.getLong(2)
      assert(rs.map(_.getLong(3)).sum == df)
      rs.foreach { r =>
        val blk = r.getLong(1)
        val ids = r.getString(5).split(",").map(_.toLong)
        assert(ids.sorted.sameElements(ids), "postings sorted within block")
        assert(ids.forall(id => id / 256 == blk), "postings confined to block")
        assert(ids.length == r.getLong(3).toInt)
      }
    }
    // screened: every surviving token has df >= 10
    assert(rows.forall(_.getLong(2) >= 10) && rows.nonEmpty)
  }

  test("skyline_pareto window form ≡ NOT EXISTS domination brute force") {
    val got = MiningOps.queries("skyline_pareto")(spark, d)
      .select("p_partkey").as[Long].collect().toSet
    val parts = Tables.part(spark, d)
      .select(col("p_partkey"), col("p_type"), col("p_brand"),
        col("p_size").cast("long"),
        Tables.canon(col("p_retailprice"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val want = parts.filter { case (k, t, b, sz, pr) =>
      !parts.exists { case (k2, t2, b2, sz2, pr2) =>
        k2 != k && t2 == t && b2 == b && pr2 >= pr && sz2 <= sz &&
          (pr2 > pr || sz2 < sz)
      }
    }.map(_._1).toSet
    assert(got == want && got.nonEmpty)
  }

  test("event_path_transitions: per-prev ppm sums ≈ 1e6 and counts total to n_events - n_users") {
    val rows = MiningOps.queries("event_path_transitions")(spark, d).collect()
    val ev = Tables.events(spark, d)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getLong(3)).sum
      // integer div floors each term: sum in (1e6 - |next types|, 1e6]
      assert(s <= 1000000L && s > 1000000L - rs.length)
    }
  }

  test("split_kfold: folds partition the corpus; leaked docs have a cross-fold twin") {
    val rows = MiningOps.queries("split_kfold")(spark, d).collect()
    val docs = Tables.documents(spark, d)
    assert(rows.map(_.getLong(1)).sum == docs.count())
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 5L).toSet))
    // recompute leakage directly: md5(text) appearing in >1 fold
    val withFold = docs.withColumn("fold",
        graft.api.Sampling.hashBucket(col("doc_id"), 5))
      .withColumn("fp", md5(col("text")))
    val leakyFp = withFold.groupBy("fp")
      .agg(countDistinct("fold").as("nf")).filter(col("nf") > 1)
    val wantLeak = withFold.join(leakyFp, "fp")
      .groupBy("fold").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val gotLeak = rows.map(r => (r.getLong(0), r.getLong(4))).toMap
      .filter(_._2 > 0)
    assert(gotLeak == wantLeak.filter(_._2 > 0))
  }

  test("basket_pair_support ≡ brute-force basket pair counts (top-20 order included)") {
    val got = MiningOps.queries("basket_pair_support")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = li.groupBy(_._1).map { case (_, v) => v.map(_._2).sorted }
    val supp = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        supp((parts(i), parts(j))) = supp.getOrElse((parts(i), parts(j)), 0L) + 1
    }
    val cnt = li.groupBy(_._2).map { case (p, v) => (p, v.length.toLong) }
    val no = li.map(_._1).distinct.length.toLong
    val want = supp.toSeq.sortBy { case ((p1, p2), s) => (-s, p1, p2) }.take(20)
      .map { case ((p1, p2), s) =>
        (p1, p2, s, cnt(p1), cnt(p2), s * no * 1000000L / (cnt(p1) * cnt(p2)))
      }
    assert(got.toSeq == want)
  }

  test("curation_funnel_report: gate counts are consistent and total covers the corpus") {
    val rows = MiningOps.queries("curation_funnel_report")(spark, d).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, d).count())
    rows.foreach { r =>
      val (total, lang, len, tok, all) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(all <= math.min(lang, math.min(len, tok)))
      assert(Seq(lang, len, tok, all).forall(v => v >= 0 && v <= total))
      assert(r.getLong(6) == all * 1000000L / total)
    }
  }

  test("join_asof_tolerance: match iff a prior click exists within 10 minutes") {
    val got = graft.ops.Relational.queries("join_asof_tolerance")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    val ev = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select("user_id", "event_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    ev.filter(_._4 == "purchase").foreach { case (u, id, ts, _) =>
      val prior = byUser(u).filter(e => e._4 == "click" &&
        (e._3 < ts || (e._3 == ts && e._2 < id)))
      val want = if (prior.isEmpty) None else {
        val best = prior.maxBy(e => (e._3, e._2))
        if (ts - best._3 <= 600000000L) Some((best._2, ts - best._3)) else None
      }
      assert(got(id)._1 == want.map(_._1) && got(id)._2 == want.map(_._2),
        s"purchase $id")
    }
  }

  test("retrieval_mmr: greedy objective recomputed from raw canon sims") {
    val out = graft.ops.LlmOps.queries("retrieval_mmr")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1L to 5L))
    // recompute shortlist + sims in Scala from raw embeddings
    val embs = Tables.embeddings(spark, d).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = embs.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def c(x: Double): Long = math.floor(x * 10000).toLong
    val short = embs.filter(_._1 != 0L)
      .map { case (id, e) => (id, c(cos(e, q)), e) }
      .sortBy { case (id, sc, _) => (-sc, id) }.take(20)
    var selected = Vector.empty[(Long, Array[Float])]
    val rem = scala.collection.mutable.ArrayBuffer(short: _*)
    out.foreach { case (_, vid, simq, mmr) =>
      val scored = rem.map { case (id, sc, e) =>
        val pen = if (selected.isEmpty) 0L
          else selected.map(s => c(cos(e, s._2))).max
        (id, sc, 7L * sc - 3L * pen, e)
      }
      val best = scored.minBy { case (id, _, m, _) => (-m, id) }
      assert((vid, simq, mmr) == ((best._1, best._2, best._3)), s"rank pick $vid")
      selected :+= ((best._1, best._4))
      rem --= rem.filter(_._1 == best._1)
    }
  }
}
