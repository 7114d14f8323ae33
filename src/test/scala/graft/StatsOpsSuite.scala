package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.StatsOps

/** Semantic checks for the §2.13 relevance/sketch/layout operators —
  * invariants the DuckDB hash-compare can't express (sketch one-sidedness,
  * Bloom no-false-negatives, Lloyd-step descent, Z-order locality, salted
  * ≡ unsalted), recomputed independently over the sf0.001 fixtures.
  */
class StatsOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def q(name: String) = StatsOps.queries(name)(spark, d)

  private lazy val docs: Seq[(Long, String, String)] =
    graft.io.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  // ---- ranking ----------------------------------------------------------

  test("rank_tfidf: scores match an independent Scala recomputation") {
    val terms = Seq("join", "hash", "filter")
    val n = docs.size.toDouble
    val dfs = terms.map(t => docs.count(_._3.split(" ", -1).contains(t)).toDouble)
    val expected = docs.map { case (id, _, text) =>
      val toks = text.split(" ", -1)
      val score = terms.indices.map { i =>
        val tf = toks.count(_ == terms(i)).toDouble
        if (tf > 0) tf * math.log(n / dfs(i)) else 0.0
      }.sum
      id -> math.floor(score * 10000).toLong
    }.toMap
    val got = q("rank_tfidf").collect().map(r => r.getLong(0) -> r.getLong(5))
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { case (id, sc) => assert(sc === expected(id), s"doc $id") }
    // top-20 really is the global top: no excluded doc outscores the cut
    val cutoff = got.map(_._2).min
    val excluded = expected.filterNot(e => got.exists(_._1 == e._1))
    assert(excluded.values.forall(_ <= cutoff))
  }

  test("rank_bm25: higher tf with equal dl never scores lower (single-term corpus)") {
    val rows = q("rank_bm25").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(2) >= 0L, s"doc ${r.getLong(0)} negative score"))
    // the named invariant, on a controlled corpus: equal dl, varying tf
    import spark.implicits._
    val docs = Seq(
      (1L, "q x x x"), (2L, "q q x x"), (3L, "q q q x"), (4L, "x x x x")
    ).toDF("doc_id", "text")
    val scores = graft.api.Relevance
      .bm25(docs, col("doc_id"), col("text"), Seq("q"))
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) === 0.0, "tf=0 must contribute exactly 0")
    assert(scores(1L) > 0.0)
    assert(scores(2L) > scores(1L) && scores(3L) > scores(2L),
      "equal dl: score must increase with tf")
  }

  test("rank_fusion_rrf: fused ranking matches RRF over the two arms' own outputs") {
    val out = q("rank_fusion_rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.length <= 20)
    // recompute RRF from the shipped arms themselves: BM25 top-50 ranks
    // and cosine top-50 ranks (same tie rules the operator uses)
    val lex = graft.api.Relevance.bm25(graft.io.Tables.documents(spark, d),
        col("doc_id"), col("text"), Seq("join", "hash", "filter"), k1 = 1.25, b = 0.75)
      .select(col("id"), floor(col("score") * 10000).cast("long").as("sc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, sc) => (-sc, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val embs = graft.io.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qe = embs(0L)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vec = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, e) =>
        id -> math.floor(dot(e, qe) / (math.sqrt(dot(e, e)) * math.sqrt(dot(qe, qe))) * 10000).toLong }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fused = (lex.keySet ++ vec.keySet).toSeq.map { id =>
      id -> (lex.get(id).map(r => 100000000L / (60 + r)).getOrElse(0L) +
        vec.get(id).map(r => 100000000L / (60 + r)).getOrElse(0L))
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(out.toSeq == fused, "fused ranking must equal driver-side RRF")
  }

  // ---- sketches ---------------------------------------------------------

  test("heavy_hitters_cms: estimates are one-sided (est ≥ exact) and exact counts are right") {
    val exact = docs.flatMap(_._3.split(" ", -1)).groupBy(identity)
      .map { case (tk, xs) => tk -> xs.size.toLong }
    val rows = q("heavy_hitters_cms").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tk, ex, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ex === exact(tk), s"token $tk exact count")
      assert(est >= ex, s"token $tk: count-min underestimated")
      assert(r.getLong(3) === est - ex)
    }
  }

  test("join_bloom_prune: no false negatives — every true member passes the filter") {
    val rows = q("join_bloom_prune").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCust, nPass, nTrue, nFp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nPass >= nTrue, s"nation ${r.get(0)}: bloom dropped a true member")
      assert(nFp === nPass - nTrue)
      assert(nPass <= nCust)
    }
  }

  // ---- language model ---------------------------------------------------

  test("lm_score_bigram: log-probs are non-positive and mean is consistent with sum") {
    val rows = q("lm_score_bigram").collect()
    val multiTok = docs.count(_._3.split(" ", -1).length >= 2)
    assert(rows.length === multiTok, "one row per doc with ≥2 tokens")
    rows.foreach { r =>
      val (nBig, sum, mean) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nBig > 0)
      assert(sum <= 0L, s"doc ${r.getLong(0)}: positive log-prob")
      assert(mean === math.floor(sum.toDouble / nBig).toLong)
    }
  }

  // ---- k-means ----------------------------------------------------------

  test("kmeans_assign_step: partitions all vectors and the Lloyd step descends") {
    val embs = graft.io.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cents = embs.filter(_._1 < 8)
    def sqd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val assign = embs.map { case (vid, v) =>
      vid -> cents.minBy { case (cid, c) => (sqd(v, c), cid) }._1
    }
    val rows = q("kmeans_assign_step").collect()
    assert(rows.map(_.getLong(1)).sum === embs.size.toLong, "assignment partitions the set")
    rows.foreach { r =>
      val cid = r.getLong(0)
      assert(r.getLong(1) === assign.count(_._2 == cid).toLong, s"cluster $cid size")
    }
    // Lloyd descent: recomputed means reduce total within-cluster SSD
    val oldSsd = assign.map { case (vid, cid) => sqd(embs(vid), cents(cid)) }.sum
    val dim = embs.head._2.length
    val newCents = assign.groupBy(_._2).map { case (cid, m) =>
      val vs = m.keys.map(embs).toSeq
      cid -> Array.tabulate(dim)(i => vs.map(_(i)).sum / vs.size)
    }
    val newSsd = assign.map { case (vid, cid) => sqd(embs(vid), newCents(cid)) }.sum
    assert(newSsd <= oldSsd + 1e-9, "Lloyd step must not increase SSD")
  }

  // ---- layout -----------------------------------------------------------

  test("zorder_layout: chunks partition the table and cluster both key ranges") {
    val li = graft.io.Tables.lineitem(spark, d)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = q("zorder_layout").collect()
    assert(rows.map(_.getLong(1)).sum === li.length.toLong, "chunks partition the rows")
    val pkSpan = li.map(_._1).max - li.map(_._1).min
    val skSpan = li.map(_._2).max - li.map(_._2).min
    // Morton locality: a 1024-chunk cut of a 256×256 grid keeps each
    // chunk within a fraction of the global range on BOTH dimensions
    val avgPk = rows.map(r => (r.getLong(3) - r.getLong(2)).toDouble).sum / rows.length
    val avgSk = rows.map(r => (r.getLong(5) - r.getLong(4)).toDouble).sum / rows.length
    assert(avgPk < pkSpan * 0.3, s"partkey locality: avg span $avgPk of $pkSpan")
    assert(avgSk < skSpan * 0.3, s"suppkey locality: avg span $avgSk of $skSpan")
  }

  test("join_skew_salted: equals the plain unsalted join, and the salt reaches the join keys") {
    val ev = graft.io.Tables.events(spark, d)
      .select(col("user_id"), col("value"))
    val cust = graft.io.Tables.customer(spark, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(cust, "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_ev"),
        sum(floor(col("value") * lit(10000.0))).cast("long").as("rev_c"))
      .orderBy("c_mktsegment").collect().toSeq
    val salted = q("join_skew_salted").collect().toSeq
    assert(salted === plain)
    val phys = q("join_skew_salted").queryExecution.executedPlan.toString
    assert(phys.contains("_graft_salt"), "salt column must be part of the join keys")
    assert(!phys.contains("BroadcastHashJoin") || phys.contains("ShuffledHashJoin"),
      "salting must not silently degrade to a broadcast-only plan")
  }

  test("salted join API: result is identical for any salt width") {
    val ev = graft.io.Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("value")).limit(500)
    val cust = graft.io.Tables.customer(spark, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    def run(n: Int) =
      graft.api.Layout.saltedJoin(ev, cust, "user_id", col("event_id"), n)
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().toSeq
    assert(run(1) === run(8))
  }

  test("zorder_prune_gain: Morton layout prunes strictly better than natural") {
    val rows = graft.ops.StatsOps.queries("zorder_prune_gain")(
      spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (natChunks, natHit, natPpm) = rows("natural")
    val (zChunks, zHit, zPpm) = rows("zorder")
    assert(natHit <= natChunks && zHit <= zChunks)
    // insertion order spreads the key square over every chunk; Morton
    // order clusters it — the differential claim of the operator
    assert(zPpm < natPpm,
      s"zorder must scan a smaller chunk fraction ($zPpm vs $natPpm)")
    assert(zHit >= 1, "the predicate square is non-empty")
  }
}
