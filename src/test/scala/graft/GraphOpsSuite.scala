package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the §2.18 graph/robust-stats/shard operators,
  * checked against independent driver-side recomputation.
  */
class GraphOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  /** Driver-side rebuild of the co-purchase edge list (directed, both
    * ways), independent of the operator's join plan. */
  private lazy val edges: Seq[(Long, Long)] = {
    val op = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toVector
    val und = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    (und ++ und.map { case (u, v) => (v, u) }).toSeq
  }

  test("graph_pagerank_step matches brute-force recomputation") {
    val out = SparkEntry.queries("graph_pagerank_step")(spark, d)
      .select("part", "n_nbr", "pr_c").as[(Long, Long, Long)].collect()
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val contrib = deg.map { case (u, dg) => u -> 1000000L / dg }
    val score = edges.groupBy(_._2).map { case (v, es) =>
      val s = es.map(e => contrib(e._1)).sum
      v -> (es.size.toLong, 150000L + s * 85L / 100L)
    }
    val expected = score.toSeq
      .map { case (v, (nn, pc)) => (v, nn, pc) }
      .sortBy { case (v, _, pc) => (-pc, v) }.take(30)
    assert(out.toSeq == expected)
  }

  /** Driver-side integer-exact PageRank, iterated from the uniform
    * start — the independent model for the fixed-count conv query. */
  private def pagerankBrute(iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var r: Map[Long, Long] = deg.map { case (u, _) => u -> 1000000L }
    for (_ <- 1 to iters) {
      val contrib = r.map { case (u, ru) => u -> ru / deg(u) }
      r = edges.groupBy(_._2).map { case (v, es) =>
        v -> (150000L + es.map(e => contrib(e._1)).sum * 85L / 100L)
      }
    }
    r
  }

  test("graph_pagerank_conv matches brute-force fixed-count iteration") {
    val out = SparkEntry.queries("graph_pagerank_conv")(spark, d)
      .select("part", "pr_c").as[(Long, Long)].collect()
    val expected = pagerankBrute(graft.ops.GraphOps.ConvIters).toSeq
      .sortBy { case (v, pc) => (-pc, v) }.take(30)
    assert(out.toSeq == expected)
  }

  test("pagerankConverged: delta-check loop terminates and agrees with the fixed unroll") {
    val es = graft.ops.GraphOps.edges(spark, d)
    // a loose tolerance must exit before maxIter on this data; tol 0
    // would run to the cap — both paths end at a fixed-unroll state
    val (r, it) = graft.ops.GraphOps.pagerankConverged(es, maxIter = 8, tolC = 50000L)
    assert(it >= 1 && it <= 8)
    val got = r.as[(Long, Long)].collect().toMap
    assert(got == pagerankBrute(it))
    // the exit condition is real: the step that ended the loop moved no
    // node by more than tol
    val prev = pagerankBrute(it - 1)
    if (it < 8) assert(got.map { case (u, v) => math.abs(v - prev(u)) }.max <= 50000L)
  }

  test("graph_degree_stats: histogram sums to node count; Σ deg·n = |directed edges|") {
    val out = SparkEntry.queries("graph_degree_stats")(spark, d)
      .select("deg", "n_nodes").as[(Long, Long)].collect()
    val nodes = edges.map(_._1).distinct.size
    assert(out.map(_._2).sum == nodes)
    assert(out.map { case (dg, n) => dg * n }.sum == edges.size)
  }

  /** Adjacency sets and the driver-side triangle enumeration (x<y<z):
    * for every id-ordered edge (u,v), the triangles it starts are the
    * common neighbors above v — independent of the operator's
    * wedge-join plan. */
  private lazy val adj: Map[Long, Set[Long]] =
    edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }

  private lazy val triBrute: Seq[(Long, Long, Long)] =
    for {
      (u, v) <- edges.filter(e => e._1 < e._2)
      w <- (adj(u) intersect adj(v)).toSeq.sorted if w > v
    } yield (u, v, w)

  test("graph_triangle_count matches driver-side triangle enumeration") {
    val out = SparkEntry.queries("graph_triangle_count")(spark, d)
      .select("part", "n_tri", "n_tri_total").as[(Long, Long, Long)].collect()
    val tot = triBrute.size.toLong
    assert(tot > 0, "fixture graph must contain triangles")
    val perNode = triBrute.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expected = perNode.toSeq.sortBy { case (p, n) => (-n, p) }.take(30)
      .map { case (p, n) => (p, n, tot) }
    assert(out.toSeq == expected)
  }

  test("graph_jaccard_edges matches driver-side common-neighbor Jaccard") {
    val out = SparkEntry.queries("graph_jaccard_edges")(spark, d)
      .select("u", "v", "cn", "deg_u", "deg_v", "jac_c")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val deg = adj.map { case (u, s) => u -> s.size.toLong }
    val cn = triBrute.flatMap(t => Seq((t._1, t._2), (t._1, t._3), (t._2, t._3)))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expected = cn.toSeq.map { case ((u, v), c) =>
      (u, v, c, deg(u), deg(v), c * 10000L / (deg(u) + deg(v) - c))
    }.sortBy { case (u, v, _, _, _, j) => (-j, u, v) }.take(30)
    assert(out.toSeq == expected)
    // cn is bounded by the smaller neighborhood
    out.foreach { case (u, v, c, du, dv, _) => assert(c <= math.min(du, dv)) }
  }

  test("anomaly_mad: outliers bounded; median/MAD match driver recomputation") {
    val out = SparkEntry.queries("anomaly_mad")(spark, d).collect()
    assert(out.nonEmpty)
    val vals = graft.io.Tables.events(spark, d)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    def q50(a: Seq[Double]): Double = {
      val h = 0.5 * (a.length - 1)
      val l = h.toInt
      if (l + 1 < a.length) a(l) + (h - l) * (a(l + 1) - a(l)) else a(l)
    }
    out.foreach { r =>
      val t = r.getString(0)
      val (n, nOut) = (r.getLong(1), r.getLong(2))
      assert(nOut <= n && n == vals(t).length)
      val med = q50(vals(t))
      val mad = q50(vals(t).map(v => math.abs(v - med)).sorted)
      // driver float recompute can differ from Spark's percentile in the
      // last ulp, which can flip the canon floor by one unit — exactness
      // vs an independent engine is the DuckDB oracle's job
      assert(math.abs(r.getLong(3) - math.floor(med * 10000).toLong) <= 1,
        s"$t median canon ${r.getLong(3)} vs recomputed $med")
      assert(math.abs(r.getLong(4) - math.floor(mad * 10000).toLong) <= 1,
        s"$t MAD canon ${r.getLong(4)} vs recomputed $mad")
      val nOutExp = vals(t).count(v => math.abs(v - med) > 3.0 * mad)
      assert(nOut == nOutExp)
    }
  }

  test("train_shard_manifest: shards partition the corpus round-robin") {
    val out = SparkEntry.queries("train_shard_manifest")(spark, d)
      .select("shard", "n_docs", "n_tokens").as[(Long, Long, Long)].collect()
    val nDocs = graft.io.Tables.documents(spark, d).count()
    assert(out.map(_._2).sum == nDocs)
    assert(out.forall(r => r._1 >= 0 && r._1 < 64))
    // round-robin balance: shard sizes differ by at most 1
    val sizes = out.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    val totTok = graft.io.Tables.documents(spark, d)
      .select(size(split($"text", " ")).cast("long")).as[Long].collect().sum
    assert(out.map(_._3).sum == totTok)
  }

  test("graph_label_prop ≡ brute-force two-round mode-label propagation") {
    val got = graft.ops.GraphOps.queries("graph_label_prop")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute force from the raw co-purchase edges
    val li = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    li.groupBy(_._1).values.foreach { o =>
      val ps = o.map(_._2).distinct
      for (a <- ps; b <- ps if a != b)
        adj(a) = adj.getOrElse(a, Set.empty) + b
    }
    var lab: Map[Long, Long] = adj.keys.map(u => u -> u).toMap
    for (_ <- 1 to 2) {
      lab = adj.map { case (u, nbrs) =>
        val cnt = nbrs.toSeq.map(lab).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        val best = cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
        u -> best
      }.toMap
    }
    val want = lab.values.groupBy(identity)
      .map { case (l, v) => (l, v.size.toLong) }.toSeq
      .sortBy { case (l, n) => (-n, l) }.take(30)
    assert(got.toSeq == want)
  }

  test("graph_kcore ≡ brute-force 4-round peel at k=100") {
    val got = graft.ops.GraphOps.queries("graph_kcore")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4)
    var alive = edges.map(_._1).toSet
    val want = (1 to 4).map { r =>
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (u, es) => u -> es.size }
      val next = deg.filter(_._2 >= 100).keySet.toSet
      val row = (r.toLong, (alive.size - next.size).toLong, next.size.toLong)
      alive = next
      row
    }
    assert(got.toSeq == want)
    // monotone: alive never grows
    assert(got.map(_._3).sameElements(got.map(_._3).sorted.reverse))
  }

  test("graph_kcore_shuffle ≡ graph_kcore, with NO broadcast on the alive joins") {
    val bc = graft.ops.GraphOps.queries("graph_kcore")(spark, d).collect()
    val sh = graft.ops.GraphOps.queries("graph_kcore_shuffle")(spark, d)
    assert(sh.collect().map(_.toSeq).toSeq == bc.map(_.toSeq).toSeq)
    // the rounds run eagerly (each alive set is localCheckpointed), so
    // assert the forced plan shape on the round join itself: shuffled
    // hash joins on both endpoints, no broadcast
    import org.apache.spark.sql.functions._
    val es = graft.ops.GraphOps.edges(spark, d)
    val alive = graft.ops.GraphOps.adjacency(spark, d).select(col("u"))
    val round = es.join(alive.hint("shuffle_hash"), "u")
      .join(alive.select(col("u").as("v")).hint("shuffle_hash"), "v")
      .groupBy("u").agg(count(lit(1)).as("deg"))
    val plan = round.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), "alive join was broadcast")
    assert(plan.contains("ShuffledHashJoin"), "expected shuffled hash joins")
  }

  test("graph_cn_recommend ≡ brute-force FoF scoring; recs never direct neighbors") {
    val got = graft.ops.GraphOps.queries("graph_cn_recommend")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val want = adj.keys.filter(_ < 100).toSeq.sorted.flatMap { src =>
      val cand = scala.collection.mutable.Map[Long, Long]()
      for (w <- adj(src); c <- adj(w) if c != src && !adj(src)(c))
        cand(c) = cand.getOrElse(c, 0L) + 1L
      cand.toSeq.sortBy { case (c, n) => (-n, c) }.take(3).zipWithIndex
        .map { case ((c, n), i) => (src, i + 1L, c, n) }
    }
    assert(got.toSeq == want)
    got.foreach { case (src, _, rec, _) => assert(!adj(src)(rec)) }
  }
}
