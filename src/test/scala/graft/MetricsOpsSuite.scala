package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MetricsOps
import graft.io.Tables

/** Semantic invariants for §2.25 (MetricsOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class MetricsOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val emb: Array[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, d).select("vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong))

  /** Quantized-integer components (floor(x·1e5)) — the kNN operators'
    * distance contract. */
  private lazy val qemb: Array[(Long, Array[Long], Long)] =
    emb.map { case (id, v, l) =>
      (id, v.map(x => math.floor(x * 100000).toLong), l) }

  test("auc_eval ≡ brute-force tie-aware pair counting") {
    val rows = MetricsOps.queries("auc_eval")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    val scored = emb.map { case (_, v, l) =>
      (math.floor(v(0) * 10000).toLong, l) }
    rows.foreach { case (label, (nPos, aucPpm)) =>
      val pos = scored.filter(_._2 == label).map(_._1)
      val neg = scored.filter(_._2 != label).map(_._1)
      assert(nPos == pos.length)
      // P(score_pos > score_neg) + 0.5 P(tie), brute force over all pairs
      var wins2 = 0L // doubled: win=2, tie=1
      for (p <- pos; n <- neg)
        wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
      val expected = wins2 * 1000000L / (2L * pos.length * neg.length)
      assert(aucPpm == expected, s"label $label")
    }
  }

  test("eval_ndcg ≡ brute-force NDCG@10 with the integer weight table") {
    val rows = MetricsOps.queries("eval_ndcg")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    val w = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    val ideal = w.sum
    val probes = qemb.filter(_._1 < 500)
    val perProbe = probes.map { case (qid, qv, ql) =>
      val nn = qemb.filter(_._1 != qid).map { case (id, v, l) =>
        var s = 0L; var i = 0
        while (i < v.length) { val dd = v(i) - qv(i); s += dd * dd; i += 1 }
        (s, id, l)
      }.sortBy(t => (t._1, t._2)).take(10)
      val dcg = nn.zipWithIndex.collect {
        case ((_, _, l), i) if l == ql => w(i) }.sum
      (ql, dcg * 1000000L / ideal)
    }
    perProbe.groupBy(_._1).foreach { case (label, g) =>
      val (n, meanPpm) = rows(label)
      assert(n == g.length)
      assert(meanPpm == g.map(_._2).sum / g.length, s"label $label")
    }
  }

  test("calibration_bins: integer-ratio calibration, bins partition docs") {
    val rows = MetricsOps.queries("calibration_bins")(spark, d).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, d).select("n_chars", "lang").collect()
      .map(r => (math.min(r.getLong(0), 599L), r.getString(1) == "en"))
    assert(rows.map(_.getLong(1)).sum == docs.length)
    rows.foreach { r =>
      val (bin, n) = (r.getLong(0), r.getLong(1))
      val g = docs.filter { case (nc, _) => nc * 10 / 600 == bin }
      assert(n == g.length)
      assert(r.getLong(2) == g.map(_._1).sum * 1000000L / (600L * n))
      assert(r.getLong(3) == g.count(_._2) * 1000000L / n)
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)))
    }
  }

  test("confusion_knn_eval: cells sum to panel, diagonal ≡ accuracy op") {
    val rows = MetricsOps.queries("confusion_knn_eval")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.nonEmpty)
    val panel = emb.count(_._1 < 1000)
    assert(rows.map(_._2._1).sum == panel)
    // row shares are floor-ppm of the row total
    rows.groupBy(_._1._1).foreach { case (_, g) =>
      val rowN = g.map(_._2._1).sum
      g.foreach { case (_, (n, ppm)) => assert(ppm == n * 1000000L / rowN) }
    }
    // diagonal counts must equal knn_classify_eval's per-label correct
    val acc = graft.ops.EvalOps.queries("knn_classify_eval")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    acc.foreach { case (label, correct) =>
      val diag = rows.toMap.get((label, label)).map(_._1).getOrElse(0L)
      assert(diag == correct, s"label $label")
    }
  }
}
