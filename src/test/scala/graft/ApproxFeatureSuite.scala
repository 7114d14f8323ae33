package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Brute-force invariants for the round-6 §2.45 batch (ApproxOps,
  * FeatureEngOps) on the sf0.001 fixture.
  */
class ApproxFeatureSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  test("sketch_bloom_fpr: no false negatives possible, FPR near theory") {
    val Array((nm, np, nfp, ppm)) =
      SparkEntry.queries("sketch_bloom_fpr")(spark, d)
        .select("n_members", "n_probes", "n_fp", "fpr_ppm")
        .as[(Long, Long, Long, Long)].collect()
    assert(nm > 0 && np > 0)
    assert(ppm == nfp * 1000000L / np)
    // members + probes partition the part table
    val nParts = Tables.part(spark, d).count()
    assert(nm + np == nParts)
    // measured FPR within 5× of the theoretical (1 - e^{-kn/m})^k
    val theory = math.pow(1 - math.exp(-3.0 * nm / 16384.0), 3)
    assert(nfp.toDouble / np <= math.max(theory * 5, 0.01),
      s"FPR ${nfp.toDouble / np} vs theory $theory")
  }

  test("eval_pr_auc ≡ brute-force average precision at bucket granularity") {
    val got = SparkEntry.queries("eval_pr_auc")(spark, d)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val scored = Tables.embeddings(spark, d)
      .select(floor(element_at($"embedding", 1).cast("double") * 10000)
        .cast("long"), $"label".cast("long"))
      .as[(Long, Long)].collect()
    got.keys.foreach { label =>
      val byBucket = scored.groupBy(_._1).toSeq.sortBy(-_._1)
        .map { case (s, rs) => (s, rs.length.toLong,
          rs.count(_._2 == label).toLong) }
      var tp = 0L; var seen = 0L; var apNum = 0L
      byBucket.foreach { case (_, nb, np) =>
        tp += np; seen += nb
        apNum += np * (tp * 1000000L / seen)
      }
      val p = byBucket.map(_._3).sum
      assert(got(label) == ((p, apNum / p)), s"label $label")
    }
  }

  test("eval_mrr: reciprocal ranks bounded and consistent with ndcg panel") {
    val rows = SparkEntry.queries("eval_mrr")(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == Tables.embeddings(spark, d)
      .filter($"vec_id" < 500).count())
    rows.foreach { case (_, _, mrr) => assert(mrr >= 0 && mrr <= 1000000L) }
  }

  test("ts_crosscorr_types: symmetric in sign at lag 0 vs brute-force") {
    val rows = SparkEntry.queries("ts_crosscorr_types")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy($"event_type", expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    rows.foreach { case ((ta, tb, lag), (n, rc)) =>
      val a = daily(ta); val b = daily(tb)
      val pairs = a.toSeq.flatMap { case (day, xa) =>
        b.get(day + lag).map(xb => (xa, xb)) }
      assert(n == pairs.length.toLong, s"($ta,$tb,$lag)")
      if (rc.isDefined) {
        val nn = pairs.length.toLong
        val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
        val saa = pairs.map(p => p._1 * p._1).sum
        val sbb = pairs.map(p => p._2 * p._2).sum
        val sab = pairs.map(p => p._1 * p._2).sum
        val want = math.floor((nn * sab - sa * sb).toDouble /
          (math.sqrt((nn * saa - sa * sa).toDouble) *
            math.sqrt((nn * sbb - sb * sb).toDouble)) * 100).toLong
        assert(rc.contains(want), s"($ta,$tb,$lag)")
      }
    }
  }

  test("ts_burstiness_fano ≡ brute-force variance-over-mean") {
    val rows = SparkEntry.queries("ts_burstiness_fano")(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy($"event_type", expr("ts_us div 86400000000"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    rows.foreach { case (t, nd, meanC, fanoC) =>
      val xs = daily(t).map(_._3)
      val n = xs.length.toLong; val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      assert(nd == n)
      assert(meanC == sx * 100 / n)
      assert(fanoC == Math.floorDiv((n * sxx - sx * sx) * 100, n * sx))
    }
  }

  test("feature_target_encode: smoothing pulls small cells toward the prior") {
    val rows = SparkEntry.queries("feature_target_encode")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val gn = rows.map(_._2).sum; val gr = rows.map(_._3).sum
    val priorPpm = gr * 1000000L / gn
    rows.foreach { case (b, n, r, raw, sm) =>
      assert(raw == r * 1000000L / n)
      assert(sm == (r * gn + 10L * gr) * 1000000L / ((n + 10L) * gn), s"brand $b")
      // smoothed lies between raw and the prior (integer-div tolerance 1)
      assert(sm >= math.min(raw, priorPpm) - 1 && sm <= math.max(raw, priorPpm) + 1)
    }
  }

  test("feature_scale_minmax: scaled means inside [0, 1e6]; ranges exact") {
    val rows = SparkEntry.queries("feature_scale_minmax")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val v = Tables.events(spark, d)
      .select($"event_type", floor($"value" * 10000).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (t, mn, mx, n, mean) =>
      val xs = v(t).map(_._2)
      assert(mn == xs.min && mx == xs.max && n == xs.length.toLong)
      assert(mean >= 0 && mean <= 1000000L)
      val want = xs.map(x => (x - mn) * 1000000L / math.max(mx - mn, 1L)).sum / n
      assert(mean == want)
    }
  }

  test("feature_hash_bucket: instances total the token count; buckets in range") {
    val rows = SparkEntry.queries("feature_hash_bucket")(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, nt, ni) =>
      assert(b >= 0 && b < 256); assert(nt <= ni) }
    val total = Tables.documents(spark, d)
      .select(explode(split($"text", " ")).as("tk"))
      .filter(length($"tk") > 0).count()
    assert(rows.map(_._3).sum == total)
  }

  test("session_bounce_stats: sessions total sessionize_ids; bounces are 1-event") {
    val rows = SparkEntry.queries("session_bounce_stats")(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val sess = SparkEntry.queries("sessionize_ids")(spark, d)
      .select("n_events").as[Long].collect()
    assert(rows.map(_._2).sum == sess.length.toLong)
    assert(rows.map(_._3).sum == sess.count(_ == 1L).toLong)
    rows.foreach { case (_, n, b, ppm) =>
      assert(b <= n && ppm == b * 1000000L / n) }
  }

  test("text_hapax_ratio ≡ brute-force within-doc hapax counting") {
    val rows = SparkEntry.queries("text_hapax_ratio")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, d).select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val perDoc = docs.map { case (_, src, text) =>
      val counts = text.split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length)
      val nd = counts.size.toLong
      val h = counts.count(_._2 == 1).toLong
      (src, nd, h, h * 1000000L / nd)
    }
    rows.foreach { case (src, nDocs, sumD, sumH, meanPpm) =>
      val g = perDoc.filter(_._1 == src)
      assert(nDocs == g.length.toLong)
      assert(sumD == g.map(_._2).sum && sumH == g.map(_._3).sum)
      assert(meanPpm == g.map(_._4).sum / g.length)
    }
  }
}
