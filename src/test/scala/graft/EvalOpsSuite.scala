package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.EvalOps
import graft.io.Tables

/** Semantic invariants for §2.24 (EvalOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class EvalOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def docsTokens: Array[(Long, Array[String])] =
    Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))

  test("bpe_merge_step ≡ brute-force greedy left-to-right merge count") {
    val rows = EvalOps.queries("bpe_merge_step")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getLong(3))))
    assert(rows.nonEmpty)
    // brute force: top adjacent pair by (count desc, w1, w2)
    val docs = docsTokens
    val allPairs = docs.flatMap { case (_, t) => t.sliding(2).collect {
      case Array(a, b) => (a, b) } }
    val top = allPairs.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.head._1
    // greedy scan per doc
    val brute = docs.map { case (id, t) =>
      var i = 0; var n = 0L
      while (i < t.length - 1) {
        if ((t(i), t(i + 1)) == top) { n += 1; i += 2 } else i += 1
      }
      (id, n)
    }.filter(_._2 > 0).toMap
    assert(rows.map { case (id, (_, _, n)) => (id, n) }.toMap == brute)
    rows.foreach { case (_, (w1, w2, _)) => assert((w1, w2) == top) }
  }

  test("emb_dim_stats: one row per dimension, exact min/max/mean") {
    val rows = EvalOps.queries("emb_dim_stats")(spark, d).collect()
    val vecs = Tables.embeddings(spark, d).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = vecs.head.length
    assert(rows.length == dim)
    rows.foreach { r =>
      val pos = r.getLong(0).toInt
      val col = vecs.map(_(pos))
      assert(r.getLong(1) == vecs.length)                      // n
      assert(r.getLong(2) == math.floor(col.sum / col.length * 10000).toLong)
      assert(r.getLong(4) == math.floor(col.min * 10000).toLong)
      assert(r.getLong(5) == math.floor(col.max * 10000).toLong)
    }
  }

  test("unpivot_measures: 4 rows per lineitem, values preserved") {
    val n = Tables.lineitem(spark, d).count()
    val out = EvalOps.queries("unpivot_measures")(spark, d)
    assert(out.count() == 4 * n)
    // spot-check round trip for one order line
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_linenumber", "l_quantity").limit(1).collect().head
    val got = out.filter(col("l_orderkey") === li.getLong(0) &&
        col("l_linenumber") === li.getInt(1).toLong &&
        col("measure") === "quantity")
      .select("val_c").collect().head.getLong(0)
    assert(got == math.floor(li.getDouble(2) * 10000).toLong)
  }

  test("ts_autocorr ≡ brute-force Pearson over the lagged daily series") {
    val rows = EvalOps.queries("ts_autocorr")(spark, d).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((t, xs) <- daily; k <- 1 to 3) {
      val pairs = xs.drop(k).zip(xs.dropRight(k)) // (x_t, x_{t-k}) row-lag
      val (exp: Option[Long], np) = if (pairs.isEmpty) (None, 0L) else {
        val n = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val da = n * sxx - sx * sx; val db = n * syy - sy * sy
        if (da > 0 && db > 0)
          (Some(math.floor((n * sxy - sx * sy).toDouble /
            (math.sqrt(da.toDouble) * math.sqrt(db.toDouble)) * 100).toLong), n)
        else (None, n)
      }
      if (np > 0) {
        val (gotN, gotR) = rows((t, k.toLong))
        assert(gotN == np, s"type=$t k=$k")
        assert(gotR == exp, s"type=$t k=$k")
      } else assert(!rows.contains((t, k.toLong)))
    }
  }

  test("knn_classify_eval ≡ brute-force LOO-5NN majority vote") {
    val rows = EvalOps.queries("knn_classify_eval")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100000).toLong)
          .toArray,
        r.getInt(2).toLong))
    // exact leave-one-out 5-NN majority vote (ties: lowest label) over
    // the bounded probe panel (vec_id < 1000 — the operator's contract),
    // with the operator's quantized-integer distance (floor(x·1e5))
    val probes = emb.filter(_._1 < 1000)
    val preds = probes.map { case (qid, qv, _) =>
      val nn = emb.filter(_._1 != qid)
        .map { case (id, v, l) =>
          var s = 0L; var i = 0
          while (i < v.length) { val t = v(i) - qv(i); s += t * t; i += 1 }
          (s, id, l)
        }.sortBy(t => (t._1, t._2)).take(5)
      val vote = nn.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      (qid, vote)
    }.toMap
    val brute = probes.groupBy(_._3).map { case (l, vs) =>
      val n = vs.length.toLong
      val correct = vs.count(v => preds(v._1) == l).toLong
      l -> ((n, correct, correct * 1000000 / n))
    }
    assert(rows == brute)
  }

  test("chisq_independence: expected counts sum to N per row/col margin") {
    val rows = EvalOps.queries("chisq_independence")(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(rows.nonEmpty)
    val n = rows.map(_._2._1).sum
    // Σ expected ≡ N (up to the floor canonicalization: each cell loses
    // < 0.01, so the canon sum is within |cells| of 100·N)
    val eSum = rows.map(_._2._2).sum
    assert(math.abs(eSum - 100L * n) <= rows.length)
    // brute-force one cell's expected count + contribution
    val byStatus = rows.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum)
    val byPrio = rows.groupBy(_._1._2).view.mapValues(_.map(_._2._1).sum)
    rows.foreach { case ((st, pr), (obs, eC, contribC)) =>
      val e = byStatus(st).toDouble * byPrio(pr).toDouble / n.toDouble
      assert(eC == math.floor(e * 100).toLong)
      assert(contribC == math.floor((obs - e) * (obs - e) / e * 100).toLong)
    }
  }

  test("corr_measures ≡ brute-force Pearson on quantized measures") {
    val rows = EvalOps.queries("corr_measures")(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows.size == 6)
    val li = Tables.lineitem(spark, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect().map(r => Map(
        "quantity" -> math.floor(r.getDouble(0)).toLong,
        "extendedprice" -> math.floor(r.getDouble(1)).toLong,
        "discount" -> math.floor(r.getDouble(2) * 100).toLong,
        "tax" -> math.floor(r.getDouble(3) * 100).toLong))
    def pearson(m1: String, m2: String): Option[Long] = {
      val n = li.length.toDouble
      val xs = li.map(_(m1)); val ys = li.map(_(m2))
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val syy = ys.map(y => y * y).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
      val da = n * sxx - sx * sx; val db = n * syy - sy * sy
      if (da > 0 && db > 0)
        Some(math.floor((n * sxy - sx * sy) /
          (math.sqrt(da) * math.sqrt(db)) * 100).toLong)
      else None
    }
    for (((m1, m2), got) <- rows) assert(got == pearson(m1, m2), s"$m1/$m2")
  }

  test("sketch_kmv_intersect: estimates bracket the exact overlaps") {
    val rows = EvalOps.queries("sketch_kmv_intersect")(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.nonEmpty)
    val users = Tables.events(spark, d).select("event_type", "user_id")
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case ((ta, tb), (estA, estB, estU, estI)) =>
      // inclusion-exclusion identity holds on the canon values up to
      // the two floor() drops
      assert(math.abs(estI - (estA + estB - estU)) <= 2 || estI == 0)
      // union estimate at least as large as each side's (union sketch
      // k-th minimum ≤ each side's k-th minimum)
      assert(estU >= math.max(estA, estB) - 1)
      // sketch error sanity: within 60% of the exact overlap magnitude
      val exact = (users(ta) & users(tb)).size * 100L
      val exactU = (users(ta) | users(tb)).size * 100L
      assert(math.abs(estU - exactU) <= exactU * 6 / 10,
        s"$ta/$tb union est $estU vs exact $exactU")
    }
  }

  test("sample_weighted_merge ≡ direct sample_weighted top-100") {
    val merged = EvalOps.queries("sample_weighted_merge")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = graft.api.Sampling.sampleWeighted(
        Tables.documents(spark, d).select(col("doc_id"), col("n_chars")),
        col("doc_id"), col("n_chars"), k = 100)
      .select(col("doc_id"), col("n_chars"),
        floor(col("priority") * lit(100000000.0)).cast("long").as("pri_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == direct)
  }
}
