package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force / property checks for the round-8 operators: the Merkle
  * manifest recomputed digest-by-digest in plain Scala, the Poisson
  * bootstrap ladder against direct pmf expectations, and the JL random
  * projection against an exact Scala re-projection plus the norm
  * concentration the lemma promises.
  */
class SpecOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("feed_manifest_merkle: every digest and the root recompute exactly in plain Scala") {
    val ids = graft.io.Tables.events(spark, d)
      .filter(col("event_id") < 20000).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.nonEmpty)
    val pageDigest = ids.groupBy(_ / 100).view.mapValues(v =>
      md5hex(v.sorted.mkString(","))).toMap
    val l1 = pageDigest.groupBy(_._1 / 16).view.mapValues { pages =>
      (pages.size.toLong, md5hex(pages.toSeq.sortBy(_._1).map(_._2).mkString(",")))
    }.toMap
    val root = md5hex(l1.toSeq.sortBy(_._1).map(_._2._2).mkString(","))
    val got = SparkEntry.queries("feed_manifest_merkle")(spark, d).collect()
    assert(got.length === l1.size)
    got.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[String]("digest1") === l1(b)._2, s"bucket $b digest")
      assert(r.getAs[Long]("n_pages") === l1(b)._1)
      assert(r.getAs[String]("root") === root, "root must repeat on every row")
    }
  }

  test("sample_poisson_bootstrap: replica sizes concentrate around n and weights match the ladder") {
    val n = graft.io.Tables.orders(spark, d).count()
    val rows = SparkEntry.queries("sample_poisson_bootstrap")(spark, d).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_samples")
      // Poisson(1) replica size has mean n, sd √n: 6σ window
      assert(math.abs(ns - n) <= 6 * math.sqrt(n.toDouble) + 1,
        s"replica ${r.getAs[Long]("b")} size $ns vs n=$n")
      assert(r.getAs[Long]("mean_c") ===
        r.getAs[Long]("sum_cents") / r.getAs[Long]("n_samples"))
    }
    // ladder ≡ direct inverse-CDF on a recomputed uniform for a few keys
    val cdf = {
      val pmf = Iterator.iterate((0, math.exp(-1.0))) {
        case (k, p) => (k + 1, p / (k + 1))
      }.take(7).map(_._2).toSeq
      pmf.scanLeft(0.0)(_ + _).tail
    }
    def expectedW(key: String): Long = {
      val h = java.lang.Long.parseLong(md5hex(key).take(6), 16)
      val u = h.toDouble / 16777216.0
      cdf.indexWhere(u < _) match { case -1 => 7L; case k => k.toLong }
    }
    // spot-check the Spark ladder on raw (orderkey, b) pairs
    val w = graft.io.Tables.orders(spark, d).select(col("o_orderkey")).limit(5)
      .collect().map(_.getLong(0)).flatMap(ok => (0L to 7L).map(b => (ok, b)))
    val ladder = spark.createDataFrame(w.toSeq).toDF("ok", "b")
      .withColumn("h", graft.api.Sampling.hashDecode24(
        concat(col("ok").cast("string"), lit(":"), col("b").cast("string"))))
      .collect().map(r => (r.getAs[Long]("ok"), r.getAs[Long]("b"), r.getAs[Long]("h")))
    ladder.foreach { case (ok, b, h) =>
      val u = h.toDouble / 16777216.0
      val direct = cdf.indexWhere(u < _) match { case -1 => 7L; case k => k.toLong }
      assert(direct === expectedW(s"$ok:$b"), s"decode mismatch for $ok:$b")
    }
  }

  test("stream_manifest_merkle lands exactly the batch manifest (cross-batch page state)") {
    val batch = SparkEntry.queries("feed_manifest_merkle")(spark, d)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("stream_manifest_merkle")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch,
      "incremental streaming maintenance must reproduce the batch Merkle manifest")
  }

  test("ts_theil_sen_trend ≡ brute-force median-of-slopes in plain Scala") {
    val daily = graft.io.Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("c")))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val pts = rows.map(r => (r._2, r._3))
      val slopes = (for {
        (d1, c1) <- pts; (d2, c2) <- pts if d1 < d2
      } yield math.floor((c2 - c1) * 1000000.0 / (d2 - d1)).toLong).sorted
      val n = slopes.length
      val med2 = slopes((n + 1) / 2 - 1) + slopes(n / 2)
      t -> (pts.length.toLong, n.toLong, med2)
    }
    val got = SparkEntry.queries("ts_theil_sen_trend")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_days"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("med2_slope_c"))).toMap
    expected.foreach { case (t, e) => assert(got(t) === e, s"type $t") }
  }

  test("lm_jelinek_mercer ≡ plain-Scala recomputation of the interpolated model") {
    // rebuild the per-language count tables and the ½/½ mixture in plain
    // Scala for a few docs and demand exact per-term quantized equality
    val docs = graft.io.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").limit(3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val corpus = graft.io.Tables.documents(spark, d)
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val got = SparkEntry.queries("lm_jelinek_mercer")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_big"), r.getAs[Long]("sum_lp_c"))).toMap
    docs.foreach { case (id, lang, text) =>
      val langToks = corpus.filter(_._1 == lang).flatMap(_._2.split(" "))
      val cu = langToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nt = langToks.length.toLong
      val langBigs = corpus.filter(_._1 == lang).flatMap(_._2.split(" ").sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")))
      val cb = langBigs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val toks = text.split(" ")
      val lps = toks.sliding(2).filter(_.length == 2).map { p =>
        val b = p.mkString(" ")
        math.floor(math.log(0.5 * cb(b) / cu(p(0)) + 0.5 * cu(p(1)) / nt) * 10000.0).toLong
      }.toSeq
      assert(got(id) === ((lps.length.toLong, lps.sum)),
        s"doc $id JM score diverged from plain-Scala recomputation")
    }
  }

  test("vec_kmeanspp_init ≡ brute-force k-center greedy in plain Scala") {
    val vecs = graft.io.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100000).toLong).toArray))
      .sortBy(_._1)
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var chosen = Seq(vecs.head)
    var expected = Seq((1L, vecs.head._1, 0L))
    var dmin = vecs.map(v => sq(v._2, vecs.head._2))
    for (step <- 2 to 4) {
      val best = vecs.indices.maxBy(i => (dmin(i), -vecs(i)._1))
      expected :+= ((step.toLong, vecs(best)._1, dmin(best)))
      chosen :+= vecs(best)
      dmin = vecs.indices.map(i =>
        math.min(dmin(i), sq(vecs(i)._2, vecs(best)._2))).toArray
    }
    val got = SparkEntry.queries("vec_kmeanspp_init")(spark, d).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("cid"),
        r.getAs[Long]("maxmin_d"))).toSeq
    assert(got === expected)
  }

  /** Truncated Brandes reference: forward layers with path counts,
    * backward δ-quantized dependency accumulation (inner-join
    * semantics — only nodes with ≥1 successor appear per fold). */
  private def bruteBetweenness(adj: Map[Long, Set[Long]]): Seq[(Long, Long)] = {
    val bc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (src <- Seq(1L, 2L, 3L, 4L) if adj.contains(src)) {
      var layers = Vector(Map(src -> 1L))
      var seen = Set(src)
      for (_ <- 1 to 3) {
        val next = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        layers.last.foreach { case (v, sig) =>
          adj.getOrElse(v, Set.empty).foreach(w => if (!seen(w)) next(w) += sig)
        }
        layers :+= next.toMap
        seen ++= next.keySet
      }
      var delta = layers(3).map { case (v, _) => v -> 0L }
      for (l <- 2 to 1 by -1) {
        val nd = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        layers(l).foreach { case (v, sv) =>
          adj(v).foreach { w =>
            layers(l + 1).get(w).foreach { sw =>
              nd(v) += sv * (1000000L + delta.getOrElse(w, 0L)) / sw
            }
          }
        }
        delta = nd.toMap
        delta.foreach { case (v, dq) => bc(v) += dq }
      }
    }
    bc.toSeq.sortBy { case (v, q) => (-q, v) }.take(20)
  }

  private def adjacencyOf(dir: String): Map[Long, Set[Long]] =
    graft.ops.GraphOps.edges(spark, dir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("graph_betweenness_khop ≡ brute-force truncated Brandes in plain Scala") {
    val got = SparkEntry.queries("graph_betweenness_khop")(spark, d).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("bc_q"))).toSeq
    assert(got === bruteBetweenness(adjacencyOf(d)))
  }

  test("graph_betweenness_khop: sigma guard — exact on a dense planted clique chain, loud past headroom") {
    import spark.implicits._
    // planted clique chain A(1-20)–B(20-40)–C(40-60): sources 1-4 sit in
    // A, walk counts multiply through the bridges (σ up to ~deg³) — a
    // DENSE graph that must pass UNDER the guard with exact results
    val tmp = java.nio.file.Files.createTempDirectory("graft_dense_graph").toString
    try {
      (Seq.tabulate(20)(p => (100L, p + 1L)) ++
        Seq.tabulate(21)(p => (200L, p + 20L)) ++
        Seq.tabulate(21)(p => (300L, p + 40L)))
        .toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      val got = SparkEntry.queries("graph_betweenness_khop")(spark, tmp).collect()
        .map(r => (r.getAs[Long]("part"), r.getAs[Long]("bc_q"))).toSeq
      assert(got.nonEmpty)
      assert(got === bruteBetweenness(adjacencyOf(tmp)))
    } finally
      // the checkpointed adjacency blocks live in memory, so the parquet
      // fixture can go as soon as the query ran (repeated suite runs were
      // leaking one graft_dense_graph dir each)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    // the guard expression itself: 0 inside the headroom, loud past it
    val ok = Seq(5L).toDF("x")
      .select((col("x") + graft.ops.BitGraphOps.sigmaGuard(lit(1.0e12))).as("y"))
      .collect()
    assert(ok.head.getLong(0) === 5L)
    val boom = intercept[Throwable] {
      Seq(1L).toDF("x")
        .select((col("x") + graft.ops.BitGraphOps.sigmaGuard(lit(9.0e18))).as("y"))
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${chain(t.getCause)}"
    assert(chain(boom).contains("graph_betweenness_khop"), chain(boom))
    // and it survives optimization in the real query (the coalesce fold
    // must keep column pruning from dropping it) — Spark 4 rewrites
    // assert_true to raise_error(USER_RAISED_EXCEPTION, map(...)), so
    // match the message in the rendered plan
    val opt = SparkEntry.queries("graph_betweenness_khop")(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("walk-count sigma"),
      "sigma overflow guard was pruned from the optimized plan")
  }

  test("feed_backfill_partition_plan: full coverage, disjoint ordered ranges, balanced depth") {
    val total = graft.io.Tables.events(spark, d).count()
    val rows = SparkEntry.queries("feed_backfill_partition_plan")(spark, d).collect()
      .map(r => (r.getAs[Long]("pno"), r.getAs[Long]("n_pages"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_id"), r.getAs[Long]("end_id")))
    assert(rows.map(_._3).sum === total, "partitions must cover every event")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 < b._4, "ranges must be disjoint and ordered")
      case _ =>
    }
    // equi-depth within one page of slack per boundary
    val target = total / 8.0
    rows.foreach { case (pno, _, n, _, _) =>
      assert(n <= target + 100 + target / 4 && n + 100 + target / 4 >= target,
        s"partition $pno depth $n far from target $target")
    }
  }

  test("feed_backfill_seq_plan: coverage, telescoping bounds, exact bucket inverse, dense-seq balance") {
    val ev = graft.io.Tables.events(spark, d)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val total = ev.length.toLong
    val rows = SparkEntry.queries("feed_backfill_seq_plan")(spark, d).collect()
      .map(r => (r.getAs[Long]("pno"), r.getAs[Long]("n_events"),
        r.getAs[Long]("first_id"), r.getAs[Long]("last_id"),
        r.getAs[Long]("bound_lo"), r.getAs[Long]("bound_hi"),
        r.getAs[String]("cursor_start"), r.getAs[String]("cursor_end")))
    assert(rows.map(_._1).toSeq === (1L to 8L), "8 buckets, 1..8")
    assert(rows.map(_._2).sum === total, "buckets must cover every event")
    // bounds telescope: bucket i's hi IS bucket i+1's lo — the union is
    // exactly (lo_seq, head] with no gap and no overlap
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._6 === b._5, "bounds must telescope")
      case _ =>
    }
    // every bucket's observed ids fall inside its (bound_lo, bound_hi]
    rows.foreach { case (pno, _, first, last, lo, hi, _, _) =>
      assert(first > lo && last <= hi, s"bucket $pno ids escape its bounds")
    }
    // brute-force inverse: assigning each id by linear scan over the
    // bounds reproduces the query's depths exactly
    val bounds = rows.map(_._6)
    val brute = ev.groupBy(e => bounds.indexWhere(e <= _) + 1)
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { case (pno, n, _, _, _, _, _, _) =>
      assert(brute(pno.toInt) === n, s"bucket $pno depth mismatch vs brute force")
    }
    // dense sequences ⇒ equi-width ≈ equi-depth: within 1 of the ideal
    val target = total / 8.0
    rows.foreach { case (pno, n, _, _, _, _, _, _) =>
      assert(math.abs(n - target) <= target / 4 + 1,
        s"bucket $pno depth $n far from dense-seq target $target")
    }
    // boundary cursors are the wire form: lpad-13 seq + '::', sorting
    // strictly between the seqs they separate
    rows.foreach { case (_, _, _, _, lo, hi, cs, ce) =>
      assert(cs === f"${lo + 1}%013d::" && ce === f"${hi + 1}%013d::")
      assert(f"$lo%013d" < cs && cs < f"${lo + 1}%013dx")
      assert(f"$hi%013d" < ce && ce < f"${hi + 1}%013dx")
    }
  }

  test("text_rake_keywords ≡ brute-force RAKE in plain Scala") {
    val stop = graft.api.Curation.Stopwords.toSet
    val docs = graft.io.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val deg = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val freq = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    docs.foreach { case (_, lang, text) =>
      // maximal stopword-delimited runs
      val phrases = text.split(" ").foldLeft(List(List.empty[String])) {
        case (acc, tk) if stop(tk) => Nil :: acc
        case (h :: t, tk) => (tk :: h) :: t
        case (Nil, tk) => List(List(tk))
      }.map(_.reverse).filter(_.nonEmpty)
      phrases.foreach { ph =>
        ph.foreach { w =>
          deg((lang, w)) += ph.length
          freq((lang, w)) += 1
        }
      }
    }
    val expected = deg.keys.groupBy(_._1).view.mapValues { ks =>
      ks.toSeq.map { k =>
        (k._2, freq(k), deg(k), deg(k) * 10000 / freq(k))
      }.sortBy { case (tk, _, _, sc) => (-sc, tk) }.take(20)
    }.toMap
    val got = SparkEntry.queries("text_rake_keywords")(spark, d).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rk"), r.getString(2),
        r.getAs[Long]("freq"), r.getAs[Long]("deg"), r.getAs[Long]("score_c")))
      .groupBy(_._1)
    expected.foreach { case (lang, exp) =>
      val g = got(lang).sortBy(_._2).map(x => (x._3, x._4, x._5, x._6)).toSeq
      assert(g === exp, s"lang $lang RAKE keywords diverged")
    }
  }

  test("eval_kendall_tau_daily ≡ brute-force pair counting in plain Scala") {
    val daily = graft.io.Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("c")))
    val types = daily.map(_._1).distinct.sorted
    val byType = daily.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val got = SparkEntry.queries("eval_kendall_tau_daily")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("nc"), r.getAs[Long]("nd"), r.getAs[Long]("nt"))).toMap
    for (t1 <- types; t2 <- types if t1 < t2) {
      val shared = (byType(t1).keySet intersect byType(t2).keySet).toSeq.sorted
      var (nc, nd, nt) = (0L, 0L, 0L)
      for (i <- shared.indices; j <- i + 1 until shared.length) {
        val p = (byType(t1)(shared(j)) - byType(t1)(shared(i))) *
          (byType(t2)(shared(j)) - byType(t2)(shared(i)))
        if (p > 0) nc += 1 else if (p < 0) nd += 1 else nt += 1
      }
      val np = shared.length.toLong * (shared.length - 1) / 2
      assert(got((t1, t2)) === ((np, nc, nd, nt)), s"pair ($t1, $t2)")
    }
  }

  test("ts_dft_energy: Fourier sums recompute exactly from the tabulated integer trig") {
    val daily = graft.io.Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("c")))
    def tab(period: Int, f: Double => Double): IndexedSeq[Long] =
      (0 until period).map(k => math.floor(
        f(2.0 * math.Pi * k / period) * 1000.0).toLong)
    val (c7, s7, c30, s30) = (tab(7, math.cos), tab(7, math.sin),
      tab(30, math.cos), tab(30, math.sin))
    val expected = daily.groupBy(_._1).view.mapValues { rows =>
      val a7 = rows.map(r => r._3 * c7((r._2 % 7).toInt)).sum
      val b7 = rows.map(r => r._3 * s7((r._2 % 7).toInt)).sum
      val a30 = rows.map(r => r._3 * c30((r._2 % 30).toInt)).sum
      val b30 = rows.map(r => r._3 * s30((r._2 % 30).toInt)).sum
      (rows.size.toLong, a7, b7, a7 * a7 + b7 * b7, a30, b30, a30 * a30 + b30 * b30)
    }.toMap
    val got = SparkEntry.queries("ts_dft_energy")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_days"), r.getAs[Long]("a7"),
        r.getAs[Long]("b7"), r.getAs[Long]("e7"), r.getAs[Long]("a30"),
        r.getAs[Long]("b30"), r.getAs[Long]("e30"))).toMap
    expected.foreach { case (t, e) => assert(got(t) === e, s"type $t") }
  }

  test("ann_ivf_nprobe_sweep: cost and recall are monotone in nprobe") {
    val rows = SparkEntry.queries("ann_ivf_nprobe_sweep")(spark, d).collect()
      .map(r => (r.getAs[Long]("np"), r.getAs[Long]("n_scanned"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 > a._2, "probing more cells must scan more rows")
        assert(b._3 >= a._3, "recall must be monotone non-decreasing in nprobe")
      case _ =>
    }
    assert(rows.last._4 > 0, "np=3 must recover some true neighbors")
  }

  test("graph_mst_boruvka_step ≡ brute-force min-edge selection + union-find") {
    val edges = graft.ops.GraphOps.edges(spark, d).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")))
    def md5hex6(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString, 16)
    def w(a: Long, b: Long): Long = md5hex6(s"${math.min(a, b)}:${math.max(a, b)}")
    val sel = edges.groupBy(_._1).values.map { inc =>
      val (u, v) = inc.minBy { case (a, b) => (w(a, b), b) }
      (math.min(u, v), math.max(u, v), w(u, v))
    }.toSet
    // union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x; while (c != r) { val n = parent(c); parent(c) = r; c = n }; r
    }
    sel.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = sel.flatMap(e => Seq(e._1, e._2))
    val comps = nodes.groupBy(find)
    val expected = comps.map { case (rep, members) =>
      val es = sel.filter(e => find(e._1) == rep)
      rep -> (members.size.toLong, es.size.toLong, es.map(_._3).sum)
    }
    val got = SparkEntry.queries("graph_mst_boruvka_step")(spark, d).collect()
      .map(r => r.getAs[Long]("rep") -> (r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("sum_w"))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (rep, e) => assert(got(rep) === e, s"component $rep") }
  }

  test("dedup_weighted_jaccard ≡ brute-force multiset Jaccard in plain Scala") {
    val docs = graft.io.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bag(t: String): Map[String, Long] =
      t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bags = docs.map { case (id, l, t) => (id, l, bag(t)) }
    val expected = (for {
      (d1, l1, b1) <- bags; (d2, l2, b2) <- bags
      if d1 < d2 && l1 == l2
      t1 = b1.values.sum; t2 = b2.values.sum
      if math.abs(t1 - t2) <= 20
      smin = (b1.keySet intersect b2.keySet).toSeq
        .map(k => math.min(b1(k), b2(k))).sum
      if smin > 0 && smin * 1.0 / (t1 + t2 - smin) >= 0.4
    } yield (d1, d2,
      math.floor(smin * 1.0 / (t1 + t2 - smin) * 10000).toLong)).toSet
    val got = SparkEntry.queries("dedup_weighted_jaccard")(spark, d).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("wj_c"))).toSet
    assert(got === expected)
  }

  test("packed_tf_min_overlap: merge edge cases (empty, disjoint, shared, bounds)") {
    graft.catalyst.GraftExtensions.install(spark)
    def pack(pairs: (Long, Long)*): String =
      pairs.map { case (id, tf) => (id << 20) | tf }.sorted.mkString("array(", "L,", "L)")
    def eval(a: String, b: String): Long = spark.sql(
      s"SELECT packed_tf_min_overlap(${a.replace("array()", "array_remove(array(0L), 0L)")}, " +
        s"${b.replace("array()", "array_remove(array(0L), 0L)")}) v").head().getLong(0)
    assert(eval("array()", pack(1L -> 3L)) === 0L)          // empty side
    assert(eval(pack(1L -> 2L), pack(2L -> 2L)) === 0L)     // disjoint ids
    assert(eval(pack(1L -> 2L, 2L -> 5L, 9L -> 1L),
                pack(2L -> 3L, 9L -> 4L, 11L -> 7L)) === 3L + 1L) // min per shared id
    assert(eval(pack(7L -> 0xFFFFFL), pack(7L -> 1L)) === 1L)     // tf at packing bound
  }

  test("basket_triple_support ≡ brute-force 3-itemset counting in plain Scala") {
    val li = graft.io.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val orders = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val ic = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val no = orders.size.toLong
    val support = scala.collection.mutable.Map[(Long, Long, Long), Long]().withDefaultValue(0L)
    orders.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length; k <- j + 1 until ps.length)
        support((ps(i), ps(j), ps(k))) += 1
    }
    val expected = support.filter(_._2 >= 2).toSeq
      .map { case ((p1, p2, p3), sup) =>
        val lift = math.floor(sup.toDouble * no * no /
          (ic(p1) * ic(p2) * ic(p3)) * 1000000).toLong
        (p1, p2, p3, sup, lift)
      }
      .sortBy { case (p1, p2, p3, sup, _) => (-sup, p1, p2, p3) }.take(20)
    val got = SparkEntry.queries("basket_triple_support")(spark, d).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"), r.getAs[Long]("p3"),
        r.getAs[Long]("support"), r.getAs[Long]("lift_ppm"))).toSeq
    assert(got === expected)
  }

  test("emb_covariance_topk ≡ brute-force scaled covariance in plain Scala") {
    val vecs = graft.io.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100000).toLong).toArray)
    val n = vecs.length.toLong
    val dims = vecs.head.length
    val sx = (0 until dims).map(i => vecs.map(_(i)).sum)
    val expected = (for {
      i <- 0 until dims; j <- i until dims
      sxy = vecs.map(v => v(i) * v(j)).sum
    } yield (i.toLong, j.toLong, n * sxy - sx(i) * sx(j)))
      .sortBy { case (i, j, c) => (-math.abs(c), i, j) }.take(20)
    val got = SparkEntry.queries("emb_covariance_topk")(spark, d).collect()
      .map(r => (r.getAs[Long]("di"), r.getAs[Long]("dj"), r.getAs[Long]("cov_s"))).toSeq
    assert(got === expected)
  }

  test("graph_coreness_hindex ≡ brute-force 4-round h-index iteration; bounded by degree") {
    val edges = graft.ops.GraphOps.edges(spark, d).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var c: Map[Long, Long] = adj.view.mapValues(_.length.toLong).toMap
    val deg = c
    def hIndex(vals: Seq[Long]): Long = {
      val sorted = vals.sorted(Ordering[Long].reverse)
      sorted.zipWithIndex.map { case (v, k) => math.min(v, k + 1L) }.max
    }
    for (_ <- 1 to 4)
      c = adj.map { case (u, nbrs) => u -> hIndex(nbrs.map(c)) }
    c.foreach { case (u, cv) =>
      assert(cv <= deg(u), "coreness estimate can never exceed degree")
    }
    val expected = c.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("graph_coreness_hindex")(spark, d).collect()
      .map(r => r.getAs[Long]("coreness") -> r.getAs[Long]("n_nodes")).toMap
    assert(got === expected)
  }

  test("feed_delete_latency ≡ brute-force tombstone-lag audit in plain Scala") {
    val ev = graft.io.Tables.events(spark, d)
      .select("user_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val perUser = byUser.flatMap { case (u, rows) =>
      val errs = rows.filter(_._2 == "error").map(_._3)
      if (errs.isEmpty) None
      else {
        val terr = errs.min
        val puts = rows.filter(r => r._2 != "error" && r._3 < terr).map(_._3)
        Some((u, terr, puts.maxOption))
      }
    }
    val expected = perUser.groupBy(_._1 % 10).view.mapValues { us =>
      val lats = us.toSeq.collect { case (_, terr, Some(tput)) => terr - tput }
      (us.size.toLong, us.count(_._3.isEmpty).toLong,
        if (lats.isEmpty) None else Some((lats.sum, lats.min, lats.max)))
    }.toMap
    val got = SparkEntry.queries("feed_delete_latency")(spark, d).collect()
      .map(r => r.getAs[Long]("user_bucket") -> r).toMap
    expected.foreach { case (b, (n, noPrior, lat)) =>
      val r = got(b)
      assert(r.getAs[Long]("n_deleted") === n)
      assert(r.getAs[Long]("n_no_prior") === noPrior)
      lat.foreach { case (s, mn, mx) =>
        assert(r.getAs[Long]("sum_latency_us") === s)
        assert(r.getAs[Long]("min_latency_us") === mn)
        assert(r.getAs[Long]("max_latency_us") === mx)
      }
    }
  }

  test("ts_sax_symbolize ≡ brute-force rank-quartile SAX in plain Scala") {
    val daily = graft.io.Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day"), r.getAs[Long]("c")))
    val expected = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val n = rows.length.toLong
      val (mnd, mxd) = (rows.map(_._2).min, rows.map(_._2).max)
      val ranked = rows.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case ((_, day, c), i) => (day, c, (i.toLong * 4) / n) }
      ranked.groupBy { case (day, _, _) => (day - mnd) * 8 / (mxd - mnd + 1) }
        .map { case (seg, ds) =>
          val dom = ds.groupBy(_._3).view.mapValues(_.size).toSeq
            .minBy { case (sym, cnt) => (-cnt, sym) }._1
          (t, seg, ds.length.toLong, ds.map(_._2).sum * 100 / ds.length, dom)
        }
    }.toSet
    val got = SparkEntry.queries("ts_sax_symbolize")(spark, d).collect()
      .map(r => (r.getString(0), r.getAs[Long]("seg"), r.getAs[Long]("n_days"),
        r.getAs[Long]("mean_c100"), r.getAs[Long]("dom_symbol"))).toSet
    assert(got === expected)
  }

  test("stream_cms_state: one-sided error and exact totals for every probe") {
    val rows = SparkEntry.queries("stream_cms_state")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        "count-min must never undercount")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
  }

  test("dq_functional_deps: brute-force FD audit and the name-key sanity law") {
    val p = graft.io.Tables.part(spark, d)
      .select("p_name", "p_brand", "p_type", "p_size").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    def audit[L, R](pairs: Seq[(L, R)]): (Long, Long, Long) = {
      val g = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
      (g.size.toLong, g.values.count(_ > 1).toLong, g.values.max)
    }
    val expected = Map(
      "brand_to_type" -> audit(p.map(r => (r._2, r._3)).toSeq),
      "type_to_size" -> audit(p.map(r => (r._3, r._4)).toSeq),
      "name_to_brand" -> audit(p.map(r => (r._1, r._2)).toSeq))
    val got = SparkEntry.queries("dq_functional_deps")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_lhs"),
        r.getAs[Long]("n_violating"), r.getAs[Long]("max_rhs_per_lhs"))).toMap
    assert(got === expected)
  }

  test("stats_selectivity_probe: estimates within 1% of actual on this distribution") {
    val rows = SparkEntry.queries("stats_selectivity_probe")(spark, d).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("err_ppm") <= 10000,
        s"k=${r.getAs[Long]("k")} histogram estimate off by ${r.getAs[Long]("err_ppm")} ppm")
      assert(r.getAs[Long]("est") >= 0 && r.getAs[Long]("actual") >= 0)
    }
  }

  test("join_asof_interpolated ≡ brute-force bracketing in plain Scala; bounded by endpoints") {
    val ev = graft.io.Tables.events(spark, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select("user_id", "event_id", "ts_us", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        math.floor(r.getDouble(4) * 10000).toLong))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val expected = byUser.values.flatten.filter(_._4 == "purchase").map {
      case (u, id, ts, _, _) =>
        val seq = byUser(u)
        val idx = seq.indexWhere(e => e._2 == id)
        val prev = seq.take(idx).filter(_._4 == "view").lastOption
        val next = seq.drop(idx + 1).filter(_._4 == "view").headOption
        val (v, mode) = (prev, next) match {
          case (Some(p), Some(n)) if n._3 != p._3 =>
            (Some(p._5 + math.floor((n._5 - p._5).toDouble *
              (ts - p._3).toDouble / (n._3 - p._3).toDouble).toLong), "interp")
          case (Some(p), _) => (Some(p._5), "prev_only")
          case (_, Some(n)) => (Some(n._5), "next_only")
          case _ => (None, "none")
        }
        id -> (v, mode)
    }.toMap
    val got = SparkEntry.queries("join_asof_interpolated")(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("interp_c")).map(_.asInstanceOf[Long]),
          r.getAs[String]("mode"))).toMap
    assert(got === expected)
    got.values.filter(_._2 == "interp").foreach { case (v, _) =>
      assert(v.isDefined)
    }
  }

  test("stream_delete_latency_state lands the batch audit over the replay window") {
    val w = graft.io.Tables.events(spark, d)
      .filter(col("event_id") < graft.streaming.StreamOps.ReplayBound)
      .select("user_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = w.groupBy(_._1).flatMap { case (u, rows) =>
      val errs = rows.filter(_._2 == "error").map(_._3)
      if (errs.isEmpty) None
      else {
        val terr = errs.min
        Some((u, terr, rows.filter(r => r._2 != "error" && r._3 < terr)
          .map(_._3).maxOption))
      }
    }.groupBy(_._1 % 10).view.mapValues { us =>
      val lats = us.toSeq.collect { case (_, t, Some(p)) => t - p }
      (us.size.toLong, us.count(_._3.isEmpty).toLong,
        if (lats.isEmpty) None else Some(lats.sum)) // SQL sum of all-null = NULL
    }.toMap
    val got = SparkEntry.queries("stream_delete_latency_state")(spark, d).collect()
      .map(r => r.getAs[Long]("user_bucket") -> (r.getAs[Long]("n_deleted"),
        r.getAs[Long]("n_no_prior"),
        Option(r.getAs[Any]("sum_latency_us")).map(_.asInstanceOf[Long]))).toMap
    assert(got === expected)
  }

  test("graph_random_walk_counts ≡ brute-force md5 walks in plain Scala") {
    val adj = graft.ops.GraphOps.adjacency(spark, d)
      .select("u", "vs").collect()
      .map(r => r.getAs[Long]("u") -> r.getSeq[Long](1).toIndexedSeq).toMap
    def decode24(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString, 16)
    val visits = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (src <- Seq(1L, 2L, 3L, 4L) if adj.contains(src); w <- 0L to 15L) {
      var cur = src
      for (t <- 1 to 3) {
        val vs = adj(cur)
        cur = vs((decode24(s"$src:$w:$t:$cur") % vs.length).toInt)
        visits(cur) += 1
      }
    }
    val expected = visits.toSeq.sortBy { case (n, c) => (-c, n) }.take(30)
    val got = SparkEntry.queries("graph_random_walk_counts")(spark, d).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("visits"))).toSeq
    assert(got === expected)
  }

  test("ivm_join_delta: merged partials equal a from-scratch recompute") {
    val full = graft.io.Tables.orders(spark, d)
      .join(graft.io.Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      .collect().map(r => (r.getInt(0), r.getAs[Long](1), r.getAs[Long](2))).toSet
    val got = SparkEntry.queries("ivm_join_delta")(spark, d).collect()
      .map(r => (r.getInt(0), r.getAs[Long](1), r.getAs[Long](2))).toSet
    assert(got === full, "delta-join merge must equal the full recompute")
  }

  test("TPC-H tail additions: distribution totals, max uniqueness, threshold laws") {
    val nCust = graft.io.Tables.customer(spark, d).count()
    val q13 = SparkEntry.queries("q13_custdist")(spark, d).collect()
    assert(q13.map(_.getAs[Long]("custdist")).sum === nCust,
      "q13 distribution must cover every customer exactly once")
    val q15 = SparkEntry.queries("q15_top_supplier")(spark, d).collect()
    assert(q15.nonEmpty)
    assert(q15.map(_.getAs[Long]("total_rev_c")).distinct.length === 1,
      "q15 rows must all carry the single maximal revenue")
    val q17 = SparkEntry.queries("q17_small_qty_revenue")(spark, d).collect().head
    assert(q17.getAs[Long]("avg_yearly_c") === q17.getAs[Long]("rev_c") / 7)
    // q22: every reported nation group is above-average balance by law of
    // construction; just assert schema + non-negative aggregates
    SparkEntry.queries("q22_idle_customers")(spark, d).collect().foreach { r =>
      assert(r.getAs[Long]("numcust") > 0 && r.getAs[Long]("totacctbal_c") > 0)
    }
  }

  test("layout_rle_runs: Z-order clusters the secondary keys far better than natural order") {
    val rows = SparkEntry.queries("layout_rle_runs")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("adj_pk"), r.getAs[Long]("adj_sk"))).toMap
    assert(rows.keySet === Set("natural", "zorder"))
    assert(rows("zorder")._1 > rows("natural")._1,
      "Z-order must improve part-key adjacency")
    assert(rows("zorder")._2 > rows("natural")._2,
      "Z-order must improve supp-key adjacency")
  }

  test("events_markov_entropy ≡ brute-force chain entropy in plain Scala") {
    val ev = graft.io.Tables.events(spark, d)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val cij = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ci = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val k = ci.size
    val expected = ci.keys.map { i =>
      val h = cij.collect { case ((`i`, _), c) =>
        val p = c.toDouble / ci(i)
        math.floor(-p * math.log(p) * 1e9).toLong
      }.sum
      val pi1 = cij.collect { case ((ii, j), c) if j == i =>
        (1000000L / k) * c / ci(ii)
      }.sum
      i -> (ci(i), h, pi1)
    }.toMap
    val got = SparkEntry.queries("events_markov_entropy")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_out"), r.getAs[Long]("h_c"),
        r.getAs[Long]("pi1_ppm"))).toMap
    assert(got === expected)
  }

  test("text_zipf_fit ≡ brute-force log-log regression; slope negative") {
    val tf = graft.io.Tables.documents(spark, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tk"))
      .groupBy("lang", "tk").agg(count(lit(1)).as("f")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("f")))
    val expected = tf.groupBy(_._1).view.mapValues { rows =>
      val ranked = rows.sortBy(r => (-r._3, r._2)).zipWithIndex
      val pts = ranked.map { case ((_, _, f), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1000).toLong,
          math.floor(math.log(f.toDouble) * 1000).toLong)
      }
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      (n, math.floor((n * sxy - sx * sy).toDouble * 10000.0 /
        (n * sxx - sx * sx).toDouble).toLong)
    }.toMap
    val got = SparkEntry.queries("text_zipf_fit")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_vocab"),
        r.getAs[Long]("slope_c"))).toMap
    assert(got === expected)
    got.values.foreach { case (_, slope) =>
      assert(slope < 0, "Zipf exponent must be negative")
    }
  }

  test("session_path_topk: path multiset consistent with sessionize_ids session count") {
    val sessions = SparkEntry.queries("sessionize_ids")(spark, d).count()
    val paths = SparkEntry.queries("session_path_topk")(spark, d).collect()
    assert(paths.nonEmpty && paths.length <= 20)
    assert(paths.map(_.getAs[Long]("n_sessions")).sum <= sessions,
      "top-20 path counts cannot exceed the total session count")
    paths.foreach { r =>
      val p = r.getString(0)
      assert(p.split(">").length >= 1 && p.split(">").length <= 3)
    }
  }

  test("ts_interval_union_coverage ≡ brute-force interval union in plain Scala") {
    val len = 300000000L
    val ev = graft.io.Tables.events(spark, d)
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).view.mapValues { rows =>
      val starts = rows.map(_._2).sorted
      var islands = List.empty[(Long, Long)] // (start, end) desc
      starts.foreach { s =>
        islands match {
          case (a, e) :: t if s <= e => islands = (a, math.max(e, s + len)) :: t
          case _ => islands = (s, s + len) :: islands
        }
      }
      (islands.size.toLong, islands.map { case (a, e) => e - a }.sum)
    }.toMap
    val got = SparkEntry.queries("ts_interval_union_coverage")(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("covered_us"))).toMap
    assert(got === expected)
    // the union law: covered time never exceeds n·len and never
    // undershoots a single interval
    got.values.foreach { case (n, cov) => assert(cov >= len && cov <= n * 10000 * len) }
  }

  test("feed_order_violation_audit ≡ brute-force inversion scan in plain Scala") {
    val ev = graft.io.Tables.events(spark, d)
      .select("event_type", "event_id", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).view.mapValues { rows =>
      val s = rows.sortBy(_._2).map(_._3)
      var (mx, inv, worst) = (Long.MinValue, 0L, Option.empty[Long])
      s.foreach { t =>
        if (mx != Long.MinValue && t < mx) {
          inv += 1
          worst = Some(math.max(worst.getOrElse(0L), mx - t))
        }
        mx = math.max(mx, t)
      }
      (rows.size.toLong, inv, worst)
    }.toMap
    val got = SparkEntry.queries("feed_order_violation_audit")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_inversions"),
        Option(r.getAs[Any]("max_back_us")).map(_.asInstanceOf[Long]))).toMap
    assert(got === expected)
  }

  test("vec_random_projection: exact Scala re-projection and JL concentration") {
    val emb = graft.io.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").limit(10)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val signs = (0 until 16).map(j => (0 until 64).map { pos =>
      (md5hex(s"$pos:$j").charAt(0).toInt % 2) * 2 - 1
    })
    val got = SparkEntry.queries("vec_random_projection")(spark, d)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("proj"), r.getAs[Long]("jl_ratio_c"))).toMap
    emb.foreach { case (id, v) =>
      val qv = v.map(x => math.floor(x * 100000).toLong)
      val proj = (0 until 16).map(j =>
        qv.indices.map(i => qv(i) * signs(j)(i)).sum)
      assert(got(id)._1 === proj.mkString(","), s"vec $id projection")
    }
    // JL: E[|Pv|²] = k·|v|² ⇒ ratio_c concentrates near 10000; with k=16
    // the relative sd is √(2/16) ≈ 0.35 — assert the median is within
    // ±50% and every vector within a wide [1000, 40000] sanity band
    val ratios = got.values.map(_._2).toSeq.sorted
    assert(ratios(ratios.size / 2) > 5000 && ratios(ratios.size / 2) < 20000,
      s"median JL ratio ${ratios(ratios.size / 2)}")
    assert(ratios.head >= 500 && ratios.last <= 60000,
      s"JL ratio range [${ratios.head}, ${ratios.last}]")
  }

  // ---- driver-round-9 batch: TPC-H completion + skew agg + stream state ----

  test("q11_important_stock ≡ brute-force share filter in plain Scala") {
    val li = graft.io.Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * (1.0 - r.getDouble(2)) * 100.0).toLong))
    val perPart = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tot = perPart.values.sum
    val np = perPart.size.toLong
    val expected = perPart.filter { case (_, v) => v * np * 5L > tot * 6L }
    val got = SparkEntry.queries("q11_important_stock")(spark, d).collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("value_c")).toMap
    assert(got === expected)
  }

  test("q12_ship_priority_mix ≡ brute-force conditional counts in plain Scala") {
    val orders = graft.io.Tables.orders(spark, d)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
        col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val hi = Set("1-URGENT", "2-HIGH")
    val cls = Array("AIR", "SHIP", "TRUCK")
    val acc = scala.collection.mutable.Map[String, (Long, Long)]().withDefaultValue((0L, 0L))
    graft.io.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("sd_us"))
      .collect().foreach { r =>
        val (odUs, prio) = orders(r.getLong(0))
        if (r.getLong(2) - odUs >= 45L * 86400000000L) {
          val c = cls((r.getLong(1) % 3).toInt)
          val (h, l) = acc(c)
          acc(c) = if (hi(prio)) (h + 1, l) else (h, l + 1)
        }
      }
    val got = SparkEntry.queries("q12_ship_priority_mix")(spark, d).collect()
      .map(r => r.getAs[String]("ship_class") ->
        (r.getAs[Long]("high_line_count"), r.getAs[Long]("low_line_count"))).toMap
    assert(got === acc.toMap)
  }

  test("q20_promo_excess ≡ brute-force threshold semi-join in plain Scala") {
    val econ = graft.io.Tables.part(spark, d).filter(col("p_type") === "ECONOMY")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val shipped = graft.io.Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        year(col("l_shipdate")).as("sy")).collect()
      .filter(r => econ(r.getLong(0)) && r.getInt(3) == 1998)
      .map(r => ((r.getLong(0), r.getLong(1)), math.floor(r.getDouble(2)).toLong))
    val bySuppPart = shipped.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byPart = bySuppPart.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val excess = bySuppPart.collect {
      case ((pk, sk), q) if q * 2 > byPart(pk) => sk
    }.toSet
    val got = SparkEntry.queries("q20_promo_excess")(spark, d).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(got === excess)
  }

  test("q9_product_profit ≡ brute-force nation-year profit in plain Scala") {
    val promo = graft.io.Tables.part(spark, d).filter(col("p_type") === "PROMO")
      .select("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nation = graft.io.Tables.nation(spark, d).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val supp = graft.io.Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> nation(r.getInt(1))).toMap
    val oyear = graft.io.Tables.orders(spark, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("oy"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val acc = scala.collection.mutable.Map[(String, Long), Long]().withDefaultValue(0L)
    graft.io.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount").collect().foreach { r =>
        promo.get(r.getLong(1)).foreach { retail =>
          val rev = math.floor(r.getDouble(4) * (1.0 - r.getDouble(5)) * 100.0).toLong
          val cost = math.floor(retail * r.getDouble(3) * 60.0).toLong
          acc((supp(r.getLong(2)), oyear(r.getLong(0)))) += rev - cost
        }
      }
    val got = SparkEntry.queries("q9_product_profit")(spark, d).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")) ->
        r.getAs[Long]("profit_c")).toMap
    assert(got === acc.toMap)
  }

  test("agg_skew_salted ≡ direct unsalted aggregate in plain Scala") {
    val acc = scala.collection.mutable.Map[String, (Long, Long)]().withDefaultValue((0L, 0L))
    graft.io.Tables.events(spark, d).select("event_type", "value").collect()
      .foreach { r =>
        val (n, v) = acc(r.getString(0))
        acc(r.getString(0)) = (n + 1, v + math.floor(r.getDouble(1) * 10000.0).toLong)
      }
    val got = SparkEntry.queries("agg_skew_salted")(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_ev"), r.getAs[Long]("value_c"))).toMap
    assert(got === acc.toMap)
  }

  test("stream_interval_union_state ≡ plain-Scala interval merge per user") {
    val len = 300000000L
    val ev = graft.io.Tables.events(spark, d).filter(col("event_id") < 20000)
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).view.mapValues { rows =>
      val ts = rows.map(_._2).sorted
      var islands = 0L
      var covered = 0L
      var curStart = -1L
      var curEnd = -1L
      ts.foreach { t =>
        if (curEnd < 0 || t > curEnd) {
          if (curEnd >= 0) covered += curEnd - curStart
          islands += 1; curStart = t; curEnd = t + len
        } else curEnd = math.max(curEnd, t + len)
      }
      covered += curEnd - curStart
      (islands, covered)
    }.toMap
    val got = SparkEntry.queries("stream_interval_union_state")(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("covered_us"))).toMap
    assert(got === expected)
  }
}
