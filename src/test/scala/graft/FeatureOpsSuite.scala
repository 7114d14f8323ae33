package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Sketches

/** Semantic invariants of the §2.17 feature/cohort operators, checked
  * against independent recomputation (HOF folds instead of the native
  * kernels, brute-force instead of blocking) — the same
  * oracle-independent style as CorpusOpsSuite.
  */
class FeatureOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  test("tfidf_vectorize: ranks are dense, ordered by quantized score, ≤3 per doc") {
    val out = SparkEntry.queries("tfidf_vectorize")(spark, d)
      .select("doc_id", "rk", "score_c", "tk").collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"doc $doc ranks not dense")
      assert(sorted.length <= 3)
      // rank order must agree with (score_c desc, tk asc) — the integer
      // ordering contract: no float ever decides a position
      val resorted = rows.sortBy(r => (-r.getLong(2), r.getString(3)))
      assert(resorted.map(_.getInt(1)).toSeq == sorted.map(_.getInt(1)).toSeq)
    }
  }

  test("tfidf_vectorize: equal tf, rarer token scores at least as high") {
    val rows = SparkEntry.queries("tfidf_vectorize")(spark, d)
      .select("doc_id", "tf", "df", "score_c").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      for (a <- rs; b <- rs
           if a.getLong(1) == b.getLong(1) && a.getLong(2) < b.getLong(2))
        assert(a.getLong(3) >= b.getLong(3),
          s"tf equal but rarer token (df ${a.getLong(2)} < ${b.getLong(2)}) scored lower")
    }
  }

  test("dedup_semantic_block ≡ brute-force cosine pairs within assigned cells") {
    val out = SparkEntry.queries("dedup_semantic_block")(spark, d)
      .select("v1", "v2").as[(Long, Long)].collect().toSet

    // independent recomputation: driver-side assignment + brute-force pairs
    val emb = graft.io.Tables.embeddings(spark, d)
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cvec")).collect()
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def sq(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    def dt(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map(c => (sq(v, c.getSeq[Float](1).toArray), c.getLong(0)))
        .min._2
    }.toMap
    val expected = (for {
      (i, vi) <- vecs; (j, vj) <- vecs
      if i < j && cellOf(i) == cellOf(j)
      cos = dt(vi, vj) / (math.sqrt(dt(vi, vi)) * math.sqrt(dt(vj, vj)))
      if cos >= 0.35
    } yield (i, j)).toSet
    assert(out == expected)
  }

  test("distinct_kmv_sketch: estimate within KMV error bounds; small groups exact") {
    val rows = SparkEntry.queries("distinct_kmv_sketch")(spark, d)
      .select("event_type", "n_exact", "est_c").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2) / 100.0
      if (exact < 32) assert(est == exact.toDouble,
        s"${r.getString(0)}: buffer not full, estimate must be exact")
      else {
        // stderr ≈ 1/√(k−2) ≈ 18% at k=32; 5σ acceptance keeps the test
        // deterministic-in-practice while still catching a broken estimator
        assert(math.abs(est / exact - 1.0) < 0.9,
          s"${r.getString(0)}: est $est vs exact $exact out of bounds")
      }
    }
  }

  test("kmvDistinct on a planted set: exact below k, bounded error above") {
    val small = (1 to 10).map(i => ("g", i.toLong)).toDF("g", "id")
    val rs = Sketches.kmvDistinct(small, $"g", $"id", k = 32).collect()
    assert(rs.head.getLong(1) == 10 && rs.head.getDouble(2) == 10.0)
    val big = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "id")
    val rb = Sketches.kmvDistinct(big, $"g", $"id", k = 64).collect()
    val est = rb.head.getDouble(2)
    assert(math.abs(est / 5000.0 - 1.0) < 0.6, s"est $est for 5000 distinct")
  }

  test("sketch_kmv_merge: merged per-day sketches ≡ the direct global sketch") {
    val direct = SparkEntry.queries("distinct_kmv_sketch")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val merged = SparkEntry.queries("sketch_kmv_merge")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == direct,
      "merging per-shard KMV states must lose nothing vs the direct sketch")
  }

  test("cohort_retention: offset-0 cell equals cohort size; offsets non-negative") {
    val out = SparkEntry.queries("cohort_retention")(spark, d)
      .select("cohort_wk", "wk_off", "n_users").collect()
    assert(out.forall(_.getLong(1) >= 0))
    val ev = graft.io.Tables.events(spark, d)
      .select($"user_id", expr("ts_us div 604800000000").as("wk"))
    val cohortSizes = ev.groupBy("user_id").agg(min("wk").as("c"))
      .groupBy("c").count().as[(Long, Long)].collect().toMap
    out.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == cohortSizes(r.getLong(0)),
        s"cohort ${r.getLong(0)}: offset-0 count ${r.getLong(2)} != cohort size")
    }
    // no retention cell can exceed its cohort's size
    out.foreach(r => assert(r.getLong(2) <= cohortSizes(r.getLong(0))))
  }

  test("cooccur_pmi: counts ≥ 5, dense per-lang ranks, pmi matches recomputation") {
    graft.catalyst.GraftExtensions.install(spark)
    val out = SparkEntry.queries("cooccur_pmi")(spark, d).collect()
    if (out.nonEmpty) {
      assert(out.forall(_.getLong(2) >= 5))
      out.groupBy(_.getString(0)).foreach { case (_, rs) =>
        val rks = rs.map(_.getInt(4)).sorted.toSeq
        assert(rks == (1 to rks.length))
      }
      // recompute pmi for the top pair of one language from raw counts
      val docs = graft.io.Tables.documents(spark, d)
        .select($"lang", split($"text", " ").as("ts"))
      val top = out.minBy(r => (r.getString(0), r.getInt(4)))
      val lang = top.getString(0)
      val Array(w1, w2) = top.getString(1).split(" ", 2)
      val toks = docs.filter($"lang" === lang).select(explode($"ts").as("w"))
      val cA = toks.filter($"w" === w1).count()
      val cB = toks.filter($"w" === w2).count()
      val totU = toks.count()
      val bis = docs.filter($"lang" === lang)
        .select(explode(call_function("word_bigrams",
          concat_ws(" ", $"ts"))).as("bg"))
      val cAB = bis.filter($"bg" === top.getString(1)).count()
      val totB = bis.count()
      val pmi = math.log((cAB.toDouble * totU * totU) / (totB.toDouble * cA * cB))
      assert(top.getLong(3) == math.floor(pmi * 100).toLong,
        s"pmi mismatch for $lang '$w1 $w2'")
      assert(cAB == top.getLong(2))
    }
  }

  test("bitmap_index_overlap ≡ brute-force distinct-bucket set algebra") {
    val rows = graft.ops.FeatureOps.queries("bitmap_index_overlap")(
      spark, TestSpark.sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val sets = graft.io.Tables.events(spark, TestSpark.sfDir)
      .selectExpr("event_type", "user_id % 1024 as b").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
      a = sets(types(i)); b = sets(types(j))
      ov = (a intersect b).size.toLong
    } yield (types(i), types(j)) ->
      ((a.size.toLong, b.size.toLong, ov,
        ov * 1000000L / (a.size + b.size - ov)))).toMap
    assert(rows == want)
  }
}
