package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SampleOps

/** Semantic checks for the §2.14 sampling/vocabulary/information
  * operators — invariants the DuckDB hash-compare can't express
  * (weight-scale invariance, quota bounds, coverage minimality, entropy
  * bounds), recomputed independently over the sf0.001 fixtures.
  */
class SampleOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def q(name: String) = SampleOps.queries(name)(spark, d)

  private lazy val docs: Seq[(Long, String, String)] =
    graft.io.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("sample_weighted: matches an independent A-Res recomputation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def uniform(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      (java.lang.Long.parseLong(hex, 16) + 1.0) / 16777217.0
    }
    val lens = graft.io.Tables.documents(spark, d)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = lens.toSeq
      .map { case (id, w) => (id, -math.log(uniform(id)) / math.max(w.toDouble, 1e-12)) }
      .sortBy { case (id, pri) => (pri, id) }.take(100).map(_._1).toSet
    val got = q("sample_weighted").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("sample_weighted API: scaling all weights preserves the sample") {
    val base = graft.io.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"))
    def ids(w: org.apache.spark.sql.Column) =
      graft.api.Sampling.sampleWeighted(base, col("doc_id"), w, 50)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(col("n_chars")) === ids(col("n_chars") * 7))
  }

  test("sample_per_group: at most k per group, contiguous ranks, deterministic") {
    val rows = q("sample_per_group").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.groupBy(_._2).foreach { case (lang, g) =>
      assert(g.length <= 20, s"lang $lang over quota")
      assert(g.map(_._3).sorted.toSeq === (1L to g.length).toSeq,
        s"lang $lang ranks not contiguous")
      val expected = math.min(20, docs.count(_._2 == lang))
      assert(g.length === expected, s"lang $lang quota size")
    }
    assert(q("sample_per_group").collect().map(_.getLong(0)).toSeq ===
      rows.map(_._1).toSeq, "rerun must be identical")
  }

  test("vocab_coverage_topp: selected prefix reaches 95% and is minimal") {
    val rows = q("vocab_coverage_topp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totals = docs.groupBy(_._2).map { case (lang, ds) =>
      lang -> ds.flatMap(_._3.split(" ", -1)).size.toLong
    }
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val tot = totals(lang)
      val last = g.maxBy(_._4)
      assert(last._5 * 100 >= tot * 95, s"lang $lang: coverage not reached")
      // minimality: dropping the last selected token falls below 95%
      assert((last._5 - last._3) * 100 < tot * 95, s"lang $lang: prefix not minimal")
      // the selection is a rank prefix
      assert(g.map(_._4).sorted.toSeq === (1L to g.length).toSeq,
        s"lang $lang: not a vrank prefix")
    }
  }

  test("quality_pipeline_e2e: thresholds hold and per-stream packing is contiguous") {
    val rows = q("quality_pipeline_e2e").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)))
    assert(rows.nonEmpty)
    assert(rows.length < docs.size, "the filter must actually drop documents")
    rows.foreach { case (id, _, _, ent, dup, lp, _, _, sf, sl) =>
      assert(ent >= 2500000L && dup <= 6500L && lp >= -35000L, s"doc $id kept wrongly")
      assert(sf <= sl, s"doc $id sequence range inverted")
    }
    // per language stream (in shuffle order) the token offsets are contiguous
    rows.groupBy(_._2).foreach { case (lang, g) =>
      val ordered = g.sortBy(_._7)
      var expectedStart = 0L
      ordered.foreach { case (id, _, nTok, _, _, _, _, start, _, _) =>
        assert(start === expectedStart, s"doc $id in $lang stream offset")
        expectedStart += nTok
      }
    }
    // shuffle positions are a permutation of 1..n
    assert(rows.map(_._7).sorted.toSeq === (1L to rows.length).toSeq)
  }

  test("text_entropy_score: bounds and exactness on a uniform-distribution doc") {
    val rows = q("text_entropy_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === docs.size)
    rows.foreach { case (id, nTok, nDist, entC) =>
      assert(nDist <= nTok)
      assert(entC >= 0L, s"doc $id negative entropy")
      // H ≤ ln(n_distinct); quantization subtracts < 1 per distinct token
      val maxEnt = math.floor(math.log(nDist.toDouble) * 1000000).toLong
      assert(entC <= maxEnt, s"doc $id entropy above ln(n_distinct)")
    }
    // exact check on a synthetic uniform doc: 4 distinct tokens, p=1/4 each
    import spark.implicits._
    val one = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val e = graft.api.Relevance.entropyScore(one, col("doc_id"), col("text"))
      .collect().head
    val term = math.floor(0.25 * math.log(0.25) * -1000000.0).toLong
    assert(e.getAs[Long]("ent_c") === 4 * term)
    assert(e.getAs[Long]("n_tok") === 4L && e.getAs[Long]("n_distinct") === 4L)
  }
}
