package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AuditOps, CorpusOps, MiningOps, Pipeline, TrainOps}
import graft.io.Tables

/** Semantic invariants for §2.22 (AuditOps) on the sf0.001 fixture —
  * brute-force re-derivations of the audit aggregates (the DuckDB oracle
  * checks the same queries at sf0.01+).
  */
class AuditOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("dedup_source_overlap ≡ brute-force pair/source matrix") {
    val got = AuditOps.queries("dedup_source_overlap")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4).split(" ").toSet))
    val brute = (for {
      (id1, l1, c1, s1, t1) <- docs
      (id2, l2, c2, s2, t2) <- docs
      if id1 < id2 && l1 == l2 && math.abs(c1 - c2) <= 20
      shared = (t1 & t2).size
      if shared * 1.0 / (t1.size + t2.size - shared) >= 0.5
    } yield (if (s1 <= s2) (s1, s2) else (s2, s1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == brute)
    assert(got.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("dedup_keep_best: one kept doc per cluster, the longest member") {
    val rows = AuditOps.queries("dedup_keep_best")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // membership ground truth from the shipped CC over the same pairs
    val pairs = Pipeline.queries("dedup_ngram_jaccard")(spark, d)
      .select("d1", "d2")
    val cc = TrainOps.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = Tables.documents(spark, d).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byCluster = cc.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    assert(rows.map(_._1).toSet == byCluster.keySet)
    rows.foreach { case (rep, nMembers, kept, keptChars) =>
      val members = byCluster(rep)
      assert(nMembers == members.size.toLong)
      val maxChars = members.map(chars).max
      assert(keptChars == maxChars)
      assert(kept == members.filter(chars(_) == maxChars).min,
        s"cluster $rep must keep the smallest-id longest member")
    }
  }

  test("dedup_survivorship_report ≡ composition of cluster-cc + keep-best + docs") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val cc = SparkEntry.queries("dedup_cluster_cc")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc -> cluster_rep
    val keptDocs = SparkEntry.queries("dedup_keep_best")(spark, d).collect()
      .map(_.getAs[Long]("kept_doc")).toSet
    val expected = docs.toSeq.groupBy(_._2._1).map { case (src, ds) =>
      val n = ds.size.toLong
      val clustered = ds.count { case (id, _) => cc.contains(id) }.toLong
      val kept = ds.filter { case (id, _) => !cc.contains(id) || keptDocs(id) }
      val charsTotal = ds.map(_._2._2).sum
      val charsKept = kept.map(_._2._2).sum
      src -> (n, clustered, kept.size.toLong,
        charsKept * 1000000L / charsTotal)
    }
    val got = AuditOps.queries("dedup_survivorship_report")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === docs.size.toLong)
  }

  test("ts_seasonal_profile: per-type ppm sums to ~1e6 and counts sum to events") {
    val rows = AuditOps.queries("ts_seasonal_profile")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, hod, _, _) => hod >= 0 && hod <= 23 })
    val total = Tables.events(spark, d).count()
    assert(rows.map(_._3).sum == total)
    // floor-division ppm: each type's shares sum to 1e6 minus < 24 units
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val s = rs.map(_._4).sum
      assert(s > 1000000L - 24 && s <= 1000000L, s"type $t ppm sum $s")
    }
  }

  test("corpus_health_report ≡ its four component operators joined on source") {
    import org.apache.spark.sql.functions._
    val got = AuditOps.queries("corpus_health_report")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap

    // survivorship columns must be byte-identical to the standalone op
    val surv = AuditOps.queries("dedup_survivorship_report")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === surv.keySet)
    got.foreach { case (src, (nd, nc, nk, ck, _, _, _)) =>
      assert((nd, nc, nk, ck) === surv(src), s"survivorship columns: $src")
    }

    // funnel pass ppm ≡ the standalone funnel's
    val fun = MiningOps.queries("curation_funnel_report")(spark, d)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("pass_ppm")).toMap
    got.foreach { case (src, g) => assert(g._5 === fun(src), s"funnel: $src") }

    // dup-3-gram mass ≡ the per-doc operator rolled up by source
    val srcOf = Tables.documents(spark, d).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupDoc = CorpusOps.queries("text_dup_ngram_fraction")(spark, d)
      .collect().map(r => (srcOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val dupWant = dupDoc.groupBy(_._1).map { case (src, rs) =>
      src -> rs.map(_._3).sum * 1000000L / math.max(rs.map(_._2).sum, 1L) }
    got.foreach { case (src, g) =>
      assert(g._6 === dupWant.getOrElse(src, 0L), s"dup mass: $src") }

    // length drift ≡ brute-force per-source vintage L1 over n_chars bands
    val docs = Tables.documents(spark, d)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val driftWant = docs.groupBy(_._2).map { case (src, ds) =>
      val t0 = math.max(ds.count(_._1 % 2 == 0).toLong, 1L)
      val t1 = math.max(ds.count(_._1 % 2 == 1).toLong, 1L)
      src -> ds.groupBy(_._3 / 50).map { case (_, b) =>
        math.abs(b.count(_._1 % 2 == 1) * 1000000L / t1 -
          b.count(_._1 % 2 == 0) * 1000000L / t0)
      }.sum
    }
    got.foreach { case (src, g) =>
      assert(g._7 === driftWant(src), s"drift: $src") }
  }
}
