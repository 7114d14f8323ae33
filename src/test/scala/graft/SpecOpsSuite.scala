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
}
