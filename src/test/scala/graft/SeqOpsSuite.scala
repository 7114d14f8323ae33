package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SeqOps
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for §2.27 (SeqOps) on the sf0.001 fixture —
  * brute-force re-derivations in plain Scala (the DuckDB oracle checks
  * the same queries at sf0.01+).
  */
class SeqOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val docs: Array[Array[String]] =
    Tables.documents(spark, d).select("text").collect()
      .map(_.getString(0).split(" ")).filter(_.length >= 2)

  test("lm_kneser_ney ≡ brute-force interpolated KN, probs in (0,1]") {
    val rows = SeqOps.queries("lm_kneser_ney")(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.length == 50)
    val bi = docs.flatMap(t => t.sliding(2).collect { case Array(a, b) => (a, b) })
    val cBi = bi.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw1 = cBi.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val n1f = cBi.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = cBi.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tTypes = cBi.size.toLong
    rows.foreach { case ((w1, w2), (c, pknC)) =>
      assert(c == cBi((w1, w2)))
      val p = (c.toDouble - 0.75) / cw1(w1).toDouble +
        (0.75 * n1f(w1).toDouble / cw1(w1).toDouble) *
          (n1b(w2).toDouble / tTypes.toDouble)
      assert(pknC == math.floor(p * 1000000).toLong, s"($w1,$w2)")
      assert(pknC > 0 && pknC <= 1000000)
    }
    // per-w1 probability mass over observed bigrams stays below 1
    // (the discount reserves mass for unseen continuations)
    val massByW1 = cBi.keys.toSeq.groupBy(_._1).map { case (w1, pairs) =>
      w1 -> pairs.map { case (a, b) =>
        (cBi((a, b)).toDouble - 0.75) / cw1(w1) +
          (0.75 * n1f(w1) / cw1(w1)) * (n1b(b).toDouble / tTypes)
      }.sum
    }
    massByW1.values.foreach(m => assert(m > 0 && m <= 1.0 + 1e-9))
  }

  test("lm_greedy_decode: decodes the brute-force chain; empty corpus decodes to zero rows") {
    import spark.implicits._
    // full-fixture parity with a plain-Scala greedy walk
    val got = SeqOps.queries("lm_greedy_decode")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val bi = docs.flatMap(t => t.sliding(2).collect { case Array(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byHead = bi.toSeq.groupBy(_._1._1).map { case (w1, ps) =>
      val best = ps.map { case ((_, w2), c) => (w2, c) }.minBy { case (w2, c) => (-c, w2) }
      w1 -> (ps.map(_._2).sum, best._1, best._2)
    }
    val first = byHead.toSeq.minBy { case (w1, (cu, _, _)) => (-cu, w1) }
    var expected = Seq((1L, first._1, first._2._1))
    var cur = first._1
    var halted = false
    for (step <- 2 to 8 if !halted) byHead.get(cur) match {
      case None => halted = true
      case Some((_, nxt, c)) => cur = nxt; expected :+= ((step.toLong, cur, c))
    }
    assert(got === expected)
    // EMPTY corpus (no doc with >= 2 tokens): the oracle's LIMIT 1 over an
    // empty bigram relation is zero rows — the declarative chain must not
    // emit the all-NULL global-aggregate row
    val tmp = java.nio.file.Files.createTempDirectory("graft_empty_docs").toString
    try {
      Seq((1L, "one", "en", "syn", 3L), (2L, "x", "en", "syn", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      assert(SeqOps.queries("lm_greedy_decode")(spark, tmp).count() === 0L)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("win_running_distinct ≡ brute-force per-user scan") {
    val rows = SeqOps.queries("win_running_distinct")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val ev = Tables.events(spark, d)
      .select("event_id", "user_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.length == ev.length)
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(e => (e._4, e._1))
      val seen = scala.collection.mutable.Set[String]()
      sorted.map { e => seen += e._3; (e._1, seen.size.toLong) }.toSeq
    }.toMap
    rows.foreach { case (id, (_, n)) => assert(n == expected(id), s"event $id") }
  }

  test("ts_ewma: integer smoother ≡ brute-force weighted window") {
    val rows = SeqOps.queries("ts_ewma")(spark, d).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, g) =>
      val series = g.sortBy(_._2)
      series.indices.drop(15).foreach { t =>
        val i = (0 to 15).map(k => series(t - k)._3 * (1L << (15 - k))).sum
        val (x, ewmaC) = rows((tpe, series(t)._2))
        assert(x == series(t)._3)
        assert(ewmaC == i * 10000L / 65535L, s"$tpe day ${series(t)._2}")
      }
      // rows without a full 16-day history must be absent
      series.indices.take(15).foreach { t =>
        assert(!rows.contains((tpe, series(t)._2)))
      }
    }
  }

  test("text_compression_proxy: ratios bounded, distinct counts exact") {
    val rows = SeqOps.queries("text_compression_proxy")(spark, d).collect()
    val byId = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
      .filter(_._2.length >= 2).toMap
    assert(rows.length == byId.size)
    rows.foreach { r =>
      val t = byId(r.getLong(0))
      assert(r.getLong(1) == t.length)
      assert(r.getLong(2) == t.distinct.length)
      assert(r.getLong(3) == t.sliding(2).map(_.mkString(" ")).toSeq.distinct.length)
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(1))
      assert(r.getLong(5) == r.getLong(3) * 1000000L / (r.getLong(1) - 1))
    }
  }
}
