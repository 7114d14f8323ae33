package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

/** Semantic checks for the §2.12 corpus-analysis & packing operators —
  * invariants the DuckDB hash-compare can't express (bounds, subset
  * relations vs brute force, stream-offset continuity), recomputed
  * independently in plain Scala over the sf0.001 fixtures.
  */
class CorpusOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def q(name: String) = CorpusOps.queries(name)(spark, d)

  private lazy val docs: Seq[(Long, String, String)] =
    graft.io.Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private lazy val embs: Map[Long, Array[Double]] =
    graft.io.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("pii_scrub: n_redacted equals the per-doc dictionary-token count") {
    val dict = Set("customer", "key", "value", "table")
    val expected = docs.map { case (id, _, text) =>
      id -> text.split(" ", -1).count(dict)
    }.toMap
    val got = q("pii_scrub").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, n) => assert(n === expected(id).toLong, s"doc $id") }
  }

  test("text_repetition_stats: counts match an independent recomputation") {
    val got = q("text_repetition_stats").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, _, text) =>
      val toks = text.split(" ", -1).toSeq
      val bigs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val (nTok, nDupTok, nDupBig) = got(id)
      assert(nTok === toks.size.toLong, s"doc $id n_tok")
      assert(nDupTok === (toks.size - toks.distinct.size).toLong, s"doc $id dup tok")
      assert(nDupBig === (bigs.size - bigs.distinct.size).toLong, s"doc $id dup bigram")
    }
  }

  test("text_dup_ngram_fraction ≡ brute-force cross-doc 3-gram sweep") {
    val grams: Seq[(Long, Set[String])] = docs.collect {
      case (id, _, text) if text.split(" ", -1).length >= 3 =>
        id -> text.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet
    }
    val df = grams.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expected = grams.map { case (id, gs) =>
      val nd = gs.count(g => df(g) >= 2).toLong
      (id, gs.size.toLong, nd, nd * 1000000L / gs.size)
    }.sortBy(_._1)
    val got = q("text_dup_ngram_fraction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // sanity: the metric actually discriminates on this corpus
    assert(got.exists(_._4 > 0) || df.values.forall(_ == 1))
  }

  test("text_rarity_score: sum_df ≥ n_tok and exact on a hand-checked doc") {
    val dfByTok = docs.flatMap { case (id, _, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (tk, xs) => tk -> xs.size.toLong }
    val rows = q("text_rarity_score").collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"doc ${r.getLong(0)}: sum_df < n_tok")
    }
    val (id0, _, text0) = docs.minBy(_._1)
    val expSum = text0.split(" ", -1).map(dfByTok).sum
    val got0 = rows.find(_.getLong(0) == id0).get
    assert(got0.getLong(2) === expSum)
  }

  test("seq_pack_chunk: per-lang stream offsets are contiguous from zero") {
    val rows = q("seq_pack_chunk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val ordered = rs.sortBy(_._1)
      var expectedStart = 0L
      ordered.foreach { case (id, _, nTok, start, seqFirst, seqLast) =>
        assert(start === expectedStart, s"$lang doc $id stream offset")
        assert(seqFirst === start / 128, s"$lang doc $id seq_first")
        assert(seqLast === (start + nTok - 1) / 128, s"$lang doc $id seq_last")
        assert(seqFirst <= seqLast)
        expectedStart += nTok
      }
    }
  }

  test("dedup_embedding_lsh: pairs are a subset of brute-force cosine ≥ 0.35, no duplicates") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = embs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if cos(embs(i), embs(j)) >= 0.35 - 1e-9
    } yield (i, j)).toSet
    val got = q("dedup_embedding_lsh").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length, "pair emitted at more than one band")
    got.foreach { p => assert(brute(p), s"LSH pair $p fails exact-cosine verify") }
    assert(got.nonEmpty, "LSH found no candidate pairs at all")
  }

  test("corpus_shuffle_order: a stable permutation matching the md5 sort") {
    val got = q("corpus_shuffle_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSeq.sorted === (1L to docs.size.toLong))
    val expected = docs.map(_._1).sortBy(id => (md5Hex(id.toString), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got === expected, "2-pass rank must equal the direct (md5, id) sort")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("map-only corpus API ops run unchanged on a stream (batch parity)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = docs.take(40).map { case (id, _, text) => (id, text) }
    val ms = MemoryStream[(Long, String)](spark)
    val streamed = graft.api.Corpus.repetitionStats(
      graft.api.Corpus.redact(ms.toDS().toDF("id", "body"),
        org.apache.spark.sql.functions.col("body"), "\\b(customer|key)\\b"),
      org.apache.spark.sql.functions.col("body"))
    val q = streamed.writeStream.format("memory")
      .queryName("corpus_stream_parity").outputMode("append").start()
    try {
      ms.addData(rows.take(15)); q.processAllAvailable()
      ms.addData(rows.drop(15)); q.processAllAvailable()
      val got = spark.table("corpus_stream_parity")
        .select("id", "n_redacted", "n_tok", "n_dup_tok")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val batch = graft.api.Corpus.repetitionStats(
        graft.api.Corpus.redact(rows.toDF("id", "body"),
          org.apache.spark.sql.functions.col("body"), "\\b(customer|key)\\b"),
        org.apache.spark.sql.functions.col("body"))
        .select("id", "n_redacted", "n_tok", "n_dup_tok")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === batch, "streamed results must equal the batch formulation")
      assert(got.size === 40)
    } finally q.stop()
  }

  test("vec_quantize_int8: quantized values bounded, checksums recompute") {
    val rows = q("vec_quantize_int8").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    embs.foreach { case (id, v) =>
      val mx = math.max(v.map(math.abs).max, 1e-12)
      val qs = v.map(x => math.floor(x * 127.0 / mx).toLong)
      assert(qs.forall(x => x >= -127L && x <= 127L), s"vec $id out of int8 range")
      val (_, sumQ, nSat) = rows(id)
      assert(sumQ === qs.sum, s"vec $id sum_q")
      assert(nSat === qs.count(x => math.abs(x) >= 127).toLong, s"vec $id n_sat")
    }
  }

  test("vec_pq_encode: codes valid, reconstruction error matches brute force") {
    val out = q("vec_pq_encode")
      .collect().map(r => r.getLong(0) ->
        (Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getLong(5))).toMap
    assert(out.size == embs.size)
    // brute-force recompute: per subspace the nearest vec_id<8 sub-centroid
    val cents = (0L until 8L).map(c => c -> embs(c)).toMap
    out.foreach { case (vid, (codes, errC)) =>
      assert(codes.forall(c => c >= 0 && c < 8))
      val v = embs(vid)
      var expErr = 0L
      (0 until 4).foreach { sub =>
        val vs = v.slice(sub * 16, sub * 16 + 16)
        val scored = cents.toSeq.map { case (cid, cv) =>
          val cs = cv.slice(sub * 16, sub * 16 + 16)
          val sq = vs.zip(cs).map { case (a, b) => (a - b) * (a - b) }.sum
          (sq, cid)
        }.sorted
        val (bestSq, bestCid) = scored.head
        assert(codes(sub) == bestCid,
          s"vec $vid sub $sub: code ${codes(sub)} != brute $bestCid")
        expErr += math.floor(bestSq * 10000.0).toLong
      }
      // driver float fold can differ in the last ulp per subspace term
      assert(math.abs(errC - expErr) <= 4, s"vec $vid err $errC vs $expErr")
    }
    // a codebook vector reconstructs itself exactly
    (0L until 8L).foreach(c => assert(out(c)._1 == Seq(c, c, c, c) && out(c)._2 == 0L))
  }

  test("text_span_dedup: counts match a brute-force span index") {
    val out = q("text_span_dedup")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: every 8-token span across the corpus
    val index = scala.collection.mutable.Map[String, Vector[Long]]()
    docs.foreach { case (id, _, text) =>
      val t = text.split(" ")
      (0 to t.length - 8).foreach { i =>
        val key = t.slice(i, i + 8).mkString(" ")
        index(key) = index.getOrElse(key, Vector.empty) :+ id
      }
    }
    val dup = index.values.filter(_.distinct.size >= 2)
    assert(out.length == math.min(200, dup.size))
    val expect = dup.map(occ =>
      (occ.size.toLong, occ.distinct.size.toLong, occ.min)).toSeq
    out.foreach { case (_, nOcc, nDocs, firstDoc) =>
      assert(nDocs >= 2 && nOcc >= nDocs)
      assert(expect.contains((nOcc, nDocs, firstDoc)),
        s"span row ($nOcc, $nDocs, $firstDoc) not in brute-force index")
    }
    // the top row really is a maximal-occurrence span
    if (out.nonEmpty) assert(out.head._2 == dup.map(_.size).max)
  }

  test("bpe_pair_stats: pair counts match a brute-force recount") {
    val out = q("bpe_pair_stats")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val wc = docs.flatMap(_._3.split(" ")).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }.filter(_._1.length >= 2)
    val pairs = scala.collection.mutable.Map[(String, String), Long]()
    wc.foreach { case (t, c) =>
      (0 until t.length - 1).foreach { i =>
        val k = (t.substring(i, i + 1), t.substring(i + 1, i + 2))
        pairs(k) = pairs.getOrElse(k, 0L) + c
      }
    }
    val expected = pairs.toSeq.map { case ((l, r), n) => (l, r, n) }
      .sortBy { case (l, r, n) => (-n, l, r) }.take(20)
    assert(out.toSeq == expected)
  }

  test("chunk_overlap_windows: chunks tile every token with stride-48 starts and 16-token overlap") {
    val chunks = SparkEntry.queries("chunk_overlap_windows")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTok = graft.io.Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..m consecutive; starts s=48*id all < n_tok
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      sorted.foreach { case (_, id, len) =>
        val s = 48 * id
        assert(s < n && len == math.min(64L, n - s))
      }
      // full coverage: last chunk reaches the final token
      val (_, lastId, lastLen) = sorted.last
      assert(48 * lastId + lastLen == n || lastLen == 64)
      assert(48 * sorted.last._2 + sorted.last._3 >= n)
    }
    assert(chunks.map(_._1).toSet == nTok.keySet, "every doc chunked")
  }
}
