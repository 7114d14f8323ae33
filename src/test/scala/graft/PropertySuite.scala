package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.model.CloudEvent
import graft.udf.{JaccardTokens, LatestState, SeqId}

import scala.util.Random

/** Property-style tests (SURVEY §5.4) over seeded random feeds: compaction
  * algebra, at-least-once safety, codec laws, UDF ≡ native equivalence,
  * and read-model ≡ fold-left state machine. Deterministic seeds keep the
  * suite reproducible without a property-testing framework dependency.
  */
class PropertySuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def randomFeed(rnd: Random, n: Int, subjects: Int): Seq[CloudEvent] =
    (1L to n.toLong).map { i =>
      val subj = (rnd.nextInt(subjects) + 1).toString
      val del = rnd.nextDouble() < 0.15
      CloudEvent("1.0", SeqId.encodeFn(i, f"u$i%04d"), "t.example", "src",
        new java.sql.Timestamp(1600000000000L + i * 1000),
        Some(subj), Some(if (del) CloudEvent.DELETE else CloudEvent.PUT),
        Some("application/json"), if (del) None else Some(s"""{"v":$i}"""))
    }

  private def compactDf(feed: Seq[CloudEvent]) = {
    val w = Window.partitionBy("subject").orderBy(col("id").desc)
    feed.toDS().toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  test("compaction is idempotent: compact(compact(f)) == compact(f)") {
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val feed = randomFeed(rnd, 200, 20)
      val once = compactDf(feed).as[CloudEvent].collect().sortBy(_.id)
      val twice = compactDf(once.toIndexedSeq).as[CloudEvent].collect().sortBy(_.id)
      assert(once.toSeq === twice.toSeq)
    }
  }

  test("compaction keeps exactly one entry per subject, a member of the input") {
    val rnd = new Random(7)
    val feed = randomFeed(rnd, 300, 25)
    val out = compactDf(feed).as[CloudEvent].collect()
    assert(out.map(_.subject).distinct.length === out.length)
    val inputIds = feed.map(_.id).toSet
    assert(out.forall(e => inputIds(e.id)))
    assert(out.map(_.subject.get).toSet === feed.map(_.subject.get).toSet)
  }

  test("typed LatestState aggregator ≡ window compaction on random feeds") {
    val rnd = new Random(123)
    for (_ <- 1 to 3) {
      val feed = randomFeed(rnd, 250, 15)
      val viaWindow = compactDf(feed).as[CloudEvent].collect()
        .map(e => e.subject.get -> e.id).toMap
      val viaAgg = feed.toDS()
        .groupByKey(_.subject.getOrElse(""))
        .agg(LatestState.toColumn.name("state"))
        .collect().map { case (k, e) => k -> e.id }.toMap
      assert(viaAgg === viaWindow)
    }
  }

  test("at-least-once: replay(dedup(feed ∪ page)) == replay(feed) (README.md:113-114)") {
    val rnd = new Random(99)
    val feed = randomFeed(rnd, 200, 20)
    val page = feed.takeRight(50) // redelivered tail
    val deduped = (feed ++ page).toDS().dropDuplicates("id")
      .as[CloudEvent].collect().sortBy(_.id)
    assert(deduped.toSeq === feed.sortBy(_.id))
  }

  test("seq-id codec: roundtrip and order preservation (README.md:159)") {
    val rnd = new Random(5)
    val seqs = Seq.fill(200)(math.abs(rnd.nextLong()) % 10000000000000L).distinct
    seqs.foreach { s =>
      assert(SeqId.decodeFn(SeqId.encodeFn(s, "x-y")) === Some(s))
    }
    val sortedBySeq = seqs.sorted
    val sortedByString =
      seqs.map(s => SeqId.encodeFn(s, "z")).sorted.flatMap(SeqId.decodeFn(_))
    assert(sortedByString === sortedBySeq, "string order must equal numeric order")
  }

  test("native seq_id_decode expression ≡ UDF path, null on malformed") {
    graft.catalyst.GraftExtensions.install(spark)
    val rnd = new Random(202)
    val ids = Seq.fill(100)(math.abs(rnd.nextLong()) % 10000000000000L)
      .map(sq => SeqId.encodeFn(sq, "fixed-suffix"))
    val df = ids.toDF("id")
      .withColumn("viaNative", expr("seq_id_decode_native(id)"))
      .withColumn("viaUdf", SeqId.decodeUdf(col("id")))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("viaNative") === r.getAs[Long]("viaUdf"))
    }
    val bad = Seq(Some("no-separator"), Some("abc::x"), Some("::x"), Some(""),
        Some("99999999999999999999999::overflow"), None)
      .toDF("id")
    assert(bad.selectExpr("seq_id_decode_native(id) AS v")
      .collect().forall(_.isNullAt(0)))
    // registered UDF surface mirrors the native null-on-malformed contract
    assert(bad.select(SeqId.decodeUdf(col("id")).as("v"))
      .collect().forall(_.isNullAt(0)))
  }

  test("native kernels ≡ SQL formulations (bitset, shingles, vec folds)") {
    graft.catalyst.GraftExtensions.install(spark)
    val rnd = new Random(77)
    // bitset intersect count == array_intersect size on random 1-based id sets
    val idCases = Seq.fill(40)((
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(300) + 1).distinct,
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(300) + 1).distinct))
    val nWords = (300 + 63) / 64
    idCases.toDF("a", "b")
      .selectExpr(
        s"bitset_intersect_count(bitset_from_ids(a, $nWords), bitset_from_ids(b, $nWords)) AS viaBits",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS viaArr")
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // early-exit containment verify == plain popcount + threshold: exact
    // shared where |A∩B| ≥ ⌈0.8·|A|⌉, −1 everywhere else (the fused
    // kernel the dense dedup_containment path filters on)
    idCases.toDF("a", "b")
      .selectExpr(
        s"bitset_containment_shared(bitset_from_ids(a, $nWords), bitset_from_ids(b, $nWords), CAST(size(a) AS BIGINT)) AS fused",
        s"bitset_intersect_count(bitset_from_ids(a, $nWords), bitset_from_ids(b, $nWords)) AS shared",
        "CAST(size(a) AS BIGINT) AS n1")
      .collect().foreach { r =>
        val expect = if (r.getLong(1) * 5 >= r.getLong(2) * 4) r.getLong(1) else -1L
        assert(r.getLong(0) === expect)
      }
    // and on guaranteed-qualifying pairs (B ⊇ A): exact |A| comes back
    idCases.map { case (a, b) => (a, (a ++ b).distinct) }.toDF("a", "b")
      .selectExpr(
        s"bitset_containment_shared(bitset_from_ids(a, $nWords), bitset_from_ids(b, $nWords), CAST(size(a) AS BIGINT)) AS fused",
        "CAST(size(a) AS BIGINT) AS n1")
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // sorted two-pointer merge count == array_intersect size on the same
    // sets (cast to bigint, sorted at the call site per the contract)
    idCases.map { case (a, b) => (a.map(_.toLong), b.map(_.toLong)) }
      .toDF("a", "b")
      .selectExpr(
        "sorted_intersect_count(sort_array(a), sort_array(b)) AS viaMerge",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS viaArr")
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // ngram_shingles == array_distinct(transform(sequence(...), substr))
    val texts = Seq("", "ab", "abcde", "aaaaaaaa", "hello world hello world",
      "überstraße größe", Seq.fill(30)(s"w${rnd.nextInt(9)}").mkString(" "))
    texts.toDF("t")
      .selectExpr("ngram_shingles(t, 5) AS viaNative",
        "array_distinct(transform(sequence(1, greatest(length(t) - 4, 1)), i -> substr(t, i, 5))) AS viaSql")
      .collect().foreach { r =>
        assert(r.getSeq[String](0).sorted === r.getSeq[String](1).sorted)
      }
    // vec folds: ragged lengths and null elements yield NULL, exactly as
    // zip_with's null padding poisons the HOF fold
    val ragged = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(1.0f)))),          // ragged
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),    // null elem
      (None, Some(Seq(Some(1.0f))))                                        // null array
    ).toDF("a", "b")
    ragged.selectExpr("vec_dot(a, b) AS d", "vec_sqdist(a, b) AS s")
      .collect().foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
    // vec_dot / vec_sqdist == in-order HOF folds, bit-identical doubles
    val vecs = Seq.fill(25)((
      Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat())))
    vecs.toDF("a", "b")
      .selectExpr(
        "vec_dot(a, b) AS dN",
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, p) -> acc + p) AS dH",
        "vec_sqdist(a, b) AS sN",
        "aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0.0 AS DOUBLE), (acc, p) -> acc + p) AS sH")
      .collect().foreach { r =>
        assert(r.getDouble(0) === r.getDouble(1)) // exact: same op order
        assert(r.getDouble(2) === r.getDouble(3))
      }
    // bitset_from_tokens (map-literal encode) == bitset_from_ids ∘ dictionary
    val dictTokens = (1 to 100).map(i => s"tok$i")
    val dictMap = dictTokens.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val tokCases = Seq.fill(20)(
      Seq.fill(rnd.nextInt(30))(dictTokens(rnd.nextInt(100))).distinct)
    val tw = (100 + 63) / 64
    tokCases.toDF("tks")
      .withColumn("viaTok", call_function("bitset_from_tokens",
        col("tks"), typedLit(dictMap), lit(tw)))
      .withColumn("viaIds", call_function("bitset_from_ids",
        transform(col("tks"), t => element_at(typedLit(dictMap), t)), lit(tw)))
      .collect().foreach(r => assert(r.getSeq[Long](1) === r.getSeq[Long](2)))
  }

  test("jaccard UDF ≡ native HOF formulation ≡ set definition") {
    val rnd = new Random(11)
    val cases = Seq.fill(30) {
      val a = Seq.fill(rnd.nextInt(20))(s"w${rnd.nextInt(15)}")
      val b = Seq.fill(rnd.nextInt(20))(s"w${rnd.nextInt(15)}")
      (a, b)
    }
    val df = cases.toDF("a", "b")
      .withColumn("viaUdf", JaccardTokens.jaccardUdf(col("a"), col("b")))
      .withColumn("viaNative", JaccardTokens.jaccardNative(col("a"), col("b")))
    df.collect().zip(cases).foreach { case (r, (a, b)) =>
      val expected = {
        val (sa, sb) = (a.toSet, b.toSet)
        val u = (sa ++ sb).size
        if (u == 0) 0.0 else (sa & sb).size.toDouble / u
      }
      assert(math.abs(r.getAs[Double]("viaUdf") - expected) < 1e-12)
      assert(math.abs(r.getAs[Double]("viaNative") - expected) < 1e-12)
    }
  }

  test("read model ≡ fold-left of the per-event upsert/delete state machine") {
    val rnd = new Random(77)
    val feed = randomFeed(rnd, 300, 30)
    // engine: compaction ∘ tombstone-filter
    val engine = compactDf(feed).filter(col("method") =!= CloudEvent.DELETE)
      .as[CloudEvent].collect().map(e => e.subject.get -> e.id).toMap
    // reference state machine: fold events in id order
    val folded = feed.sortBy(_.id).foldLeft(Map.empty[String, CloudEvent]) { (st, e) =>
      if (e.method.contains(CloudEvent.DELETE)) st - e.subject.get
      else st + (e.subject.get -> e)
    }.map { case (k, e) => k -> e.id }
    assert(engine === folded)
  }

  test("read model parity holds for any prefix split (batch ≡ incremental)") {
    val rnd = new Random(31)
    val feed = randomFeed(rnd, 200, 12).sortBy(_.id)
    val full = compactDf(feed).filter(col("method") =!= CloudEvent.DELETE)
      .as[CloudEvent].collect().map(e => e.subject.get -> e.id).toMap
    for (cut <- Seq(0, 50, 100, 199)) {
      val (p1, p2) = feed.splitAt(cut)
      // incremental: compact prefix, then merge-compact the remainder
      val merged = compactDf(compactDf(p1).as[CloudEvent].collect().toIndexedSeq ++ p2)
        .filter(col("method") =!= CloudEvent.DELETE)
        .as[CloudEvent].collect().map(e => e.subject.get -> e.id).toMap
      assert(merged === full, s"prefix split at $cut diverged")
    }
  }

  test("typed multimodal stub pipeline ≡ relational formulation") {
    val docs = graft.io.Tables.documents(spark, TestSpark.sfDir)
    val typed = graft.udf.MultimodalStub.pipeline(docs)
      .collect().map(m => m.doc_id -> ((m.nbytes, m.fp, m.fake_w, m.fake_h, m.n_frames))).toMap
    val relational = graft.ops.Pipeline.queries("multimodal_decode_stub")(spark, TestSpark.sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nbytes"), r.getAs[String]("fp"), r.getAs[Long]("fake_w"),
          r.getAs[Long]("fake_h"), r.getAs[Long]("n_frames")))).toMap
    assert(typed === relational)
  }

  test("multimodal frame sampling: k = min(n,4) strictly-increasing indices inside the clip") {
    val rows = SparkEntry.queries("multimodal_frame_sample")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (doc, fs) =>
      val n = fs.head._2
      assert(fs.length == math.min(n, 4L), s"doc $doc frame count")
      val idx = fs.sortBy(_._3).map(_._4)
      assert(idx.forall(i => i >= 0 && i < n), s"doc $doc index out of clip")
      assert(idx.distinct.length == idx.length &&
        idx.sorted.sameElements(idx), s"doc $doc indices must strictly increase")
    }
    // resize preserves aspect in floor arithmetic and fits the box
    SparkEntry.queries("multimodal_resize_stub")(spark, TestSpark.sfDir)
      .collect().foreach { r =>
        val (w, h, nw, nh) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(nw <= 256 && nh <= 256 && math.max(nw, nh) == 256)
        assert(nw == w * 256 / math.max(w, h) && nh == h * 256 / math.max(w, h))
      }
  }

  test("join_asof_nearest ≡ driver-side nearest-click replay (ties backward)") {
    val out = SparkEntry.queries("join_asof_nearest")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    val ev = graft.io.Tables.events(spark, TestSpark.sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(_._2)
      s.zipWithIndex.collect { case ((_, eid, ts, "purchase"), i) =>
        val bk = s.take(i).reverse.find(_._4 == "click")
        val fw = s.drop(i + 1).find(_._4 == "click")
        val near = (bk, fw) match {
          case (None, None) => None
          case (Some(b), None) => Some((b._2, ts - b._3))
          case (None, Some(f)) => Some((f._2, f._3 - ts))
          case (Some(b), Some(f)) =>
            if (ts - b._3 <= f._3 - ts) Some((b._2, ts - b._3))
            else Some((f._2, f._3 - ts))
        }
        eid -> ((near.map(_._1), near.map(_._2)))
      }
    }.toMap
    assert(out === expected)
    out.values.flatMap(_._2).foreach(d => assert(d >= 0))
  }

  test("approx_count_distinct within 5% of exact per event_type (SURVEY §2.3)") {
    val ev = graft.io.Tables.events(spark, TestSpark.sfDir)
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type").agg(approx_count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k: approx $a vs exact $n")
    }
  }
}
