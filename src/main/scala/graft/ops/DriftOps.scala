package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.33 drift detection, recommender metrics, price indexing & corpus
  * growth — the ML-ops dashboard around a production pipeline: feature
  * distribution drift between corpus vintages, catalog
  * coverage/personalization of the recommender output, a Laspeyres price
  * index between shipment eras, and the Heaps-law vocabulary growth
  * curve.
  *
  * Scale shapes (100 TB notes):
  *  - drift_l1_buckets: two conditional aggregates over the value-bounded
  *    feature-band relation; the total-L1 window runs over bands.
  *  - rec_coverage_metrics: all metrics are aggregates over the BOUNDED
  *    recommendation table (|panel|·3 rows) + the node count.
  *  - price_index_period: per-part period aggregates shuffle once on
  *    part; the era split joins in as a single-row min/max broadcast.
  *  - vocab_growth_heaps: the word→first-seen-doc relation is
  *    vocabulary-sized; per-decile token totals are conditional sums
  *    against a broadcast 10-row decile table.
  */
object DriftOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distribution drift between corpus vintages (even vs odd doc ids —
    // the baseline/current split a shadow deployment compares): per
    // length band, both counts, both integer-ppm shares, the band's
    // |Δppm|, and the total L1 drift carried alongside — all integer.
    "drift_l1_buckets" -> ((s, d) => {
      val bands = Tables.documents(s, d)
        .select(expr("n_chars div 50").as("band"),
          expr("doc_id % 2").as("vintage"))
        .groupBy("band")
        .agg(sum(when(col("vintage") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("vintage") === 1, 1L).otherwise(0L)).as("c1"))
      val w = Window.partitionBy()
      bands
        .withColumn("n0", sum("c0").over(w))
        .withColumn("n1", sum("c1").over(w))
        .withColumn("p0_ppm", expr("(c0 * 1000000) div n0"))
        .withColumn("p1_ppm", expr("(c1 * 1000000) div n1"))
        .withColumn("d_ppm", abs(col("p1_ppm") - col("p0_ppm")))
        .withColumn("l1_total_ppm", sum("d_ppm").over(w))
        .select("band", "c0", "c1", "p0_ppm", "p1_ppm", "d_ppm",
          "l1_total_ppm")
        .orderBy("band")
    }),

    // Embedding centroid shift between corpus vintages (even/odd
    // vec_id): per label, the squared distance between the two
    // vintages' centroids — per-dim means are floor-quantized integers
    // (canon coords, integer div by the vintage count), so the shift is
    // exact BIGINT end-to-end. The embedding-drift alarm of a retrieval
    // deployment.
    "emb_centroid_shift" -> ((s, d) => {
      val coords = Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          expr("vec_id % 2").as("vintage"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("vc",
          floor(col("v").cast("double") * 10000).cast("long"))
      // floor of the exact double ratio, NOT integer `div`: sums are
      // negative for negative coordinates and Spark's div truncates
      // toward zero where DuckDB's // floors — floor() agrees everywhere
      // (the products stay ≤ 5e10, exactly representable)
      val means = coords.groupBy("label", "pos", "vintage")
        .agg(sum("vc").as("sv"), count(lit(1)).as("n"))
        .withColumn("m", floor(col("sv").cast("double") * 10000.0 /
          col("n").cast("double")).cast("long"))
      val wide = means.groupBy("label", "pos")
        .agg(sum(when(col("vintage") === 0, col("m"))).as("me"),
          sum(when(col("vintage") === 1, col("m"))).as("mo"),
          max(when(col("vintage") === 0, col("n"))).as("ne"),
          max(when(col("vintage") === 1, col("n"))).as("no"))
      wide.groupBy("label")
        .agg(max("ne").as("n_even"), max("no").as("n_odd"),
          sum((col("me") - col("mo")) * (col("me") - col("mo")))
            .as("shift_sq"))
        .orderBy("label")
    }),

    // Recommender-output quality: catalog coverage (distinct recommended
    // parts / graph nodes, ppm) and personalization overlap (how many
    // source PAIRS share each recommended item: Σ_item C(k,2), scaled by
    // the total possible pairs C(S,2)·3 — lower = more personalized).
    // Composes graph_cn_recommend's bounded output.
    "rec_coverage_metrics" -> ((s, d) => {
      val recs = GraphOps.queries("graph_cn_recommend")(s, d)
        .select(col("src"), col("rec"))
      val nodes = GraphOps.adjacency(s, d)
        .agg(count(lit(1)).as("n_nodes"))
      val perItem = recs.groupBy("rec").agg(count(lit(1)).as("k"))
      val agg = perItem.agg(count(lit(1)).as("n_recs_distinct"),
        sum(expr("(k * (k - 1)) div 2")).as("shared_pairs"))
      val srcs = recs.agg(count_distinct(col("src")).as("n_sources"),
        count(lit(1)).as("n_rec_rows"))
      agg.crossJoin(broadcast(srcs)).crossJoin(broadcast(nodes))
        .withColumn("coverage_ppm",
          expr("(n_recs_distinct * 1000000) div n_nodes"))
        .withColumn("overlap_ppm", expr(
          "(shared_pairs * 1000000) div ((n_sources * (n_sources - 1)) div 2 * 3)"))
        .select("n_sources", "n_rec_rows", "n_recs_distinct",
          "coverage_ppm", "overlap_ppm")
    }),

    // Laspeyres price index between shipment eras: the era split is the
    // midpoint of the shipdate range; per part, era unit prices in cents
    // (integer div of canon price by quantity units) weighted by
    // BASE-era quantities — index_ppm = Σ p1·q0 · 1e6 div Σ p0·q0 over
    // parts present in both eras.
    "price_index_period" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
          .as("day"),
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice") * 100).cast("long").as("pc"))
      val bounds = li.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val eras = li.crossJoin(broadcast(bounds))
        .withColumn("era", when(col("day") < col("mid"), 0L).otherwise(1L))
        .groupBy("l_partkey", "era")
        .agg(sum("q").as("sq"), sum("pc").as("spc"))
        .withColumn("unit_c", expr("spc div sq"))
      val e0 = eras.filter(col("era") === 0)
        .select(col("l_partkey"), col("sq").as("q0"), col("unit_c").as("p0"))
      val e1 = eras.filter(col("era") === 1)
        .select(col("l_partkey"), col("unit_c").as("p1"))
      // p·q per part is exact BIGINT; the corpus-wide Σp·q sums and the
      // ppm scale-up run in DECIMAL(38,0) — cur·10⁶ passed int64 at the
      // sf1 sweep (Σ grows with the part count), and div on decimals
      // still yields the exact integral BIGINT quotient.
      e0.join(e1, "l_partkey")
        .agg(count(lit(1)).as("n_parts"),
          sum((col("p1") * col("q0")).cast("decimal(38,0)")).as("cur"),
          sum((col("p0") * col("q0")).cast("decimal(38,0)")).as("base"))
        .withColumn("index_ppm", expr("(cur * 1000000) div base"))
        .select("n_parts", "index_ppm")
    }),

    // Heaps-law vocabulary growth: for each doc-id decile bound, the
    // cumulative token count and the distinct vocabulary seen so far.
    // The word → first-seen-doc relation is vocabulary-sized; per-decile
    // totals are conditional sums against the broadcast decile table.
    "vocab_growth_heaps" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tks"))
      val firstSeen = docs
        .select(col("doc_id"), explode(col("tks")).as("w"))
        .groupBy("w").agg(min("doc_id").as("first_doc"))
      val bounds = docs.agg(max("doc_id").as("mx"))
      val deciles = bounds.select(explode(sequence(lit(1), lit(10)))
          .as("dec0"), col("mx"))
        .select(col("dec0").cast("long").as("decile"), col("mx"))
        .withColumn("bound", expr("(mx * decile) div 10"))
        .select("decile", "bound")
      val toks = docs.select(col("doc_id"),
          size(col("tks")).cast("long").as("nt"))
        .crossJoin(broadcast(deciles))
        .filter(col("doc_id") <= col("bound"))
        .groupBy("decile", "bound")
        .agg(sum("nt").as("n_tokens_cum"), count(lit(1)).as("n_docs"))
      val vocab = firstSeen.crossJoin(broadcast(deciles))
        .filter(col("first_doc") <= col("bound"))
        .groupBy(col("decile").as("dec2"))
        .agg(count(lit(1)).as("vocab_size"))
      toks.join(vocab, col("decile") === col("dec2"))
        .select("decile", "bound", "n_docs", "n_tokens_cum", "vocab_size")
        .orderBy("decile")
    })
  )

  def oracles: Map[String, String] = Map(
    "drift_l1_buckets" ->
      """WITH b AS (SELECT n_chars // 50 AS band,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c0,
        |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1
        |  FROM documents GROUP BY 1),
        |t AS (SELECT *, CAST(sum(c0) OVER () AS BIGINT) AS n0,
        |    CAST(sum(c1) OVER () AS BIGINT) AS n1 FROM b),
        |p AS (SELECT *, (c0 * 1000000) // n0 AS p0_ppm,
        |    (c1 * 1000000) // n1 AS p1_ppm FROM t),
        |q AS (SELECT *, abs(p1_ppm - p0_ppm) AS d_ppm FROM p)
        |SELECT band, c0, c1, p0_ppm, p1_ppm, d_ppm,
        |  CAST(sum(d_ppm) OVER () AS BIGINT) AS l1_total_ppm
        |FROM q ORDER BY band""".stripMargin,

    "emb_centroid_shift" ->
      """WITH c AS (SELECT CAST(label AS BIGINT) AS label,
        |    vec_id % 2 AS vintage, CAST(i - 1 AS BIGINT) AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS vc
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)),
        |m AS (SELECT label, pos, vintage,
        |    CAST(floor(CAST(sum(vc) AS DOUBLE) * 10000.0 /
        |      CAST(count(*) AS DOUBLE)) AS BIGINT) AS m,
        |    count(*) AS n
        |  FROM c GROUP BY 1, 2, 3),
        |w AS (SELECT label, pos,
        |    CAST(sum(CASE WHEN vintage = 0 THEN m END) AS BIGINT) AS me,
        |    CAST(sum(CASE WHEN vintage = 1 THEN m END) AS BIGINT) AS mo,
        |    CAST(max(CASE WHEN vintage = 0 THEN n END) AS BIGINT) AS ne,
        |    CAST(max(CASE WHEN vintage = 1 THEN n END) AS BIGINT) AS no
        |  FROM m GROUP BY 1, 2)
        |SELECT label, max(ne) AS n_even, max(no) AS n_odd,
        |  CAST(sum((me - mo) * (me - mo)) AS BIGINT) AS shift_sq
        |FROM w GROUP BY label ORDER BY label""".stripMargin,

    "rec_coverage_metrics" ->
      s"""WITH ${GraphOps.edgesSql},
        |wd AS (SELECT a.u AS src, b.v AS c FROM e a
        |  JOIN e b ON b.u = a.v
        |  WHERE a.u < 100 AND b.v <> a.u),
        |sc AS (SELECT src, c, count(*) AS cn FROM wd GROUP BY 1, 2),
        |nf AS (SELECT sc.* FROM sc LEFT JOIN e
        |    ON e.u = sc.src AND e.v = sc.c
        |  WHERE e.u IS NULL),
        |rnk AS (SELECT *, row_number() OVER (PARTITION BY src
        |    ORDER BY cn DESC, c) AS rk FROM nf),
        |recs AS (SELECT src, c AS rec FROM rnk WHERE rk <= 3),
        |pi AS (SELECT rec, count(*) AS k FROM recs GROUP BY 1),
        |ag AS (SELECT count(*) AS n_recs_distinct,
        |    CAST(sum((k * (k - 1)) // 2) AS BIGINT) AS shared_pairs FROM pi),
        |sr AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_sources,
        |    count(*) AS n_rec_rows FROM recs),
        |nd AS (SELECT count(*) AS n_nodes FROM (SELECT DISTINCT u FROM e))
        |SELECT sr.n_sources, sr.n_rec_rows, ag.n_recs_distinct,
        |  (ag.n_recs_distinct * 1000000) // nd.n_nodes AS coverage_ppm,
        |  (ag.shared_pairs * 1000000)
        |    // ((sr.n_sources * (sr.n_sources - 1)) // 2 * 3) AS overlap_ppm
        |FROM ag, sr, nd""".stripMargin,

    "price_index_period" ->
      """WITH li AS (SELECT l_partkey,
        |    epoch_us(l_shipdate) // 86400000000 AS day,
        |    CAST(floor(l_quantity) AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem),
        |m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM li),
        |er AS (SELECT l_partkey,
        |    CASE WHEN day < m.mid THEN 0 ELSE 1 END AS era,
        |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(pc) AS BIGINT) AS spc
        |  FROM li, m GROUP BY 1, 2),
        |u AS (SELECT *, spc // sq AS unit_c FROM er),
        |e0 AS (SELECT l_partkey, sq AS q0, unit_c AS p0 FROM u WHERE era = 0),
        |e1 AS (SELECT l_partkey, unit_c AS p1 FROM u WHERE era = 1),
        |j AS (SELECT e0.q0, e0.p0, e1.p1 FROM e0 JOIN e1 USING (l_partkey))
        |SELECT count(*) AS n_parts,
        |  CAST((sum(p1 * q0) * 1000000) // sum(p0 * q0) AS BIGINT)
        |    AS index_ppm
        |FROM j""".stripMargin,

    "vocab_growth_heaps" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS tks FROM documents),
        |fs AS (SELECT w, CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM (SELECT doc_id, unnest(tks) AS w FROM t) GROUP BY 1),
        |m AS (SELECT max(doc_id) AS mx FROM t),
        |dc AS (SELECT CAST(i AS BIGINT) AS decile, (m.mx * i) // 10 AS bound
        |  FROM m, unnest(generate_series(1, 10)) u(i)),
        |tk AS (SELECT dc.decile, dc.bound,
        |    CAST(sum(len(t.tks)) AS BIGINT) AS n_tokens_cum,
        |    count(*) AS n_docs
        |  FROM t JOIN dc ON t.doc_id <= dc.bound GROUP BY 1, 2),
        |vb AS (SELECT dc.decile, count(*) AS vocab_size
        |  FROM fs JOIN dc ON fs.first_doc <= dc.bound GROUP BY 1)
        |SELECT tk.decile, CAST(tk.bound AS BIGINT) AS bound, tk.n_docs,
        |  tk.n_tokens_cum, vb.vocab_size
        |FROM tk JOIN vb ON tk.decile = vb.decile
        |ORDER BY tk.decile""".stripMargin
  )
}
