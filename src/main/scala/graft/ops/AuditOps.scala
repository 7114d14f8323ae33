package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** §2.23 corpus-audit operators: the governance questions a training-data
  * owner asks AFTER dedup/quality machinery exists — which sources
  * contaminate each other, which duplicate to keep, and what the corpus'
  * temporal shape is. All oracle-checked, all integer-exact.
  *
  * Scale shapes (100 TB notes):
  *  - source overlap: reuses the adaptive near-dup pair kernel
  *    (Curation.nearDupPairs — bitset verify or All-Pairs/PPJoin); the
  *    matrix aggregate runs over PAIRS (already ≪ corpus) keyed by a
  *    source-pair key whose cardinality is |sources|²;
  *  - keep-best: connected components over the pair graph
  *    (TrainOps.connectedComponents — driver union-find when the pair
  *    graph is bounded, hook+compress rounds otherwise), then ONE
  *    max(struct) aggregate per cluster — never a window over the corpus;
  *  - seasonal profile: map-side (type, hour) partial aggregation; the
  *    ppm share window runs over the |types|×24 aggregate, not events.
  */
object AuditOps {

  /** Near-dup pairs (exact Jaccard ≥ 0.5, same language, |Δchars| ≤ 20)
    * with both docs' sources attached — the text_dedup_near contract,
    * reused so the audit agrees with the dedup pass it audits. */
  private def sourcedPairs(s: SparkSession, d: String): DataFrame = {
    val docsT = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        array_distinct(split(col("text"), " ")).as("tks"))
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    graft.api.Curation.nearDupPairs(docsT, col("doc_id"), col("tks"),
        col("lang"), col("n_chars"), tau = 0.5)
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-source contamination matrix: near-dup pairs bucketed by
    // UNORDERED source pair (least/greatest canonicalizes, so a↔b and
    // b↔a land in one cell). The diagonal (src_a = src_b) is
    // within-source duplication; off-diagonal cells are the
    // "my web scrape duplicates my books corpus" signal that decides
    // which source a curator drops.
    "dedup_source_overlap" -> ((s, d) =>
      sourcedPairs(s, d)
        .select(least(col("s1"), col("s2")).as("src_a"),
          greatest(col("s1"), col("s2")).as("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy("src_a", "src_b")),

    // Keep-best dedup decision: connected components over the strict
    // (Jaccard ≥ 0.7) n-gram duplicate graph — the dedup_cluster_cc
    // contract — then per cluster keep the LONGEST member (most complete
    // duplicate), ties to the smallest doc_id. One max(struct) aggregate:
    // (n_chars, -doc_id) is (longest, then smallest id) lexicographically.
    // The cluster labeling comes from the session-shared
    // TrainOps.strictDedupLabels cache (one pair-kernel + CC build for
    // the whole curation-report family).
    "dedup_keep_best" -> ((s, d) =>
      keepBest(s, d, TrainOps.strictDedupLabels(s, d))),

    // ALGORITHMIC twin of dedup_keep_best: same decision relation with
    // BOTH embedded stages swapped for their at-scale alternates — pair
    // generation through the forced All-Pairs prefix path
    // (dedup_ngram_jaccard_prefix) and clustering through the forced
    // distributed hook+compress CC rounds (driverLimit = 0). Twin digest
    // equality covers the composition end to end; at sf1 it is this
    // key's direct differential evidence (the recursive-CTE DuckDB
    // oracle blows the per-key budget there). Verification-only.
    "dedup_keep_best_dist" -> ((s, d) => {
      val pairs = Pipeline.queries("dedup_ngram_jaccard_prefix")(s, d)
        .select(col("d1"), col("d2")).localCheckpoint()
      keepBest(s, d, TrainOps.connectedComponents(pairs, driverLimit = 0))
    }),

    // Dedup survivorship report: what keep-best dedup DOES to each
    // source — docs total, docs caught in a duplicate cluster, docs
    // surviving (cluster winners + untouched singletons), and the ppm of
    // characters retained. The decision input every curator reads before
    // committing a dedup pass ("does this gut my books corpus?").
    // Composes the same pair kernel + CC + keep-best aggregate as
    // dedup_keep_best, then ONE source-keyed rollup; the char ppm is
    // computed decimal-first (Σchars·10⁶ wraps int64 past ~9·10¹²
    // chars/source — the corr_spearman sf1 lesson applied proactively).
    // Cluster labeling from the shared TrainOps.strictDedupLabels cache.
    "dedup_survivorship_report" -> ((s, d) =>
      survivorship(s, d, TrainOps.strictDedupLabels(s, d))),

    // ALGORITHMIC twin of dedup_survivorship_report (the keep_best_dist
    // pattern): prefix-path pairs + forced distributed CC. Twin digest
    // equality is the key's direct sf1 evidence — its recursive-CTE
    // oracle inherits dedup_keep_best's sf1 DuckDB-budget ceiling.
    // Verification-only.
    "dedup_survivorship_dist" -> ((s, d) => {
      val pairs = Pipeline.queries("dedup_ngram_jaccard_prefix")(s, d)
        .select(col("d1"), col("d2")).localCheckpoint()
      survivorship(s, d, TrainOps.connectedComponents(pairs, driverLimit = 0))
    }),

    // Hour-of-day activity profile per event type with integer-ppm share
    // — the corpus' temporal shape (UTC hours; ts_us is epoch micros).
    // The share window runs over the |types|×24 aggregate, never events.
    "ts_seasonal_profile" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("hod", expr("(ts_us div 3600000000) % 24"))
        .groupBy("event_type", "hod").agg(count(lit(1)).as("n"))
        .withColumn("ppm", expr(
          "(n * 1000000) div sum(n) over (partition by event_type)"))
        .orderBy("event_type", "hod")),

    // The composed per-source "corpus health" dashboard a data curator
    // actually runs: survivorship (dedup keep-best outcome), curation
    // funnel pass rate, duplicated 3-gram mass, and the even/odd-vintage
    // length-distribution L1 drift — one row per source, each column
    // the exact metric of the operator it reuses (survivorship /
    // curation_funnel_report / text_dup_ngram_fraction rolled up /
    // drift_l1_buckets partitioned by source).
    // Cluster labeling from the shared TrainOps.strictDedupLabels cache.
    "corpus_health_report" -> ((s, d) =>
      corpusHealth(s, d, TrainOps.strictDedupLabels(s, d))),

    // ALGORITHMIC twin of corpus_health_report (the survivorship-twin
    // pattern applied to the composition): prefix-path pairs + forced
    // distributed CC. Twin digest equality is the key's direct sf1
    // evidence — its recursive-CTE oracle inherits dedup_keep_best's
    // sf1 DuckDB-budget ceiling. Verification-only.
    "corpus_health_dist" -> ((s, d) => {
      val pairs = Pipeline.queries("dedup_ngram_jaccard_prefix")(s, d)
        .select(col("d1"), col("d2")).localCheckpoint()
      corpusHealth(s, d, TrainOps.connectedComponents(pairs, driverLimit = 0))
    })
  )

  /** One row per source: survivorship columns + funnel pass ppm + rolled
    * up duplicate-3-gram ppm + per-source vintage length-drift L1. Each
    * aggregate is per-source partitioned (the drift window runs over the
    * (source, band) histogram); all ppm math is integer, the duplicate
    * mass sum DECIMAL(38,0)-promoted before its ×1e6. */
  private def corpusHealth(s: SparkSession, d: String, cc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val surv = survivorship(s, d, cc)
    val fun = MiningOps.queries("curation_funnel_report")(s, d)
      .select(col("source"), col("pass_ppm"))
    val docsSrc = Tables.documents(s, d).select(col("doc_id"), col("source"))
    // a source whose every doc has <3 tokens emits no 3-grams: it drops
    // out of the rollup and the left join below reports dup_ppm = 0
    val dup = CorpusOps.queries("text_dup_ngram_fraction")(s, d)
      .join(docsSrc, "doc_id")
      .groupBy("source")
      .agg(sum("n_grams").as("sg"), sum("n_dup").as("sd"))
      .select(col("source"),
        expr("(CAST(sd AS DECIMAL(38,0)) * 1000000) div greatest(sg, 1)")
          .as("dup_ppm"))
    val wS = Window.partitionBy("source")
    val drift = Tables.documents(s, d)
      .select(col("source"), expr("n_chars div 50").as("band"),
        expr("doc_id % 2").as("vin"))
      .groupBy("source", "band")
      .agg(sum(when(col("vin") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("vin") === 1, 1L).otherwise(0L)).as("c1"))
      .withColumn("t0", sum("c0").over(wS))
      .withColumn("t1", sum("c1").over(wS))
      .withColumn("d_ppm", abs(expr("(c1 * 1000000) div greatest(t1, 1)") -
        expr("(c0 * 1000000) div greatest(t0, 1)")))
      .groupBy("source").agg(sum("d_ppm").as("len_l1_ppm"))
    surv.join(fun, Seq("source"))
      .join(dup, Seq("source"), "left")
      .join(drift, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_clustered"), col("n_kept"),
        col("chars_kept_ppm"), col("pass_ppm"),
        coalesce(col("dup_ppm"), lit(0L)).as("dup_ppm"), col("len_l1_ppm"))
      .orderBy("source")
  }

  /** Per-source survivorship rollup over a (node, cluster_rep) labeling:
    * keep-best winners + untouched singletons survive; char ppm
    * decimal-first. Shared by the primary and its twin. */
  private def survivorship(s: SparkSession, d: String, cc: DataFrame): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val kept = cc
      .join(docs.select(col("doc_id").as("node"), col("n_chars")), "node")
      .groupBy("cluster_rep")
      .agg(max(struct(col("n_chars").cast("long").as("a"),
        (-col("node")).as("b"))).as("m"))
      .select((-col("m.b")).as("doc_id"), lit(1).as("is_rep"))
    docs
      .join(cc.select(col("node").as("doc_id"), lit(1).as("inc")),
        Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("source"), col("n_chars"),
        when(col("inc").isNotNull, 1L).otherwise(0L).as("in_cluster"),
        when(col("inc").isNull || col("is_rep").isNotNull, 1L)
          .otherwise(0L).as("kept"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("in_cluster").as("n_clustered"),
        sum("kept").as("n_kept"),
        sum(col("n_chars")).as("chars_total"),
        sum(when(col("kept") === 1L, col("n_chars")).otherwise(0L))
          .as("chars_kept"))
      .select(col("source"), col("n_docs"), col("n_clustered"),
        col("n_kept"),
        expr("(CAST(chars_kept AS DECIMAL(38,0)) * 1000000) div chars_total")
          .as("chars_kept_ppm"))
      .orderBy("source")
  }

  /** Keep-best decision over a (node, cluster_rep) labeling: per cluster
    * the member count and the longest member (ties to smallest doc_id) —
    * one max(struct) aggregate, shared by the primary and its twin. */
  private def keepBest(s: SparkSession, d: String, cc: DataFrame): DataFrame = {
    val chars = Tables.documents(s, d)
      .select(col("doc_id").as("node"), col("n_chars"))
    cc.join(chars, "node")
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars").cast("long").as("a"),
          (-col("node")).as("b"))).as("m"))
      .select(col("cluster_rep"), col("n_members"),
        (-col("m.b")).as("kept_doc"), col("m.a").as("kept_chars"))
      .orderBy("cluster_rep")
  }

  def oracles: Map[String, String] = Map(
    "dedup_source_overlap" ->
      """WITH tok AS (SELECT DISTINCT doc_id, lang, n_chars,
        |    unnest(str_split(text, ' ')) AS tk FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS ntk FROM tok GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |  FROM tok a JOIN tok b ON a.tk = b.tk AND a.lang = b.lang
        |    AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
        |  GROUP BY 1, 2),
        |nd AS (SELECT d1, d2 FROM pair
        |  JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id
        |  WHERE shared * 1.0 / (ca.ntk + cb.ntk - shared) >= 0.5)
        |SELECT least(da.source, db.source) AS src_a,
        |  greatest(da.source, db.source) AS src_b, count(*) AS n_pairs
        |FROM nd JOIN documents da ON nd.d1 = da.doc_id
        |  JOIN documents db ON nd.d2 = db.doc_id
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    "dedup_keep_best" -> keepBestSql,
    // algorithmic twin: identical semantics, identical oracle
    "dedup_keep_best_dist" -> keepBestSql,

    "dedup_survivorship_report" -> survivorshipSql,
    // algorithmic twin: identical semantics, identical oracle
    "dedup_survivorship_dist" -> survivorshipSql,

    "corpus_health_report" -> corpusHealthSql,
    // algorithmic twin: identical semantics, identical oracle
    "corpus_health_dist" -> corpusHealthSql,
  ) ++ oraclesTail

  /** survivorshipSql's cluster labeling + the funnel / dup-3-gram /
    * length-drift rollups, joined per source. */
  private lazy val corpusHealthSql: String =
      survivorshipSql.replaceFirst(
        """(?s)SELECT source, count\(\*\) AS n_docs,.*$""",
        "") +
      """, sv AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(in_cluster) AS BIGINT) AS n_clustered,
        |    CAST(sum(kept) AS BIGINT) AS n_kept,
        |    CAST(CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS HUGEINT)
        |      * 1000000 // sum(n_chars) AS BIGINT) AS chars_kept_ppm
        |  FROM lab GROUP BY source),
        |fn AS (SELECT source,
        |    CAST((sum(CASE WHEN lang = 'en' AND n_chars BETWEEN 200 AND 5000
        |        AND len(str_split(text, ' ')) BETWEEN 40 AND 1000
        |      THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS pass_ppm
        |  FROM documents GROUP BY source),
        |t3 AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        |g3 AS (SELECT doc_id, list_distinct(list_transform(
        |        generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs3
        |      FROM t3 WHERE len(toks) >= 3),
        |u3 AS (SELECT doc_id, unnest(gs3) AS g FROM g3),
        |df3 AS (SELECT g, count(*) AS df FROM u3 GROUP BY g),
        |pd AS (SELECT u3.doc_id, count(*) AS n_grams,
        |        sum(CASE WHEN df3.df >= 2 THEN 1 ELSE 0 END) AS n_dup
        |      FROM u3 JOIN df3 USING (g) GROUP BY 1),
        |du AS (SELECT d.source,
        |    CAST((CAST(sum(pd.n_dup) AS HUGEINT) * 1000000)
        |      // greatest(sum(pd.n_grams), 1) AS BIGINT) AS dup_ppm
        |  FROM pd JOIN documents d USING (doc_id) GROUP BY 1),
        |db AS (SELECT source, n_chars // 50 AS band,
        |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM documents GROUP BY 1, 2),
        |dw AS (SELECT source, band, c0, c1,
        |    sum(c0) OVER (PARTITION BY source) AS t0,
        |    sum(c1) OVER (PARTITION BY source) AS t1 FROM db),
        |dr AS (SELECT source, CAST(sum(abs(
        |      (c1 * 1000000) // greatest(t1, 1)
        |      - (c0 * 1000000) // greatest(t0, 1))) AS BIGINT) AS len_l1_ppm
        |  FROM dw GROUP BY source)
        |SELECT sv.source, sv.n_docs, sv.n_clustered, sv.n_kept,
        |  sv.chars_kept_ppm, fn.pass_ppm,
        |  coalesce(du.dup_ppm, 0) AS dup_ppm, dr.len_l1_ppm
        |FROM sv JOIN fn USING (source) LEFT JOIN du USING (source)
        |  JOIN dr USING (source)
        |ORDER BY sv.source""".stripMargin

  // Pair stage through the shared bitset-verified near-dup relation
  // (graft.api.OracleSql) — round-13 swap of the brute-force
  // list_intersect self-join; digest-equal at sf0.01/sf0.1.
  private lazy val survivorshipSql: String =
      s"""WITH RECURSIVE ${graft.api.OracleSql.shingleJaccardPairs()},
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |r(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM r JOIN edges e ON r.node = e.src),
        |cc AS MATERIALIZED (SELECT node, min(lbl) AS cluster_rep FROM r GROUP BY node),
        |j AS MATERIALIZED (SELECT cc.cluster_rep, cc.node, d.n_chars
        |      FROM cc JOIN documents d ON cc.node = d.doc_id),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_rep
        |         ORDER BY n_chars DESC, node) AS rn FROM j),
        |lab AS (SELECT d.doc_id, d.source, d.n_chars,
        |    CASE WHEN cc.node IS NULL THEN 0 ELSE 1 END AS in_cluster,
        |    CASE WHEN cc.node IS NULL OR rk1.node IS NOT NULL
        |      THEN 1 ELSE 0 END AS kept
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
        |  LEFT JOIN (SELECT node FROM rk WHERE rn = 1) rk1
        |    ON d.doc_id = rk1.node)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(in_cluster) AS BIGINT) AS n_clustered,
        |  CAST(sum(kept) AS BIGINT) AS n_kept,
        |  CAST(CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS HUGEINT)
        |    * 1000000 // sum(n_chars) AS BIGINT) AS chars_kept_ppm
        |FROM lab GROUP BY source ORDER BY source""".stripMargin

  private lazy val oraclesTail: Map[String, String] = Map(
    "ts_seasonal_profile" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_us(ts) // 3600000000) % 24 AS hod FROM events),
        |g AS (SELECT event_type, hod, count(*) AS n FROM e GROUP BY 1, 2)
        |SELECT event_type, CAST(hod AS BIGINT) AS hod, n,
        |  CAST((n * 1000000) // sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS ppm
        |FROM g ORDER BY event_type, hod""".stripMargin
  )

  // Same shared bitset pair stage as survivorshipSql (round 13).
  private lazy val keepBestSql: String =
      s"""WITH RECURSIVE ${graft.api.OracleSql.shingleJaccardPairs()},
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |r(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM r JOIN edges e ON r.node = e.src),
        |cc AS MATERIALIZED (SELECT node, min(lbl) AS cluster_rep FROM r GROUP BY node),
        |j AS MATERIALIZED (SELECT cc.cluster_rep, cc.node, d.n_chars
        |      FROM cc JOIN documents d ON cc.node = d.doc_id),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_rep
        |         ORDER BY n_chars DESC, node) AS rn FROM j),
        |agg AS (SELECT cluster_rep, count(*) AS n_members FROM j GROUP BY 1)
        |SELECT agg.cluster_rep, agg.n_members, rk.node AS kept_doc,
        |  CAST(rk.n_chars AS BIGINT) AS kept_chars
        |FROM agg JOIN rk ON agg.cluster_rep = rk.cluster_rep AND rk.rn = 1
        |ORDER BY agg.cluster_rep""".stripMargin
}
