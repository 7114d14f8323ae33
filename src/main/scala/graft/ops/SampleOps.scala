package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Relevance, Sampling}
import graft.io.Tables
import graft.io.Tables.canon

/** §2.14 sampling, vocabulary & information operators — the deterministic
  * selection stages of a pretraining pipeline: weighted reservoir
  * sampling, per-group quotas, coverage-based vocabulary truncation, and
  * a unigram-entropy quality feature. All oracle-checked; every
  * pseudo-random ingredient is an md5-derived uniform (pure
  * ascii-arithmetic hex decode — engine-portable, no `conv`), and every
  * float term is floor-quantized before integer summation or compared
  * via all-integer inequalities.
  *
  * Scale shapes:
  *  - weighted sampling: map-only priority + global top-k
  *    (`TakeOrderedAndProject`); the data is never globally sorted;
  *  - per-group quotas / coverage: windows partitioned by the group, over
  *    group-sized or VOCABULARY-sized relations — never instances;
  *  - entropy: two doc-keyed map-side-combinable aggregates.
  */
object SampleOps {

  /** Hex-decode SQL shared with every hashUniform oracle — single source
    * next to the Spark-side decode it must mirror. */
  private def hexDecodeSql(m: String): String =
    graft.api.Sampling.hexDecodeSql(m)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Weighted reservoir sample (Efraimidis–Spirakis A-Res): priority
    // -ln(u)/w with u an md5-derived uniform and w = n_chars; the 100
    // smallest priorities win — inclusion odds proportional to length,
    // fully deterministic.
    "sample_weighted" -> ((s, d) => {
      Sampling.sampleWeighted(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          col("doc_id"), col("n_chars"), k = 100)
        .select(col("doc_id"), col("n_chars"),
          floor(col("priority") * lit(100000000.0)).cast("long").as("pri_c"))
        .orderBy("doc_id")
    }),

    // Per-language quota sample: first 20 docs of each language in
    // (md5(doc_id), doc_id) order — window PARTITIONED by lang.
    "sample_per_group" -> ((s, d) => {
      Sampling.samplePerGroup(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"), k = 20)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
        .orderBy("doc_id")
    }),

    // Vocabulary truncation by cumulative coverage: per language, the
    // smallest (cnt DESC, token) prefix reaching 95% of token instances.
    // All-integer threshold arithmetic; windows over the vocab-sized
    // count table only.
    "vocab_coverage_topp" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tk"))
        .groupBy("lang", "tk").agg(count(lit(1)).as("cnt"))
      Sampling.vocabCoverage(counts, col("lang"), col("tk"), col("cnt"),
          pctTimes100 = 95)
        .select(col("lang"), col("tk"), col("cnt"), col("vrank"), col("cum"))
        .orderBy("lang", "vrank")
    }),

    // Unigram-entropy quality feature: per doc, Σ −p·ln p over its own
    // token distribution, each term floor-quantized to 1e−6 BEFORE the
    // integer sum (merge-order independent).
    "text_entropy_score" -> ((s, d) => {
      Relevance.entropyScore(Tables.documents(s, d), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("n_tok"), col("n_distinct"),
          col("ent_c").cast("long").as("ent_c"))
        .orderBy("doc_id")
    }),

    // The quality pipeline composed end-to-end: three independent quality
    // signals (unigram entropy, duplicate-token fraction, bigram-LM mean
    // log-prob) → integer-threshold filter → deterministic md5 shuffle of
    // the survivors → 128-token sequence packing per language stream.
    // Every stage is a library operator; the composition is oracle-checked
    // as one query. All thresholds compare quantized integers — no float
    // decision anywhere.
    "quality_pipeline_e2e" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ent = Relevance.entropyScore(docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("ent_c").cast("long").as("ent_c"))
      val rep = graft.api.Corpus.repetitionStats(docs, col("text"))
        .select(col("doc_id"), canon(col("dup_tok_frac")).as("dup_c"))
      val lm = Relevance.bigramLmScore(docs, col("doc_id"), col("lang"),
          col("text"))
        .select(col("id").as("doc_id"), col("mean_lp_c"))
      val kept = docs
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .join(ent, "doc_id").join(rep, "doc_id").join(lm, "doc_id")
        .filter(col("ent_c") >= 2500000L && col("dup_c") <= 6500L &&
          col("mean_lp_c") >= -35000L)
      val shuffled = graft.api.Corpus.shuffleOrder(kept, col("doc_id"))
      graft.api.Corpus.packSequences(shuffled, col("lang"),
          col("shuffle_pos"), col("n_tok"), budget = 128)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("ent_c"),
          col("dup_c"), col("mean_lp_c"), col("shuffle_pos"),
          col("start_tok"), col("seq_first"), col("seq_last"))
        .orderBy("doc_id")
    }),

    // Poisson bootstrap (the distributed bootstrap: per-row independent
    // Poisson(1) replica weights instead of a global n-resample — the
    // only bootstrap that works on sharded data, and embarrassingly
    // map-parallel): 8 replicas, weight from an md5-derived 24-bit
    // uniform pushed through the inverse-CDF ladder (integer thresholds
    // computed once and inlined IDENTICALLY in the oracle — no float
    // boundary round-trip), replica mean order value from exact integer
    // sums. One |orders|×8 map + one 8-group aggregate; no shuffle of
    // data rows beyond the map-side-combinable sum.
    "sample_poisson_bootstrap" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val w = PoissonThresholds.zipWithIndex.foldRight(lit(7L): Column) {
        case ((t: Long, k: Int), rest) =>
          when(col("h") < t, lit(k.toLong)).otherwise(rest)
      }
      o.select(col("o_orderkey"), col("cents"),
          explode(sequence(lit(0L), lit(7L))).as("b"))
        .withColumn("h", Sampling.hashDecode24(
          concat(col("o_orderkey").cast("string"), lit(":"), col("b").cast("string"))))
        .withColumn("w", w)
        .groupBy("b")
        .agg(sum(col("w")).as("n_samples"),
          sum(col("w") * col("cents")).as("sum_cents"))
        .selectExpr("b", "n_samples", "sum_cents",
          "sum_cents div n_samples AS mean_c")
        .orderBy("b")
    })
  )

  /** Cumulative Poisson(1) inverse-CDF thresholds on the 24-bit decode:
    * t(k) = ⌊2²⁴ · P(X ≤ k)⌋ for k = 0..6 (h < t(k) ⇒ weight ≤ k; the
    * residual mass lands on weight 7). Computed once here and
    * interpolated verbatim into the DuckDB oracle so both engines
    * compare against the SAME integer literals. */
  private val PoissonThresholds: Seq[Long] = {
    val pmf = Iterator.iterate((0, math.exp(-1.0))) {
      case (k, p) => (k + 1, p / (k + 1))
    }.take(7).map(_._2).toSeq
    pmf.scanLeft(0.0)(_ + _).tail.map(c => math.floor(c * 16777216.0).toLong)
  }

  def oracles: Map[String, String] = Map(
    "sample_poisson_bootstrap" -> {
      val hv = hexDecodeSql("md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR))")
      val ladder = PoissonThresholds.zipWithIndex
        .map { case (t, k) => s"WHEN h < $t THEN $k" }.mkString(" ")
      s"""WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |r AS (SELECT o_orderkey, cents, b, $hv AS h
        |      FROM o, unnest(generate_series(0, 7)) t(b)),
        |w AS (SELECT b, cents, CASE $ladder ELSE 7 END AS w FROM r)
        |SELECT b, CAST(sum(w) AS BIGINT) AS n_samples,
        |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(w * cents) AS BIGINT) // CAST(sum(w) AS BIGINT) AS mean_c
        |FROM w GROUP BY b ORDER BY b""".stripMargin
    },

    "sample_weighted" -> {
      val hv = hexDecodeSql("m")
      s"""WITH u AS (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS m
        |    FROM documents),
        |h AS (SELECT doc_id, n_chars, $hv AS hv FROM u),
        |p AS (SELECT doc_id, n_chars,
        |    -ln(CAST(hv + 1 AS DOUBLE) / 16777217.0) /
        |      greatest(CAST(n_chars AS DOUBLE), 1e-12) AS pri
        |  FROM h),
        |top AS (SELECT * FROM p ORDER BY pri, doc_id LIMIT 100)
        |SELECT doc_id, n_chars,
        |  CAST(floor(pri * 100000000.0) AS BIGINT) AS pri_c
        |FROM top ORDER BY doc_id""".stripMargin
    },

    "sample_per_group" ->
      """WITH r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS sample_rank
        |  FROM documents)
        |SELECT doc_id, lang, sample_rank FROM r
        |WHERE sample_rank <= 20 ORDER BY doc_id""".stripMargin,

    "vocab_coverage_topp" ->
      """WITH c AS (SELECT lang, tk, count(*) AS cnt
        |  FROM (SELECT lang, unnest(str_split(text, ' ')) AS tk FROM documents)
        |  GROUP BY lang, tk),
        |w AS (SELECT lang, tk, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tk)
        |      AS BIGINT) AS vrank,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, tk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |  FROM c)
        |SELECT lang, tk, cnt, vrank, cum FROM w
        |WHERE (cum - cnt) * 100 < tot * 95 ORDER BY lang, vrank""".stripMargin,

    "quality_pipeline_e2e" ->
      """WITH inst AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tk
        |    FROM documents),
        |c AS (SELECT doc_id, tk, count(*) AS c FROM inst GROUP BY doc_id, tk),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY doc_id),
        |t AS (SELECT c.doc_id,
        |    CAST(floor((CAST(c.c AS DOUBLE) / n.n) *
        |      ln(CAST(c.c AS DOUBLE) / n.n) * (-1000000.0)) AS BIGINT) AS term
        |  FROM c JOIN n ON c.doc_id = n.doc_id),
        |e AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS ent_c
        |  FROM t GROUP BY doc_id),
        |r AS (SELECT doc_id,
        |    CAST(floor(((len(str_split(text, ' ')) -
        |      len(list_distinct(str_split(text, ' ')))) * 1.0 /
        |      len(str_split(text, ' '))) * 10000) AS BIGINT) AS dup_c
        |  FROM documents),
        |tt AS (SELECT doc_id, lang, str_split(text, ' ') AS toks FROM documents),
        |bi AS (SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS b
        |  FROM tt),
        |uni AS (SELECT lang, unnest(toks) AS w FROM tt),
        |cu AS (SELECT lang, w, count(*) AS c FROM uni GROUP BY lang, w),
        |vb AS (SELECT lang, count(DISTINCT w) AS v FROM uni GROUP BY lang),
        |sc AS (SELECT bi.doc_id,
        |    CAST(floor(ln(CAST(cb.c + 1 AS DOUBLE) / (cu.c + vb.v)) * 10000)
        |      AS BIGINT) AS lp
        |  FROM bi
        |    JOIN (SELECT lang, b, count(*) AS c FROM bi GROUP BY lang, b) cb
        |      ON bi.lang = cb.lang AND bi.b = cb.b
        |    JOIN cu ON bi.lang = cu.lang AND str_split(bi.b, ' ')[1] = cu.w
        |    JOIN vb ON bi.lang = vb.lang),
        |m AS (SELECT doc_id,
        |    CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*)) AS BIGINT) AS mean_lp_c
        |  FROM sc GROUP BY doc_id),
        |kept AS (SELECT d.doc_id, d.lang,
        |    CAST(len(str_split(d.text, ' ')) AS BIGINT) AS n_tok,
        |    e.ent_c, r.dup_c, m.mean_lp_c
        |  FROM documents d
        |    JOIN e ON d.doc_id = e.doc_id
        |    JOIN r ON d.doc_id = r.doc_id
        |    JOIN m ON d.doc_id = m.doc_id
        |  WHERE e.ent_c >= 2500000 AND r.dup_c <= 6500 AND m.mean_lp_c >= -35000),
        |sh AS (SELECT *, CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |    AS shuffle_pos
        |  FROM kept),
        |p AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang
        |    ORDER BY shuffle_pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM sh)
        |SELECT doc_id, lang, n_tok, ent_c, dup_c, mean_lp_c, shuffle_pos,
        |  cum - n_tok AS start_tok,
        |  CAST(floor((cum - n_tok) / 128) AS BIGINT) AS seq_first,
        |  greatest(CAST(floor((cum - 1) / 128) AS BIGINT),
        |    CAST(floor((cum - n_tok) / 128) AS BIGINT)) AS seq_last
        |FROM p ORDER BY doc_id""".stripMargin,

    "text_entropy_score" ->
      """WITH inst AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tk
        |    FROM documents),
        |c AS (SELECT doc_id, tk, count(*) AS c FROM inst GROUP BY doc_id, tk),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY doc_id),
        |t AS (SELECT c.doc_id, n.n,
        |    CAST(floor((CAST(c.c AS DOUBLE) / n.n) *
        |      ln(CAST(c.c AS DOUBLE) / n.n) * (-1000000.0)) AS BIGINT) AS term
        |  FROM c JOIN n ON c.doc_id = n.doc_id)
        |SELECT doc_id, any_value(n) AS n_tok, count(*) AS n_distinct,
        |  CAST(sum(term) AS BIGINT) AS ent_c
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
