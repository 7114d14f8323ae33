package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Sampling
import graft.io.Tables

/** §2.47 deterministic HLL, frequency spectra & SQL edge semantics
  * (added round 6).
  *
  * The headline: an HLL built from ENGINE-PORTABLE ingredients.
  * `agg_approx_distinct` (Spark's builtin HLL) is the library's one
  * oracle-exempt operator because its hash is engine-private;
  * `agg_hll_deterministic` rebuilds the sketch from md5-derived hashes
  * with the rank ladder generated as the SAME CASE expression on both
  * sides — so even the approximate estimator is bit-reproducible and
  * oracle-checked. Register ranks are integers; Σ2^(−ρ) is a sum of
  * dyadic rationals needing ≤ 25 mantissa bits — EXACT in doubles —
  * and the final α·m²/S product is one identical-parse-tree float op.
  *
  * Scale shapes (100 TB notes):
  *  - agg_hll_deterministic: one (group, bucket) max-rank aggregate
  *    (64 cells per group, map-side combinable) then a |groups|-row
  *    fold — the mergeable-sketch shape, like stats_moments_merge.
  *  - text_freq_spectrum: vocabulary histogram → frequency-of-frequency
  *    cells (value-bounded).
  *  - subquery_not_in_null: the NULL-semantics contract every engine
  *    must honor before anti joins can be trusted; both variants are
  *    one pass over bounded aggregates.
  */
object SketchOps {

  private val HllBuckets = 64 // 6-bit bucket index, 18-bit rank word

  /** Rank of the 18-bit word w = position of the highest set bit from
    * the top + 1 (1..19, 19 when w = 0) — as a CASE ladder generated
    * identically for Spark and DuckDB (no float log anywhere). */
  private def rankCase(w: String): String = {
    val whens = (17 to 0 by -1).map { b =>
      s"WHEN $w >= ${1L << b} THEN ${18 - b}"
    }.mkString(" ")
    s"(CASE $whens ELSE 19 END)"
  }

  /** JVM twin of the rank ladder (for stream_hll_state's register
    * updates): rank of the 18-bit word, 1..19. */
  private[graft] def hllRho(w: Long): Long =
    if (w == 0) 19L else 18L - (63 - java.lang.Long.numberOfLeadingZeros(w))

  /** JVM twin of the estimator fold (registers length 64, 0 = empty):
    * raw α·m²/Σ2^(−ρ) with the linear-counting small-range branch —
    * arithmetic identical to the column expressions. */
  private[graft] def hllEstimate(regs: Array[Long]): Double = {
    val hit = regs.count(_ > 0)
    val s = regs.filter(_ > 0).map(r => 1.0 / math.pow(2.0, r.toDouble)).sum +
      (HllBuckets - hit).toDouble
    val raw = 0.709 * (HllBuckets.toLong * HllBuckets).toDouble / s
    if (hit < HllBuckets && raw <= 2.5 * HllBuckets)
      HllBuckets.toDouble * math.log(HllBuckets.toDouble / (HllBuckets - hit))
    else raw
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic 64-register HLL distinct estimate per event type,
    // WITH the standard linear-counting small-range correction (raw
    // E ≤ 2.5m and empty buckets V > 0 → m·ln(m/V); ln over the 64
    // possible m/V ratios is the same correctly-rounded double in both
    // engines), next to the exact count. h = 24-bit md5 decode of
    // user_id; bucket = h % 64; rank = leading-bit position of h div 64.
    "agg_hll_deterministic" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
      val hv = Sampling.hashBucket(col("user_id"), 1 << 24) // full 24-bit decode
      val reg = ev
        .withColumn("h", hv)
        .select(col("event_type"), expr("h % 64").as("bucket"),
          expr(rankCase("(h div 64)")).cast("long").as("rho"))
        .groupBy("event_type", "bucket").agg(max("rho").as("m_rho"))
      // Σ 2^(−ρ): exact dyadic sum; buckets never hit (no row) count as
      // 2^0 = 1 each — add (64 − n_buckets) ones explicitly
      val folded = reg.groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          sum(lit(1.0) / pow(lit(2.0), col("m_rho"))).as("s_hit"))
        .withColumn("s",
          col("s_hit") + (lit(HllBuckets) - col("n_buckets")).cast("double"))
        .withColumn("raw",
          lit(0.709) * lit((HllBuckets.toLong * HllBuckets).toDouble) / col("s"))
        .withColumn("est",
          when(col("n_buckets") < HllBuckets &&
              col("raw") <= lit(2.5 * HllBuckets),
            lit(HllBuckets.toDouble) *
              log(lit(HllBuckets.toDouble) /
                (lit(HllBuckets) - col("n_buckets")).cast("double")))
            .otherwise(col("raw")))
      val exact = ev.distinct().groupBy("event_type")
        .agg(count(lit(1)).as("n_exact"))
      exact.join(folded.select(col("event_type"),
          floor(col("est") * 100).cast("long").as("est_c")), "event_type")
        .orderBy("event_type")
    }),

    // HLL MERGEABILITY proven differentially (the kmv/quantile-merge
    // pattern): per-(type, day) partial register sets — what each ingest
    // shard builds — merged by elementwise MAX give the SAME registers
    // as the direct sketch (max is associative/commutative/idempotent),
    // so the estimate hash-matches the direct oracle.
    "sketch_hll_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
          col("user_id"))
      val hv = Sampling.hashBucket(col("user_id"), 1 << 24)
      val partial = ev.withColumn("h", hv)
        .select(col("event_type"), col("day"), expr("h % 64").as("bucket"),
          expr(rankCase("(h div 64)")).cast("long").as("rho"))
        .groupBy("event_type", "day", "bucket").agg(max("rho").as("p_rho"))
      val reg = partial.groupBy("event_type", "bucket")
        .agg(max("p_rho").as("m_rho")) // the merge: elementwise max
      val folded = reg.groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          sum(lit(1.0) / pow(lit(2.0), col("m_rho"))).as("s_hit"))
        .withColumn("s",
          col("s_hit") + (lit(HllBuckets) - col("n_buckets")).cast("double"))
        .withColumn("raw",
          lit(0.709) * lit((HllBuckets.toLong * HllBuckets).toDouble) / col("s"))
        .withColumn("est",
          when(col("n_buckets") < HllBuckets &&
              col("raw") <= lit(2.5 * HllBuckets),
            lit(HllBuckets.toDouble) *
              log(lit(HllBuckets.toDouble) /
                (lit(HllBuckets) - col("n_buckets")).cast("double")))
            .otherwise(col("raw")))
      val exact = ev.select("event_type", "user_id").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      exact.join(folded.select(col("event_type"),
          floor(col("est") * 100).cast("long").as("est_c")), "event_type")
        .orderBy("event_type")
    }),

    // Jensen–Shannon divergence between source unigram distributions
    // (all source pairs a < b): per-token contributions computed as
    // identical-parse-tree doubles, QUANTIZED to integer 1e-9 units
    // BEFORE the sum (a raw double Σ over the vocabulary would be
    // merge-order dependent) — the drift metric next to drift_l1_buckets
    // with the information-theoretic weighting.
    "text_js_divergence" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tk"))
        .filter(length(col("tk")) > 0)
        .groupBy("source", "tk").agg(count(lit(1)).as("c"))
      val tot = tok.groupBy("source").agg(sum("c").as("n"))
      val withP = tok.join(tot, "source")
      val a = withP.select(col("source").as("sa"), col("tk"),
        col("c").as("ca"), col("n").as("na"))
      val b = withP.select(col("source").as("sb"), col("tk"),
        col("c").as("cb"), col("n").as("nb"))
      val pairs = a.join(b, Seq("tk"), "inner").filter(col("sa") < col("sb"))
      // SHARED-support JS by contract: tokens appearing on only one side
      // are excluded (n_shared reports the support size) — the common
      // variant when comparing distributions over a shared vocabulary
      def contrib(p: org.apache.spark.sql.Column,
                  q: org.apache.spark.sql.Column) =
        floor((p * log(lit(2.0) * p / (p + q)) +
          q * log(lit(2.0) * q / (p + q))) * lit(5e8)).cast("long")
      val both = pairs.select(col("sa"), col("sb"),
        contrib(col("ca").cast("double") / col("na").cast("double"),
          col("cb").cast("double") / col("nb").cast("double")).as("t"))
      both.groupBy("sa", "sb").agg(count(lit(1)).as("n_shared"),
          sum("t").as("js_e9"))
        .orderBy("sa", "sb")
    }),

    // Frequency-of-frequency spectrum of the document BIGRAM vocabulary
    // (bigrams carry the long rare tail unigrams lack in this corpus):
    // exact cells for frequency 1..9, decimal-magnitude buckets for the
    // tail — the corpus statistic behind Good-Turing smoothing and
    // Zipf-tail diagnostics.
    "text_freq_spectrum" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 2)
      val vocab = toks.select(explode(expr(
          "transform(sequence(0, size(tks)-2), " +
            "i -> concat(tks[i], ' ', tks[i+1]))")).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("f"))
      vocab
        .withColumn("band",
          when(col("f") <= 9, col("f").cast("string"))
            .otherwise(concat(lit("1e"),
              (length(col("f").cast("string")) - 1).cast("string"))))
        .groupBy("band")
        .agg(count(lit(1)).as("n_tokens"), sum("f").as("n_instances"),
          min("f").as("f_min"), max("f").as("f_max"))
        .orderBy("f_min")
    }),

    // Primary-key uniqueness audit over two candidate keys — the
    // lineitem (orderkey, linenumber) "PK" and the events
    // (user_id, ts_us) natural key — reporting per check the
    // duplicate-key count, affected rows, and worst multiplicity: the
    // first integrity report every load runs. (Both candidates are in
    // fact dirty in this synthetic fixture — exactly what the report
    // exists to surface.)
    "dq_uniqueness_check" -> ((s, d) => {
      def audit(df: DataFrame, name: String): DataFrame = df
        .groupBy("k1", "k2").agg(count(lit(1)).as("c"))
        .agg(lit(name).as("check_name"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_rows"),
          max("c").as("max_mult"))
      audit(Tables.lineitem(s, d)
          .select(col("l_orderkey").as("k1"),
            col("l_linenumber").cast("long").as("k2")), "lineitem_pk")
        .unionByName(audit(Tables.events(s, d)
          .select(col("user_id").as("k1"), col("ts_us").as("k2")),
          "events_user_ts"))
        .orderBy("check_name")
    }),

    // NOT IN vs NOT EXISTS under NULLs — the SQL trap: `key NOT IN
    // (subquery containing NULL)` is never TRUE, while NOT EXISTS
    // ignores the NULL row. Probe = customers without a 1999 order (a
    // nonempty set), list salted with one NULL: NOT IN must report 0,
    // NOT EXISTS the real count — engines must agree on both.
    "subquery_not_in_null" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("graft_cust_nn")
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .createOrReplaceTempView("graft_ord_nn")
      s.sql("""
        SELECT 'not_in' AS variant, count(*) AS n FROM graft_cust_nn
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM graft_ord_nn
           UNION ALL SELECT CAST(NULL AS BIGINT))
        UNION ALL
        SELECT 'not_exists', count(*) FROM graft_cust_nn c
        WHERE NOT EXISTS (SELECT 1 FROM (SELECT o_custkey FROM graft_ord_nn
            UNION ALL SELECT CAST(NULL AS BIGINT)) o
          WHERE o.o_custkey = c.c_custkey)
        ORDER BY variant""")
    })
  )

  def oracles: Map[String, String] = Map(
    "agg_hll_deterministic" -> {
      val hv = Sampling.hexDecodeSql("md5(CAST(user_id AS VARCHAR))")
      s"""WITH h AS (SELECT event_type, user_id, ($hv) AS hv FROM events),
        |r AS (SELECT event_type, hv % 64 AS bucket,
        |    ${rankCase("(hv // 64)")} AS rho FROM h),
        |reg AS (SELECT event_type, bucket, max(rho) AS m_rho
        |  FROM r GROUP BY 1, 2),
        |f AS (SELECT event_type, count(*) AS n_buckets,
        |    sum(1.0 / power(2.0, m_rho)) AS s_hit
        |  FROM reg GROUP BY 1),
        |e0 AS (SELECT event_type, n_buckets,
        |    0.709 * 4096.0 / (s_hit + (64 - n_buckets)) AS raw FROM f),
        |e AS (SELECT event_type,
        |    CASE WHEN n_buckets < 64 AND raw <= 160.0
        |      THEN 64.0 * ln(64.0 / CAST(64 - n_buckets AS DOUBLE))
        |      ELSE raw END AS est FROM e0),
        |x AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT x.event_type AS event_type, x.n_exact,
        |  CAST(floor(e.est * 100) AS BIGINT) AS est_c
        |FROM x JOIN e ON x.event_type = e.event_type
        |ORDER BY 1""".stripMargin
    },

    // merged per-day register partials ≡ the direct sketch (max merge)
    "sketch_hll_merge" -> {
      val hv = Sampling.hexDecodeSql("md5(CAST(user_id AS VARCHAR))")
      s"""WITH h AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    user_id, ($hv) AS hv FROM events),
        |r AS (SELECT event_type, day, hv % 64 AS bucket,
        |    ${rankCase("(hv // 64)")} AS rho FROM h),
        |pa AS (SELECT event_type, day, bucket, max(rho) AS p_rho
        |  FROM r GROUP BY 1, 2, 3),
        |reg AS (SELECT event_type, bucket, max(p_rho) AS m_rho
        |  FROM pa GROUP BY 1, 2),
        |f AS (SELECT event_type, count(*) AS n_buckets,
        |    sum(1.0 / power(2.0, m_rho)) AS s_hit
        |  FROM reg GROUP BY 1),
        |e0 AS (SELECT event_type, n_buckets,
        |    0.709 * 4096.0 / (s_hit + (64 - n_buckets)) AS raw FROM f),
        |e AS (SELECT event_type,
        |    CASE WHEN n_buckets < 64 AND raw <= 160.0
        |      THEN 64.0 * ln(64.0 / CAST(64 - n_buckets AS DOUBLE))
        |      ELSE raw END AS est FROM e0),
        |x AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT x.event_type AS event_type, x.n_exact,
        |  CAST(floor(e.est * 100) AS BIGINT) AS est_c
        |FROM x JOIN e ON x.event_type = e.event_type
        |ORDER BY 1""".stripMargin
    },

    "text_js_divergence" ->
      """WITH tok AS (SELECT source, unnest(str_split(text, ' ')) AS tk
        |  FROM documents),
        |c AS (SELECT source, tk, count(*) AS c FROM tok
        |  WHERE length(tk) > 0 GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |w AS (SELECT c.source, c.tk, c.c, t.n FROM c JOIN t
        |  ON c.source = t.source),
        |p AS (SELECT a.source AS sa, b.source AS sb,
        |    CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE) AS pa,
        |    CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE) AS pb
        |  FROM w a JOIN w b ON a.tk = b.tk AND a.source < b.source),
        |q AS (SELECT sa, sb,
        |    CAST(floor((pa * ln(2.0 * pa / (pa + pb)) +
        |      pb * ln(2.0 * pb / (pa + pb))) * 500000000.0) AS BIGINT) AS t
        |  FROM p)
        |SELECT sa, sb, count(*) AS n_shared, CAST(sum(t) AS BIGINT) AS js_e9
        |FROM q GROUP BY 1, 2 ORDER BY sa, sb""".stripMargin,

    "text_freq_spectrum" ->
      """WITH t AS (SELECT str_split(text, ' ') AS tks FROM documents
        |           WHERE len(str_split(text, ' ')) >= 2),
        |tok AS (SELECT concat(tks[i], ' ', tks[i+1]) AS tk
        |  FROM t, unnest(generate_series(1, len(tks) - 1)) u(i)),
        |v AS (SELECT tk, count(*) AS f FROM tok GROUP BY 1),
        |b AS (SELECT CASE WHEN f <= 9 THEN CAST(f AS VARCHAR)
        |    ELSE concat('1e',
        |      CAST(length(CAST(f AS VARCHAR)) - 1 AS VARCHAR)) END AS band,
        |    f FROM v)
        |SELECT band, count(*) AS n_tokens, CAST(sum(f) AS BIGINT)
        |    AS n_instances,
        |  min(f) AS f_min, max(f) AS f_max
        |FROM b GROUP BY 1 ORDER BY f_min""".stripMargin,

    "dq_uniqueness_check" ->
      """WITH a AS (SELECT l_orderkey AS k1, l_linenumber AS k2, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |b AS (SELECT user_id AS k1, epoch_us(ts) AS k2, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT 'events_user_ts' AS check_name,
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows,
        |  max(c) AS max_mult FROM b
        |UNION ALL
        |SELECT 'lineitem_pk',
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT),
        |  max(c) FROM a
        |ORDER BY check_name""".stripMargin,

    "subquery_not_in_null" ->
      """WITH o99 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |    AND o_orderdate < TIMESTAMP '2000-01-01')
        |SELECT 'not_in' AS variant, count(*) AS n FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM o99
        |   UNION ALL SELECT CAST(NULL AS BIGINT))
        |UNION ALL
        |SELECT 'not_exists', count(*) FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM (SELECT o_custkey FROM o99
        |    UNION ALL SELECT CAST(NULL AS BIGINT)) o
        |  WHERE o.o_custkey = c.c_custkey)
        |ORDER BY variant""".stripMargin
  )
}
