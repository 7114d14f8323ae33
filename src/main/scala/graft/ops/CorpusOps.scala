package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.{canon, canon100}

/** §2.12 corpus-analysis & packing operators — the remaining stages of a
  * production pretraining pipeline: PII redaction, intra-document
  * repetition screening (the Gopher-style filters), rarity scoring,
  * sequence packing for the trainer, signed-random-projection LSH over
  * embeddings, and int8 embedding quantization. All oracle-checked; every
  * pseudo-random ingredient (SRP hyperplanes) derives from md5 so both
  * engines compute identical bits.
  *
  * Scale shapes:
  *  - PII scrub / repetition / quantization are pure per-row expression
  *    pipelines (map-only, no shuffle);
  *  - rarity joins token instances against the VOCABULARY-sized df table
  *    (auto-broadcast; at 100 TB a vocab-keyed shuffle join) and reduces
  *    with integer sums — order-independent, merge-safe;
  *  - packing windows are partitioned by language stream (never a global
  *    single-partition window);
  *  - SRP-LSH candidates are bounded by 8-bit band collisions — two
  *    self-joins on an integer key, no cross join; each pair surfaces at
  *    its first matching band, so no candidate distinct shuffle.
  */
object CorpusOps {

  /** Sensitive-term pattern for the redaction stage (dictionary-based PII
    * masking stand-in; both regex engines — Java and RE2 — treat it
    * identically, and the oracle inlines the same pattern). */
  private val PiiPattern = "\\b(customer|key|value|table)\\b"

  /** Fixed SRP hyperplane sign s(b, i) ∈ {±1} from md5 parity — the b-th
    * plane's i-th (1-based) component; matches the oracle's
    * `substr(md5(b || '_' || i), 1, 1) <= '7'`. */
  private def srpSign(b: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${b}_$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) <= 7) 1.0 else -1.0
  }

  private def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII redaction: mask every dictionary-pattern hit, fingerprint the
    // redacted text, count the hits — map-only, no shuffle.
    "pii_scrub" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(regexp_replace(col("text"), PiiPattern, "<PII>")).as("red_fp"),
          size(regexp_extract_all(col("text"), lit(PiiPattern), lit(0)))
            .cast("long").as("n_redacted"))
        .orderBy("doc_id")
    }),

    // Gopher-style intra-document repetition screening: fraction of
    // duplicate tokens and duplicate word-bigrams per doc (high values ⇒
    // boilerplate/spam). Bigrams via the native word_bigrams kernel.
    "text_repetition_stats" -> ((s, d) => {
      graft.catalyst.GraftExtensions.install(s)
      val toks = split(col("text"), " ")
      val bigs = call_function("word_bigrams", col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          (size(toks) - size(array_distinct(toks))).cast("long").as("n_dup_tok"),
          (size(bigs) - size(array_distinct(bigs))).cast("long").as("n_dup_big"),
          canon((size(toks) - size(array_distinct(toks))) * lit(1.0) / size(toks))
            .as("dup_tok_frac_c"),
          canon((size(bigs) - size(array_distinct(bigs))) * lit(1.0) /
            greatest(size(bigs), lit(1))).as("dup_big_frac_c"))
        .orderBy("doc_id")
    }),

    // Rarity scoring (perplexity-filter stand-in): mean corpus document
    // frequency over the doc's token instances. Integer sums all the way
    // to one final division — shuffle-merge-order independent.
    "text_rarity_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val inst = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      // df = docs containing the token; per-doc distinct BEFORE the count
      // keeps the aggregate one shuffle on tk (vocabulary-sized output)
      val df = docs
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("df"))
      inst.join(df, "tk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), sum(col("df")).as("sum_df"))
        .select(col("doc_id"), col("n_tok"), col("sum_df"),
          canon100(col("sum_df") * lit(1.0) / col("n_tok")).as("mean_df_c"))
        .orderBy("doc_id")
    }),

    // Sequence packing (concat-and-chunk): per language stream, docs are
    // concatenated in doc_id order and cut into 128-token training
    // sequences; each doc reports its stream offset and first/last
    // sequence. The window is PARTITIONED by lang — per-stream cumsum,
    // never a global single-partition window.
    "seq_pack_chunk" -> ((s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          (col("cum") - col("n_tok")).as("start_tok"),
          floor((col("cum") - col("n_tok")) / 128).as("seq_first"),
          floor((col("cum") - 1) / 128).as("seq_last"))
        .orderBy("doc_id")
    }),

    // Embedding near-dup via signed-random-projection LSH: 16 md5-derived
    // ±1 hyperplanes → 16 sign bits → two 8-bit bands; candidates collide
    // on a band (emitted once, at their first matching band), then exact
    // cosine ≥ 0.35 verify. The unblocked scale path next to
    // dedup_embedding_cosine's label blocking: candidates are bounded by
    // band collisions, independent of any label column.
    "dedup_embedding_lsh" -> ((s, d) => {
      graft.catalyst.GraftExtensions.install(s)
      val dim = 64
      val planes: IndexedSeq[Seq[Double]] =
        (0 until 16).map(b => (1 to dim).map(i => srpSign(b, i)))
      val bit = (b: Int) =>
        when(dot(col("embedding"), typedLit(planes(b))) >= 0, lit(1L << (b % 8)))
          .otherwise(lit(0L))
      val sig = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          (0 until 8).map(bit).reduce(_ + _).as("band0"),
          (8 until 16).map(bit).reduce(_ + _).as("band1"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
        .localCheckpoint() // self-joined twice below: hash the planes once
      val a = sig.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("nrm1"), col("band0").as("b0a"), col("band1").as("b1a"))
      val b = sig.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("nrm2"), col("band0").as("b0b"), col("band1").as("b1b"))
      val c0 = a.join(b, col("b0a") === col("b0b") && col("v1") < col("v2"))
      val c1 = a.join(b, col("b1a") === col("b1b") && col("b0a") =!= col("b0b") &&
        col("v1") < col("v2"))
      c0.unionByName(c1)
        .withColumn("cos", dot(col("e1"), col("e2")) / (col("nrm1") * col("nrm2")))
        .filter(col("cos") >= 0.35)
        .select(col("v1"), col("v2"), canon(col("cos")).as("cos_c"))
        .orderBy("v1", "v2")
    }),

    // int8 embedding quantization: per-vector max-abs scale, q_i =
    // floor(x_i·127/maxabs) — floor, never round (determinism rule); the
    // checksums (sum of q, saturation count) are integer-exact.
    "vec_quantize_int8" -> ((s, d) => {
      val mx = greatest(
        array_max(transform(col("embedding"), x => abs(x.cast("double")))), lit(1e-12))
      Tables.embeddings(s, d)
        .withColumn("mx", mx)
        .withColumn("qs", transform(col("embedding"),
          x => floor(x.cast("double") * lit(127.0) / col("mx"))))
        .select(col("vec_id"),
          canon(col("mx")).as("maxabs_c"),
          aggregate(col("qs"), lit(0L), (acc, q) => acc + q).as("sum_q"),
          size(filter(col("qs"), q => abs(q) >= 127)).cast("long").as("n_sat"))
        .orderBy("vec_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "pii_scrub" ->
      """SELECT doc_id,
        |  md5(regexp_replace(text, '\b(customer|key|value|table)\b', '<PII>', 'g')) AS red_fp,
        |  CAST(len(regexp_extract_all(text, '\b(customer|key|value|table)\b')) AS BIGINT)
        |    AS n_redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_repetition_stats" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks,
        |    list_transform(generate_series(1, len(str_split(text, ' ')) - 1),
        |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i + 1]) AS bigs
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS n_dup_tok,
        |    CAST(len(bigs) - len(list_distinct(bigs)) AS BIGINT) AS n_dup_big,
        |    CAST(len(bigs) AS BIGINT) AS n_big
        |  FROM t)
        |SELECT doc_id, n_tok, n_dup_tok, n_dup_big,
        |  CAST(floor((n_dup_tok * 1.0 / n_tok) * 10000) AS BIGINT) AS dup_tok_frac_c,
        |  CAST(floor((n_dup_big * 1.0 / greatest(n_big, 1)) * 10000) AS BIGINT)
        |    AS dup_big_frac_c
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_rarity_score" ->
      """WITH inst AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tk FROM documents),
        |dfreq AS (SELECT tk, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, tk FROM inst) GROUP BY tk)
        |SELECT doc_id, count(*) AS n_tok, CAST(sum(df) AS BIGINT) AS sum_df,
        |  CAST(floor((sum(df) * 1.0 / count(*)) * 100) AS BIGINT) AS mean_df_c
        |FROM inst JOIN dfreq USING (tk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "seq_pack_chunk" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tok,
        |  cum - n_tok AS start_tok,
        |  CAST(floor((cum - n_tok) / 128) AS BIGINT) AS seq_first,
        |  CAST(floor((cum - 1) / 128) AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,

    "dedup_embedding_lsh" ->
      """WITH bits AS (
        |  SELECT vec_id, b,
        |    CASE WHEN list_reduce(list_transform(generate_series(1, 64),
        |        i -> CAST(embedding[i] AS DOUBLE) *
        |          (CASE WHEN substr(md5(CAST(b AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
        |            <= '7' THEN 1.0 ELSE -1.0 END)),
        |      (x, y) -> x + y) >= 0
        |    THEN CAST(floor(pow(2.0, b % 8)) AS BIGINT) ELSE 0 END AS bit
        |  FROM embeddings, unnest(generate_series(0, 15)) t(b)),
        |sig AS (SELECT vec_id,
        |    CAST(sum(CASE WHEN b < 8 THEN bit ELSE 0 END) AS BIGINT) AS band0,
        |    CAST(sum(CASE WHEN b >= 8 THEN bit ELSE 0 END) AS BIGINT) AS band1
        |  FROM bits GROUP BY vec_id),
        |nrm AS (SELECT vec_id, sqrt(list_reduce(list_transform(generate_series(1, 64),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |    (x, y) -> x + y)) AS nrm FROM embeddings),
        |cand AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2 FROM sig a JOIN sig b
        |    ON a.band0 = b.band0 AND a.vec_id < b.vec_id
        |  UNION ALL
        |  SELECT a.vec_id, b.vec_id FROM sig a JOIN sig b
        |    ON a.band1 = b.band1 AND a.band0 <> b.band0 AND a.vec_id < b.vec_id),
        |p AS (SELECT v1, v2,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)),
        |      (x, y) -> x + y) / (na.nrm * nb.nrm) AS cos
        |  FROM cand
        |    JOIN embeddings ea ON v1 = ea.vec_id JOIN embeddings eb ON v2 = eb.vec_id
        |    JOIN nrm na ON v1 = na.vec_id JOIN nrm nb ON v2 = nb.vec_id)
        |SELECT v1, v2, CAST(floor(cos * 10000) AS BIGINT) AS cos_c
        |FROM p WHERE cos >= 0.35 ORDER BY v1, v2""".stripMargin,

    "vec_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
        |      1e-12) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id, mx, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)) AS qs
        |  FROM m)
        |SELECT vec_id,
        |  CAST(floor(mx * 10000) AS BIGINT) AS maxabs_c,
        |  CAST(list_sum(qs) AS BIGINT) AS sum_q,
        |  CAST(len(list_filter(qs, qv -> abs(qv) >= 127)) AS BIGINT) AS n_sat
        |FROM q ORDER BY vec_id""".stripMargin
  )
}
