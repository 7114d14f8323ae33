package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.27 sequence analytics & language-model smoothing — interpolated
  * Kneser-Ney bigram probabilities (the classic n-gram smoothing a
  * corpus-quality pipeline scores with), running distinct counting over
  * ordered event streams, an EXACT integer exponential smoother (all
  * weights powers of two), and a per-document compressibility proxy.
  *
  * Scale shapes (100 TB notes):
  *  - lm_kneser_ney: every statistic is an aggregate over the BIGRAM-TYPE
  *    relation (vocabulary²-bounded, not corpus-bounded): c(w1,w2) is the
  *    only data-sized aggregation (one shuffle, map-side combinable);
  *    follower/continuation counts and the type total are derived from
  *    the type relation. The discount D = 3/4 is an exact binary
  *    fraction, so P_KN is the same double in any engine that evaluates
  *    the identical expression tree.
  *  - win_running_distinct: two user-partitioned windows (first-seen flag
  *    via (user, type) rank, then a running sum) — never global.
  *  - ts_ewma: weights 2^-(k+1) over a 16-step window make the smoother
  *    PURE INTEGER: I = Σ x_{t-k}·2^(15-k), ewma_c = I·10⁴ div 65535.
  *    16 lag columns over the calendar-sized per-type daily series.
  *  - text_compression_proxy: per-row array expressions only (split /
  *    array_distinct / transform) — zero shuffle before the output sort.
  */
object SeqOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Greedy argmax decoding from the corpus bigram LM: start at the
    // most frequent token (by bigram-head count), then 7 steps of
    // "most frequent continuation" (ties lexicographic — a total order,
    // so any engine decodes the identical sequence; cycles are fine and
    // expected). The data-sized work is the single bigram aggregation;
    // the per-head argmax rides the SAME aggregate (min over
    // struct(-c, w2) encodes the c-desc / w2-asc tie order). The 8-step
    // chain is walked DECLARATIVELY: each step joins the previous step's
    // 1-row relation (broadcast) back against the checkpointed per-head
    // argmax relation, so the vocabulary never reaches the driver — at
    // 100 TB a word-level vocabulary is unbounded (10⁸+ heads) and the
    // former |vocab|-row collect was the one unbounded driver transfer
    // left in the library. Output (step, token, c); a token with no
    // continuation makes every later step's join empty, so the chain
    // ends early exactly as before (both engines drop the rows).
    "lm_greedy_decode" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 2)
      val arg = toks.select(explode(expr(
          "transform(sequence(0, size(tks)-2), " +
            "i -> struct(tks[i] as w1, tks[i+1] as w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .groupBy("w1").agg(sum("c").as("cu"),
          min(struct((-col("c")).as("nc"), col("w2"))).as("best"))
        .select(col("w1"), col("cu"),
          col("best.w2").as("nxt"), (-col("best.nc")).as("nc"))
        .localCheckpoint() // vocab-sized, stays distributed; scanned 8×
      // each step is localCheckpointed (≤1 row): the final union reads 8
      // materialized rows instead of re-deriving every step's join-chain
      // prefix, so `arg` is scanned exactly once per step. The isNotNull
      // guard drops the all-NULL global aggregate row an EMPTY corpus
      // produces (the oracle's LIMIT 1 over an empty relation is 0 rows,
      // and an empty step 1 empties the whole chain the same way).
      var cur = arg
        .agg(min(struct((-col("cu")).as("a"), col("w1").as("b"))).as("m"))
        .select(lit(1L).as("step"), col("m.b").as("token"),
          (-col("m.a")).as("c"))
        .where(col("token").isNotNull)
        .localCheckpoint()
      var out = cur
      // a halted chain (no continuation) makes every later step empty —
      // cur is already checkpointed, so the isEmpty probe is a local
      // ≤1-row scan and the remaining broadcast mini-jobs are skipped
      var halted = cur.isEmpty
      for (k <- 2 to 8 if !halted) {
        cur = arg
          .join(broadcast(cur.select(col("token").as("w1"))), "w1")
          .select(lit(k.toLong).as("step"), col("nxt").as("token"),
            col("nc").as("c"))
          .localCheckpoint()
        if (cur.isEmpty) halted = true
        else out = out.unionByName(cur)
      }
      out.orderBy("step")
    }),

    // Interpolated Kneser-Ney bigram probabilities with absolute
    // discount D = 0.75 over the whitespace-token corpus:
    //   P_KN(w2|w1) = (c(w1,w2) − D)/c(w1)
    //               + ((D · N1+(w1·)) / c(w1)) · (N1+(·w2) / T)
    // where N1+ are follower/continuation type counts and T the total
    // number of bigram types. Reported for the 50 most frequent bigrams
    // (ties lexicographic).
    "lm_kneser_ney" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 2)
      val bi = toks.select(explode(expr(
          "transform(sequence(0, size(tks)-2), " +
            "i -> struct(tks[i] as w1, tks[i+1] as w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val w1Stats = bi.groupBy("w1").agg(sum("c").as("cw1"),
        count(lit(1)).as("n1_fwd"))
      val w2Stats = bi.groupBy("w2").agg(count(lit(1)).as("n1_bwd"))
        .withColumn("t_types", sum("n1_bwd").over(Window.partitionBy()))
      bi.join(w1Stats, "w1").join(w2Stats, "w2")
        .withColumn("p_kn",
          (col("c").cast("double") - lit(0.75)) / col("cw1").cast("double") +
            (lit(0.75) * col("n1_fwd").cast("double") /
              col("cw1").cast("double")) *
              (col("n1_bwd").cast("double") / col("t_types").cast("double")))
        .orderBy(col("c").desc, col("w1"), col("w2")).limit(50)
        .select(col("w1"), col("w2"), col("c"),
          Tables.canon(col("p_kn"), 1000000L).as("p_kn_c"))
        .orderBy("w1", "w2")
    }),

    // Running distinct event-type count per user, ordered by event time
    // (ties by event_id): the classic first-occurrence-flag + running
    // sum formulation — both windows user-partitioned.
    "win_running_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"))
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      ev.withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("n_distinct_types", sum("first_seen").over(wRun))
        .select("event_id", "user_id", "n_distinct_types")
        .orderBy("event_id")
    }),

    // Exponential smoother over the per-type DAILY event-count series
    // with weights 2^-(k+1), k = 0..15 (truncated EWMA, renormalized by
    // Σw = 65535/65536). Pure integer: I = Σ x_{t-k}·2^(15-k),
    // ewma_c = (I · 10000) div 65535 — no float ever enters, so the
    // oracle matches bit-for-bit. Emitted for rows with a full window.
    "ts_ewma" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagged = (0 to 15).foldLeft(daily) { (df, k) =>
        df.withColumn(s"x$k", lag(col("x"), k).over(w))
      }
      val iSum = (0 to 15).map(k => col(s"x$k") * lit(1L << (15 - k)))
        .reduce(_ + _)
      lagged.filter(col("x15").isNotNull)
        .withColumn("i_sum", iSum)
        .withColumn("ewma_c", expr("(i_sum * 10000) div 65535"))
        .select("event_type", "day", "x", "ewma_c")
        .orderBy("event_type", "day")
    }),

    // Per-document compressibility proxy: type-token ratios at the word
    // and word-bigram level (distinct/total, integer ppm) — low ratios
    // flag boilerplate/repetitive documents before they reach training.
    // Pure per-row array expressions; zero shuffle.
    "text_compression_proxy" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 2)
        .withColumn("n_tok", size(col("tks")).cast("long"))
        .withColumn("n_dist", size(array_distinct(col("tks"))).cast("long"))
        .withColumn("n_bi_dist", size(array_distinct(expr(
          "transform(sequence(0, size(tks)-2), " +
            "i -> concat(tks[i], ' ', tks[i+1]))"))).cast("long"))
        .withColumn("ttr_ppm", expr("(n_dist * 1000000) div n_tok"))
        .withColumn("bigram_ttr_ppm",
          expr("(n_bi_dist * 1000000) div (n_tok - 1)"))
        .select("doc_id", "n_tok", "n_dist", "n_bi_dist", "ttr_ppm",
          "bigram_ttr_ppm")
        .orderBy("doc_id"))
  )

  def oracles: Map[String, String] = Map(
    "lm_greedy_decode" -> {
      val steps = (2 to 8).map { k =>
        s"""s$k AS (SELECT b.w2 AS token, b.c FROM bi b
           |  JOIN s${k - 1} p ON b.w1 = p.token
           |  ORDER BY b.c DESC, b.w2 LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val rows = (1 to 8)
        .map(k => s"SELECT CAST($k AS BIGINT) AS step, token, c FROM s$k")
        .mkString("\nUNION ALL\n")
      s"""WITH t AS (SELECT str_split(text, ' ') AS tks FROM documents
        |           WHERE len(str_split(text, ' ')) >= 2),
        |bi AS (SELECT tks[i] AS w1, tks[i+1] AS w2,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM t, unnest(generate_series(1, len(tks) - 1)) u(i)
        |  GROUP BY 1, 2),
        |s1 AS (SELECT w1 AS token, CAST(sum(c) AS BIGINT) AS c FROM bi
        |  GROUP BY 1 ORDER BY c DESC, token LIMIT 1),
        |$steps
        |$rows
        |ORDER BY step""".stripMargin
    },

    "lm_kneser_ney" ->
      """WITH t AS (SELECT str_split(text, ' ') AS tks FROM documents
        |           WHERE len(str_split(text, ' ')) >= 2),
        |bi AS (SELECT tks[i] AS w1, tks[i+1] AS w2, count(*) AS c
        |  FROM t, unnest(generate_series(1, len(tks) - 1)) u(i)
        |  GROUP BY 1, 2),
        |w1s AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
        |    count(*) AS n1_fwd FROM bi GROUP BY 1),
        |w2s AS (SELECT w2, count(*) AS n1_bwd FROM bi GROUP BY 1),
        |w2t AS (SELECT *, CAST(sum(n1_bwd) OVER () AS BIGINT) AS t_types
        |  FROM w2s),
        |j AS (SELECT bi.w1, bi.w2, bi.c,
        |    (CAST(bi.c AS DOUBLE) - 0.75) / CAST(w1s.cw1 AS DOUBLE) +
        |      (0.75 * CAST(w1s.n1_fwd AS DOUBLE) / CAST(w1s.cw1 AS DOUBLE)) *
        |      (CAST(w2t.n1_bwd AS DOUBLE) / CAST(w2t.t_types AS DOUBLE)) AS p_kn
        |  FROM bi JOIN w1s ON bi.w1 = w1s.w1 JOIN w2t ON bi.w2 = w2t.w2),
        |top AS (SELECT * FROM j ORDER BY c DESC, w1, w2 LIMIT 50)
        |SELECT w1, w2, c,
        |  CAST(floor(p_kn * 1000000) AS BIGINT) AS p_kn_c
        |FROM top ORDER BY w1, w2""".stripMargin,

    "win_running_distinct" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT event_id, user_id, ts_us,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts_us, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
        |  FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS BIGINT) AS n_distinct_types
        |FROM f ORDER BY event_id""".stripMargin,

    "ts_ewma" -> {
      val lags = (0 to 15).map(k =>
        s"lag(x, $k) OVER (PARTITION BY event_type ORDER BY day) AS x$k")
        .mkString(", ")
      val iSum = (0 to 15).map(k => s"x$k * ${1L << (15 - k)}").mkString(" + ")
      s"""WITH dly AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |lg AS (SELECT event_type, day, x, $lags FROM dly)
        |SELECT event_type, day, x,
        |  CAST((($iSum) * 10000) // 65535 AS BIGINT) AS ewma_c
        |FROM lg WHERE x15 IS NOT NULL
        |ORDER BY event_type, day""".stripMargin
    },

    "text_compression_proxy" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS tks FROM documents
        |           WHERE len(str_split(text, ' ')) >= 2),
        |m AS (SELECT doc_id, CAST(len(tks) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(tks)) AS BIGINT) AS n_dist,
        |    CAST(len(list_distinct(list_transform(
        |      generate_series(1, len(tks) - 1),
        |      i -> tks[i] || ' ' || tks[i+1]))) AS BIGINT) AS n_bi_dist
        |  FROM t)
        |SELECT doc_id, n_tok, n_dist, n_bi_dist,
        |  (n_dist * 1000000) // n_tok AS ttr_ppm,
        |  (n_bi_dist * 1000000) // (n_tok - 1) AS bigram_ttr_ppm
        |FROM m ORDER BY doc_id""".stripMargin
  )
}
