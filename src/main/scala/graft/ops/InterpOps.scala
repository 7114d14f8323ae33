package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.46 interpolation, personalized ranking & sentence structure (added
  * round 6): gap-filling by LINEAR interpolation (the ffill operator's
  * honest sibling — ffill biases downward on rising series),
  * personalized PageRank from a seed set (the "related to THESE items"
  * ranking every recommender derives), and sentence-level text
  * statistics.
  *
  * Determinism: interpolation uses floor(double ratio) on both sides —
  * NOT integer division, whose negative-operand semantics differ
  * between engines (Spark `div` truncates toward zero, DuckDB `//`
  * floors); PPR is integer-exact like the PageRank family.
  *
  * Scale shapes (100 TB notes):
  *  - ts_resample_interpolate: per-user windows over the user's own
  *    hour GRID (span-bounded), carrying (hour, value) structs for the
  *    surrounding present readings — no join against the full series.
  *  - graph_pagerank_personalized: the score relation stays SPARSE
  *    (only reached nodes have rows — 3 hops from 3 seeds), each step
  *    one u-keyed join off the shared u-partitioned edge cache + one
  *    aggregation; the reset mass re-enters as a 3-row union.
  *  - text_sentence_stats: per-row regex split + array folds, one
  *    |sources|-sized report.
  */
object InterpOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hourly resample with LINEAR interpolation for users < 10: present
    // hours keep their last reading (canon'd); gap hours interpolate
    // between the surrounding readings: v = vp + ⌊(vn−vp)(h−hp) /
    // (hn−hp)⌋ (floor in doubles — identical in any engine, exact on
    // these magnitudes). Same grid/fixture as ts_resample_ffill, so the
    // two fills are directly comparable.
    "ts_resample_interpolate" -> ((s, d) => {
      val hourUs = 3600000000L
      val ev = Tables.events(s, d).filter(col("user_id") < 10)
        .select(col("user_id"), expr(s"ts_us div $hourUs").as("h"),
          col("ts_us"), col("event_id"),
          floor(col("value") * 10000).cast("long").as("v"))
      val wLast = Window.partitionBy("user_id", "h")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val hr = ev.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1).select("user_id", "h", "v")
      val grid = hr.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val g = grid.join(hr, Seq("user_id", "h"), "left_outer")
      val wb = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val present = when(col("v").isNotNull, struct(col("h"), col("v")))
      g.withColumn("p", last(present, ignoreNulls = true).over(wb))
        .withColumn("nx", first(present, ignoreNulls = true).over(wf))
        .select(col("user_id"), col("h"),
          when(col("v").isNotNull, col("v")).otherwise(
            col("p.v") + floor(
              ((col("nx.v") - col("p.v")) * (col("h") - col("p.h")))
                .cast("double") / (col("nx.h") - col("p.h")).cast("double"))
              .cast("long")).as("filled_c"),
          when(col("v").isNull, 1L).otherwise(0L).as("gap"))
        .orderBy("user_id", "h")
    }),

    // Personalized PageRank from seed parts {1, 2, 3}: reset mass lands
    // ONLY on the seeds (150000 integer units each per round), 85% of
    // each node's score propagates along co-purchase edges — 3 unrolled
    // integer-exact steps over a SPARSE score relation (nodes unreached
    // from the seeds never materialize a row). Top-30 by score.
    "graph_pagerank_personalized" -> ((s, d) => {
      val es = GraphOps.edges(s, d)
      val deg = GraphOps.adjacency(s, d).select(col("u"), col("deg"))
      val seeds = GraphOps.adjacency(s, d).select(col("u"))
        .filter(col("u").isin(1L, 2L, 3L))
      val reset = seeds.select(col("u"), lit(150000L).as("r"))
      var r = seeds.select(col("u"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        val contrib = r.join(deg, "u")
          .select(col("u"), expr("r div deg").as("c"))
        val spread = es.join(contrib.hint("shuffle_hash"), "u")
          .groupBy(col("v").as("u"))
          .agg(expr("(sum(c) * 85) div 100").as("r"))
        r = spread.unionByName(reset)
          .groupBy("u").agg(sum("r").as("r"))
          .localCheckpoint() // truncate the unrolled chain per step
      }
      r.select(col("u").as("part"), col("r").as("ppr_c"))
        .orderBy(col("ppr_c").desc, col("part")).limit(30)
    }),

    // Sentence-level structure per source: sentences = non-blank
    // segments on [.!?]+ boundaries; per source the doc count, sentence
    // count, mean sentences/doc (ppm) and mean sentence length
    // (chars ×100) — the readability-adjacent profile next to
    // text_quality_score.
    "text_sentence_stats" -> ((s, d) => {
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          filter(transform(split(col("text"), "[.!?]+"), x => trim(x)),
            x => length(x) > 0).as("sents"))
        .select(col("doc_id"), col("source"),
          size(col("sents")).cast("long").as("n_sent"),
          expr("aggregate(sents, CAST(0 AS BIGINT), (a, x) -> a + length(x))")
            .as("n_chars"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_sent").as("n_sent"),
          sum("n_chars").as("sum_chars"))
        .withColumn("sent_per_doc_ppm", expr("(n_sent * 1000000) div n_docs"))
        .withColumn("mean_len_c", expr("(sum_chars * 100) div n_sent"))
        .select("source", "n_docs", "n_sent", "sent_per_doc_ppm", "mean_len_c")
        .orderBy("source")
    })
  )

  def oracles: Map[String, String] = Map(
    "ts_resample_interpolate" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(floor(value * 10000) AS BIGINT) AS v
        |  FROM events WHERE user_id < 10),
        |hr AS (SELECT user_id, h, v FROM (
        |    SELECT user_id, us // 3600000000 AS h, v,
        |      row_number() OVER (PARTITION BY user_id, us // 3600000000
        |        ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hr
        |  GROUP BY user_id),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span),
        |p AS (SELECT g.user_id, g.h, arg_max(hr.v, hr.h) AS vp,
        |    max(hr.h) AS hp
        |  FROM g JOIN hr ON hr.user_id = g.user_id AND hr.h <= g.h
        |  GROUP BY 1, 2),
        |nx AS (SELECT g.user_id, g.h, arg_min(hr.v, hr.h) AS vn,
        |    min(hr.h) AS hn
        |  FROM g JOIN hr ON hr.user_id = g.user_id AND hr.h >= g.h
        |  GROUP BY 1, 2)
        |SELECT p.user_id, p.h,
        |  CASE WHEN p.hp = p.h THEN p.vp
        |    ELSE p.vp + CAST(floor(CAST((nx.vn - p.vp) * (p.h - p.hp)
        |      AS DOUBLE) / CAST(nx.hn - p.hp AS DOUBLE)) AS BIGINT) END
        |    AS filled_c,
        |  CASE WHEN p.hp = p.h THEN 0 ELSE 1 END AS gap
        |FROM p JOIN nx ON p.user_id = nx.user_id AND p.h = nx.h
        |ORDER BY p.user_id, p.h""".stripMargin,

    "graph_pagerank_personalized" -> {
      val steps = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""sp$i AS (SELECT e.v AS u,
           |    CAST((sum($prev.r // dg.deg) * 85) // 100 AS BIGINT) AS r
           |  FROM e JOIN $prev ON e.u = $prev.u JOIN dg ON e.u = dg.u
           |  GROUP BY e.v),
           |r$i AS (SELECT u, CAST(sum(r) AS BIGINT) AS r FROM (
           |    SELECT u, r FROM sp$i
           |    UNION ALL SELECT u, 150000 AS r FROM sd) GROUP BY u)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ${GraphOps.edgesSql},
        |dg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
        |sd AS (SELECT DISTINCT u FROM e WHERE u IN (1, 2, 3)),
        |r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM sd),
        |$steps
        |SELECT u AS part, r AS ppr_c FROM r3
        |ORDER BY ppr_c DESC, part LIMIT 30""".stripMargin
    },

    "text_sentence_stats" ->
      """WITH sg AS (SELECT doc_id, source,
        |    list_filter(list_transform(str_split_regex(text, '[.!?]+'),
        |      x -> trim(x)), x -> length(x) > 0) AS sents
        |  FROM documents),
        |pd AS (SELECT doc_id, source, len(sents) AS n_sent,
        |    CAST(list_sum(list_transform(sents, x -> length(x))) AS BIGINT)
        |      AS n_chars
        |  FROM sg),
        |g AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_sent) AS BIGINT) AS n_sent,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM pd GROUP BY 1)
        |SELECT source, n_docs, n_sent,
        |  (n_sent * 1000000) // n_docs AS sent_per_doc_ppm,
        |  (sum_chars * 100) // n_sent AS mean_len_c
        |FROM g ORDER BY source""".stripMargin
  )
}
