package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.29 incremental view maintenance & SQL-surface completeness — the
  * aggregate-merge step behind every materialized view refresh (proven
  * against full recomputation), the null-safe equality join, outer
  * generators over empty collections, and the hierarchical
  * share-of-parent OLAP report.
  *
  * Scale shapes (100 TB notes):
  *  - ivm_agg_merge: the refresh touches the BASE VIEW (|keys| rows) and
  *    the DELTA's aggregate — never the base fact table; the merge is one
  *    key-partitioned full-outer join of two aggregates (count/sum are
  *    self-mergeable; avg/stddev would carry their partial sums the same
  *    way). This is REFRESH MATERIALIZED VIEW INCREMENTALLY as a plan.
  *  - join_null_safe_eq: <=> compiles to a normal hash join with a
  *    null-bucket — nulls co-locate on one key, the skew caveat a real
  *    deployment salts if null density is high (documented, low here).
  *  - fn_generators_outer: pure per-row lambda + generator, zero shuffle
  *    before the group-by; outer semantics keep empty-collection rows.
  *  - olap_parent_share: all windows over the |region|×|nation| aggregate.
  */
object ViewOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Incremental view maintenance of the per-customer order summary:
    // the "materialized" base view covers o_orderkey % 10 < 8; the delta
    // batch (% 10 ≥ 8) is aggregated alone and MERGED into the view by a
    // key-partitioned full-outer coalesce — proven identical to a full
    // recompute by the oracle (which recomputes from scratch).
    "ivm_agg_merge" -> ((s, d) => {
      val ord = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), floor(col("o_totalprice")).cast("long").as("tp"))
      def view(df: DataFrame) = df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("tp").as("rev"))
      val base = view(ord.filter(expr("o_orderkey % 10 < 8")))
        .select(col("o_custkey"), col("n").as("n0"), col("rev").as("rev0"))
      val delta = view(ord.filter(expr("o_orderkey % 10 >= 8")))
        .select(col("o_custkey"), col("n").as("dn"), col("rev").as("drev"))
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("rev0"), lit(0L)) + coalesce(col("drev"), lit(0L)))
            .as("rev"))
        .orderBy("o_custkey")
    }),

    // Incremental view maintenance for a JOIN view (the delta-join rule
    // ΔV = ΔF ⋈ D every IVM engine applies to fact-dimension views):
    // the materialized revenue-by-nation view absorbs a delta batch of
    // new orders by joining ONLY the delta against the dimension and
    // merging partial aggregates — the old fact rows are never re-read.
    // At 100 TB this is the difference between touching a day's ingest
    // and re-scanning the fact table; the oracle recomputes from
    // scratch, so merge ≡ recompute is the checked law.
    "ivm_join_delta" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      def view(df: DataFrame) = df
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      val o = Tables.orders(s, d)
      view(o.filter(col("o_orderkey") % 7 =!= 0))
        .unionByName(view(o.filter(col("o_orderkey") % 7 === 0)))
        .groupBy("c_nationkey")
        .agg(sum("n").as("n_orders"), sum("rev").as("rev_c"))
        .orderBy("c_nationkey")
    }),

    // Null-safe equality join (<=>): customer and supplier nation keys
    // with nation 13 deterministically nullified on both sides — the
    // null bucket genuinely joins (null <=> null is TRUE), unlike = which
    // would drop it. Pair counts per (nullable) key; null displayed as
    // -1 for a total output order.
    "join_null_safe_eq" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(expr("nullif(c_nationkey, 13)").as("ck"))
      val su = Tables.supplier(s, d)
        .select(expr("nullif(s_nationkey, 13)").as("sk"))
      c.join(su, col("ck") <=> col("sk"))
        .groupBy(coalesce(col("ck"), lit(-1)).cast("long").as("nk_disp"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("nk_disp")
    }),

    // Outer generators over possibly-empty per-row collections:
    // arr = [1..vec_id mod 4] (empty for mod 0) built by a filter
    // lambda; posexplode_outer KEEPS the empty rows as a null element —
    // the count by element proves no row was dropped.
    "fn_generators_outer" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("filter(sequence(1, 3), x -> x <= vec_id % 4)").as("arr"))
        .select(col("vec_id"), posexplode_outer(col("arr")).as(Seq("p", "v")))
        .groupBy(coalesce(col("v"), lit(-1)).cast("long").as("v_disp"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("p"), lit(-1)).cast("long")).as("sum_pos"))
        .orderBy("v_disp")),

    // Hierarchical share-of-parent: revenue per (region, nation) with
    // integer-ppm share of the region parent and the in-region rank —
    // the drill-down report shape. Every window runs over the
    // |region|×|nation| aggregate.
    "olap_parent_share" -> ((s, d) => {
      val rev = Tables.customer(s, d)
        .join(Tables.nation(s, d),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(floor(col("o_totalprice")).cast("long")).as("rev"))
      val wR = Window.partitionBy("r_name")
      val wRk = Window.partitionBy("r_name")
        .orderBy(col("rev").desc, col("n_name"))
      rev
        .withColumn("region_rev", sum("rev").over(wR))
        .withColumn("share_ppm", expr("(rev * 1000000) div region_rev"))
        .withColumn("rk", row_number().over(wRk).cast("long"))
        .select("r_name", "n_name", "rev", "share_ppm", "rk")
        .orderBy("r_name", "n_name")
    })
  )

  def oracles: Map[String, String] = Map(
    // full recompute — the differential claim is that base-view + delta
    // merge lands the identical view
    // full recompute — the merge ≡ recompute law IS the oracle
    "ivm_join_delta" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "ivm_agg_merge" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "join_null_safe_eq" ->
      """WITH c AS (SELECT nullif(c_nationkey, 13) AS ck FROM customer),
        |s AS (SELECT nullif(s_nationkey, 13) AS sk FROM supplier),
        |j AS (SELECT ck FROM c JOIN s ON ck IS NOT DISTINCT FROM sk)
        |SELECT CAST(coalesce(ck, -1) AS BIGINT) AS nk_disp,
        |  count(*) AS n_pairs
        |FROM j GROUP BY 1 ORDER BY nk_disp""".stripMargin,

    "fn_generators_outer" ->
      """WITH b AS (SELECT vec_id,
        |    CASE WHEN vec_id % 4 = 0 THEN [NULL]
        |      ELSE generate_series(1, CAST(vec_id % 4 AS INTEGER)) END AS arr
        |  FROM embeddings),
        |u AS (SELECT vec_id, u.v,
        |    CASE WHEN u.v IS NULL THEN NULL
        |      ELSE u.v - 1 END AS p
        |  FROM b, unnest(arr) u(v))
        |SELECT CAST(coalesce(v, -1) AS BIGINT) AS v_disp, count(*) AS n,
        |  CAST(sum(coalesce(p, -1)) AS BIGINT) AS sum_pos
        |FROM u GROUP BY 1 ORDER BY v_disp""".stripMargin,

    "olap_parent_share" ->
      """WITH rev AS (SELECT r_name, n_name,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |w AS (SELECT *, CAST(sum(rev) OVER (PARTITION BY r_name) AS BIGINT)
        |      AS region_rev,
        |    row_number() OVER (PARTITION BY r_name
        |      ORDER BY rev DESC, n_name) AS rk FROM rev)
        |SELECT r_name, n_name, rev,
        |  (rev * 1000000) // region_rev AS share_ppm,
        |  CAST(rk AS BIGINT) AS rk
        |FROM w ORDER BY r_name, n_name""".stripMargin
  )
}
