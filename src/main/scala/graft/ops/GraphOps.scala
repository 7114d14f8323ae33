package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** §2.18 graph analytics over the co-purchase graph: parts are nodes, an
  * undirected edge connects two parts that appear in the same order — the
  * item-item graph every recommender derives from a fact table. One
  * PageRank iteration and the degree distribution, both oracle-checked:
  * per-node contributions are floor-quantized to integer units BEFORE the
  * neighbor sum, so the scores are integer-exact and merge-order
  * independent (the same determinism design as lm_score_bigram).
  *
  * Scale shapes: pair generation is ORDER-LOCAL (bounded by items per
  * order, ~7 here — never a global self-join); the edge list shuffles on
  * the pair for the distinct and on the node for degrees/sums; top-k goes
  * through TakeOrderedAndProject. One iteration is the building block —
  * a full PageRank loops this step with the same shapes, converging state
  * carried as a node-keyed table.
  */
object GraphOps {

  /** Distinct undirected co-purchase edges, emitted in both directions
    * (u ↔ v). Distinct (order, part) first, so a part appearing on two
    * lineitems of one order doesn't double an edge. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    e.union(e.select(col("v").as("u"), col("u").as("v")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // One PageRank iteration from the uniform start (r = 1): each node
    // contributes floor(1e6 / deg) integer units to every neighbor;
    // pr = 0.15 + 0.85·Σ in pure integer arithmetic
    // (150000 + (s·85) div 100). Top-30 parts by the integer score.
    "graph_pagerank_step" -> ((s, d) => {
      val es = edges(s, d)
      val contrib = es.groupBy("u").agg(count(lit(1)).as("deg"))
        .select(col("u"), expr("1000000 div deg").as("c"))
      es.join(contrib, "u")
        .groupBy(col("v").as("part"))
        .agg(sum("c").as("sc"), count(lit(1)).as("n_nbr"))
        .select(col("part"), col("n_nbr"),
          (lit(150000L) + expr("(sc * 85) div 100")).as("pr_c"))
        .orderBy(col("pr_c").desc, col("part")).limit(30)
    }),

    // Degree distribution of the co-purchase graph — the first thing a
    // graph workload reports, and the skew signal that decides whether
    // the neighbor shuffle needs salting.
    "graph_degree_stats" -> ((s, d) => {
      edges(s, d)
        .groupBy("u").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg")
    })
  )

  private val edgesSql =
    """lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
      |       FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
      |e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0)""".stripMargin

  def oracles: Map[String, String] = Map(
    "graph_pagerank_step" ->
      s"""WITH $edgesSql,
        |ct AS (SELECT u, 1000000 // count(*) AS c FROM e GROUP BY u)
        |SELECT e.v AS part, count(*) AS n_nbr,
        |  CAST(150000 + (sum(ct.c) * 85) // 100 AS BIGINT) AS pr_c
        |FROM e JOIN ct ON e.u = ct.u
        |GROUP BY e.v
        |ORDER BY pr_c DESC, part LIMIT 30""".stripMargin,

    "graph_degree_stats" ->
      s"""WITH $edgesSql,
        |dg AS (SELECT u, count(*) AS deg FROM e GROUP BY u)
        |SELECT deg, count(*) AS n_nodes FROM dg
        |GROUP BY deg ORDER BY deg""".stripMargin
  )
}
