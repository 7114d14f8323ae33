package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.io.Tables.{canon, canon100}

/** §2.8 LLM-data-pipeline operators (SURVEY.md): tokenization, dedup
  * (exact + near-dup Jaccard), vector similarity search, centroids, k-NN,
  * multimodal joins, feed→warehouse enrichment.
  *
  * Scale notes (100 TB): tokenize/bigrams are Generator (explode) pipelines
  * — fully parallel, no shuffle until the final aggregate. Exact dedup is a
  * hash aggregate on the fingerprint. Near-dup uses an EXACT prefix-filtered
  * candidate generator (All-Pairs / PPJoin prefix principle): tokens are
  * globally ordered by ascending document frequency and each doc posts only
  * its rarest floor(n/2)+1 distinct tokens, so a corpus-scale stop-token
  * never self-joins quadratically; surviving candidate pairs are verified by
  * intersecting full token sets. Probabilistic MinHash-LSH banding and the
  * IVF ANN path live in graft.ops.Pipeline as separate operators. Brute
  * cosine/k-NN broadcast the (small, bounded) query side.
  *
  * All float folds are in-list-order HOFs with explicit double casts so
  * Spark and DuckDB produce bit-identical doubles.
  */
object LlmOps {

  /** In-order dot product of two float vectors, exact double ops — the
    * native codegen'd kernel (graft.catalyst.VecDotExpr), bit-identical to
    * the HOF fold it replaces. Queries using it install GraftExtensions. */
  private def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  private def ssq(a: Column): Column = dot(a, a)

  /** Wrap a query so the session has the native graft expressions. */
  private def native(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => { graft.catalyst.GraftExtensions.install(s); f(s, d) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // whitespace tokenize → explode → global token frequencies, top-50
    "text_tokenize_topk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(50)
    }),

    // top-5 bigrams per language — single pass, no self-join; the native
    // word_bigrams kernel replaces a per-position interpreted HOF concat
    "text_bigrams" -> native((s, d) => {
      val counted = Tables.documents(s, d)
        .select(col("lang"), explode(call_function("word_bigrams", col("text"))).as("bg"))
        .groupBy("lang", "bg").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("bg"))
      counted.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    }),

    // per-language corpus stats
    "text_stats_lang" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          canon(avg(col("n_chars"))).as("avg_chars_c"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    }),

    // exact duplicate clusters by content fingerprint
    "text_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("fp")
    }),

    // near-duplicate pairs, EXACT at scale, with the same plan-time
    // adaptive strategy as Pipeline's dedup_ngram_jaccard:
    //  - small token dictionary → per-doc token sets as fixed-width
    //    bitsets; the length-band blocked broadcast self-join verifies
    //    every pair with a native popcount fold (uniformly fat posting
    //    lists leave a prefix filter nothing to prune).
    //  - large dictionary (the 100 TB shape) → All-Pairs prefix principle:
    //    for J(A,B) ≥ τ the globally-smallest shared token lies in BOTH
    //    prefixes of length n−⌈τ·n⌉+1 (else all shared tokens fit in one
    //    suffix of size ⌈τ·n⌉−1 < τ·|A∪B|, contradiction), so joining only
    //    prefix postings misses nothing; hot tokens land in long-doc
    //    suffixes, capping posting-list self-join growth.
    "text_dedup_near" -> native((s, d) => {
      val tau = 0.5
      // per-doc distinct token ARRAY is map-only; everything derives from it
      val docsT = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          array_distinct(split(col("text"), " ")).as("tks"))
        .localCheckpoint() // feeds the vocab probe and both strategies
      // bounded dictionary probe (≤ 4097 rows collected — dim-table sized):
      // picks the strategy and, on the small side, IS the dictionary
      val probe = docsT.select(explode(col("tks")).as("tk")).distinct()
        .limit(4097).collect().map(_.getString(0))
      // length-band blocking in the join key (|Δchars| ≤ 20 ⇒ adjacent
      // 20-char bands; at most one band matches per pair, so no duplicates)
      val bandW = 20
      val jaccardOut = (df: DataFrame) => df
        .withColumn("jac", col("shared") * lit(10000.0) / (col("n1") + col("n2") - col("shared")))
        .filter(col("shared") * lit(1.0) / (col("n1") + col("n2") - col("shared")) >= tau)
        .select(col("d1"), col("d2"), floor(col("jac")).cast("long").as("jac_c"))
        .orderBy("d1", "d2")
      if (probe.length <= 4096) {
        // ---- dense-bitset strategy: shuffle-free map-literal encode ----
        val nWords = (probe.length + 63) / 64
        val dictMap = typedLit(
          probe.sorted.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap)
        val sets = docsT.select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("tks")).cast("long").as("ntk"),
          call_function("bitset_from_tokens", col("tks"), dictMap, lit(nWords)).as("bs"))
        val a = sets.select(col("doc_id").as("d1"), col("lang").as("l1"),
            col("n_chars").as("c1"), col("ntk").as("n1"), col("bs").as("b1"))
          .withColumn("cb1", floor(col("c1") / bandW))
        val b = sets.select(col("doc_id").as("d2"), col("lang").as("l2"),
            col("n_chars").as("c2"), col("ntk").as("n2"), col("bs").as("b2"))
          .withColumn("cb2", explode(array(floor(col("c2") / bandW) - 1,
            floor(col("c2") / bandW), floor(col("c2") / bandW) + 1)))
        jaccardOut(
          a.join(broadcast(b), col("l1") === col("l2") && col("cb1") === col("cb2") &&
              col("d1") < col("d2") && abs(col("c1") - col("c2")) <= 20 &&
              col("n2") >= col("n1") * tau && col("n1") >= col("n2") * tau)
            .withColumn("shared", call_function("bitset_intersect_count", col("b1"), col("b2"))))
      } else {
        // ---- prefix-filter strategy ----
        val tok = docsT.select(col("doc_id"), col("lang"), col("n_chars"),
          explode(col("tks")).as("tk"))
        val dfreq = tok.groupBy("tk").agg(count(lit(1)).as("df"))
        // dictionary-encode tokens to dense ints in global rarity order
        // (vocabulary-sized window, never corpus-sized)
        val dict = dfreq.withColumn("tid",
          row_number().over(Window.orderBy(col("df"), col("tk"))))
        // per-doc rarity-sorted id array: prefix source AND verification set
        val sorted = tok.join(dict, "tk")
          .groupBy("doc_id", "lang", "n_chars")
          .agg(array_sort(collect_list(col("tid"))).as("tids"))
          .withColumn("ntk", size(col("tids")).cast("long"))
          .localCheckpoint()
        val prefix = sorted
          .select(col("doc_id"), col("lang"), col("n_chars"), col("ntk"),
            posexplode(slice(col("tids"), lit(1),
              (col("ntk") - ceil(col("ntk") * tau) + 1).cast("int"))).as(Seq("p0", "tid")))
          .withColumn("p", col("p0") + 1)
        val a = prefix.select(col("doc_id").as("d1"), col("lang").as("l1"),
            col("n_chars").as("c1"), col("ntk").as("n1"), col("tid").as("tid1"), col("p").as("p1"))
          .withColumn("cb1", floor(col("c1") / bandW))
        val b = prefix.select(col("doc_id").as("d2"), col("lang").as("l2"),
            col("n_chars").as("c2"), col("ntk").as("n2"), col("tid").as("tid2"), col("p").as("p2"))
          .withColumn("cb2", explode(array(floor(col("c2") / bandW) - 1,
            floor(col("c2") / bandW), floor(col("c2") / bandW) + 1)))
        // candidate filters: same lang, id order, |Δchars|, the Jaccard size
        // bound τ·|A| ≤ |B| ≤ |A|/τ, and the PPJoin positional upper bound
        // o ≤ 1 + min(n1-p1, n2-p2) applied per collision row — the
        // collision on the smallest shared token carries both minimal
        // positions, so the per-row form admits exactly the same pairs as
        // aggregating min positions first
        val cand = a.join(b, col("tid1") === col("tid2") && col("l1") === col("l2") &&
            col("cb1") === col("cb2") &&
            col("d1") < col("d2") && abs(col("c1") - col("c2")) <= 20 &&
            col("n2") >= col("n1") * tau && col("n1") >= col("n2") * tau &&
            lit(1) + least(col("n1") - col("p1"), col("n2") - col("p2")) >=
              ceil((col("n1") + col("n2")) * lit(tau) / lit(1 + tau)))
          .select("d1", "d2").distinct()
        // verify against full distinct-token id sets (bijective encoding ⇒
        // identical intersection counts); broadcast so candidate rows never
        // shuffle array payloads (bucketed co-partitioned joins at 100 TB)
        jaccardOut(
          cand
            .join(broadcast(sorted.select(col("doc_id").as("d1"), col("tids").as("t1"))), "d1")
            .join(broadcast(sorted.select(col("doc_id").as("d2"), col("tids").as("t2"))), "d2")
            .withColumn("shared", size(array_intersect(col("t1"), col("t2"))).cast("long"))
            .withColumn("n1", size(col("t1")).cast("long"))
            .withColumn("n2", size(col("t2")).cast("long")))
      }
    }),

    // L2 norm per embedding
    "vec_norm" -> native((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), canon100(sqrt(ssq(col("embedding")))).as("norm_c"))
        .orderBy("vec_id")
    }),

    // similarity search: cosine vs query vector (vec 0), top-10
    "vec_cosine_topk" -> native((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos",
          dot(col("embedding"), col("qe")) /
            (sqrt(ssq(col("embedding"))) * sqrt(ssq(col("qe")))))
        .select(col("vec_id"), canon(col("cos")).as("cos_c"))
        .orderBy(col("cos_c").desc, col("vec_id")).limit(10)
    }),

    // per-label centroid vector (floor-canon per component, CSV-serialized
    // so the oracle harness can hash the array)
    "vec_centroid_label" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("cv"))
        .groupBy("label")
        .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), canon(col("cv")).as("c")))),
          s => s.getField("c")).cast("array<string>"), ",").as("centroid_c"))
        .orderBy("label")
    }),

    // brute-force k-NN: 5 nearest others for query vecs id<5 (squared L2)
    "vec_knn_brute" -> native((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val dist = call_function("vec_sqdist", col("embedding"), col("qe"))
      val w = Window.partitionBy("qid").orderBy(col("dist"), col("vec_id"))
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dist", dist)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("vec_id"), canon(col("dist")).as("dist_c"))
        .orderBy("qid", "rk")
    }),

    // multimodal: text metadata ⋈ vectors in one relation, per-language
    "multimodal_join" -> native((s, d) => {
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .withColumn("norm", sqrt(ssq(col("embedding"))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          canon100(avg(col("norm"))).as("avg_norm_c"),
          canon(avg(col("n_chars"))).as("avg_chars_c"))
        .orderBy("lang")
    }),

    // feed → warehouse enrichment: events ⋈ customer + JSON payload field
    "events_enrich_model" -> ((s, d) => {
      Tables.events(s, d)
        .join(Tables.customer(s, d), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(when(col("event_type") === "purchase", canon(col("value"), 100)).otherwise(0L)).as("rev_c"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    })
  )

  def oracles: Map[String, String] = Map(
    "text_tokenize_topk" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "text_bigrams" ->
      """WITH b AS (
        |  SELECT lang, unnest(list_transform(generate_series(1, len(str_split(text, ' ')) - 1),
        |    i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i + 1])) AS bg
        |  FROM documents),
        |c AS (SELECT lang, bg, count(*) AS n FROM b GROUP BY lang, bg),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, bg) AS rk FROM c)
        |SELECT lang, bg, n, rk FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    "text_stats_lang" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(floor(avg(n_chars) * 10000) AS BIGINT) AS avg_chars_c,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS first_doc, count(*) AS n
        |FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY fp""".stripMargin,

    "text_dedup_near" ->
      """WITH tok AS (SELECT DISTINCT doc_id, lang, n_chars,
        |    unnest(str_split(text, ' ')) AS tk FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS ntk FROM tok GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |  FROM tok a JOIN tok b ON a.tk = b.tk AND a.lang = b.lang
        |    AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  CAST(floor(shared * 10000.0 / (ca.ntk + cb.ntk - shared)) AS BIGINT) AS jac_c
        |FROM pair JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id
        |WHERE shared * 1.0 / (ca.ntk + cb.ntk - shared) >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    "vec_norm" ->
      """SELECT vec_id, CAST(floor(sqrt(list_reduce(list_transform(
        |    generate_series(1, len(embedding)),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |    (a, b) -> a + b)) * 100) AS BIGINT) AS norm_c
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "vec_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT vec_id,
        |  list_reduce(list_transform(generate_series(1, len(embedding)),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (a, b) -> a + b) /
        |  (sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a, b) -> a + b)) *
        |   sqrt(list_reduce(list_transform(generate_series(1, len(qe)),
        |    i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), (a, b) -> a + b))) AS cos
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id, CAST(floor(cos * 10000) AS BIGINT) AS cos_c
        |FROM s ORDER BY cos_c DESC, vec_id LIMIT 10""".stripMargin,

    "vec_centroid_label" ->
      """WITH p AS (SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)),
        |a AS (SELECT label, pos, CAST(floor(avg(v) * 10000) AS BIGINT) AS c
        |  FROM p GROUP BY label, pos)
        |SELECT label, array_to_string(list(c ORDER BY pos), ',') AS centroid_c
        |FROM a GROUP BY label ORDER BY label""".stripMargin,

    "vec_knn_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT qid, vec_id,
        |  list_reduce(list_transform(generate_series(1, len(embedding)),
        |    i -> (CAST(embedding[i] AS DOUBLE) - CAST(qe[i] AS DOUBLE)) *
        |         (CAST(embedding[i] AS DOUBLE) - CAST(qe[i] AS DOUBLE))), (a, b) -> a + b) AS dist
        |  FROM embeddings, q WHERE vec_id <> qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rk FROM s)
        |SELECT qid, rk, vec_id, CAST(floor(dist * 10000) AS BIGINT) AS dist_c
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "multimodal_join" ->
      """SELECT lang, count(*) AS n,
        |  CAST(floor(avg(sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |    (a, b) -> a + b))) * 100) AS BIGINT) AS avg_norm_c,
        |  CAST(floor(avg(n_chars) * 10000) AS BIGINT) AS avg_chars_c
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "events_enrich_model" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_c,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
