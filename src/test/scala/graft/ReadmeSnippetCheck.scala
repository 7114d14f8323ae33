package graft

// Compile-only check that the README "Using the library" snippet is real
// code against the current API (never instantiated).
object ReadmeSnippetCheck {
  def snippet(spark: org.apache.spark.sql.SparkSession,
              docs: org.apache.spark.sql.DataFrame,
              corpus: org.apache.spark.sql.DataFrame,
              queries: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    import graft.api.{Feeds, Curation, Vectors, Corpus}

    val live = spark.readStream.format("http-feed")
      .option("url", "https://example.org/inventory-feed").load()

    val feed = spark.read.parquet("s3://bucket/feeds/inventory")
    val state = Feeds.readModel(Feeds.dedupById(feed, "id"),
      subject = col("subject"), order = col("id"),
      isTombstone = col("method") === "DELETE")

    val pairs = Curation.nearDupPairs(docs, col("doc_id"), col("shingles"),
      col("lang"), col("n_chars"), tau = 0.7)
    val keep = Curation.connectedComponents(pairs.select("d1", "d2"))
    val scored = Corpus.rarityScore(docs, col("doc_id"), col("text"))
    val packed = Corpus.packSequences(
      Corpus.shuffleOrder(docs, col("doc_id")),
      stream = col("lang"), order = col("shuffle_pos"),
      nTok = size(split(col("text"), " ")), budget = 2048)

    val nn = Vectors.knn(corpus, col("vec_id"), col("embedding"),
      queries, col("qid"), col("qvec"), k = 10)

    snippet2(docs, corpus, queries)
    val _ = (live, state, keep, scored, packed, nn)
  }

  /** The README's "Rank, sketch, and lay out data for scale" block. */
  def snippet2(docs: org.apache.spark.sql.DataFrame,
               tokenInstances: org.apache.spark.sql.DataFrame,
               events: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val (customers, bigSpenders, lineitem, dims) = (docs, docs, docs, docs)

    import graft.api.{Relevance, Sketches, Layout}
    val ranked = Relevance.bm25(docs, col("doc_id"), col("text"),
      terms = Seq("spark", "feed"))
    val hitters = Sketches.countMin(tokenInstances, col("tk"))
    val pruned = Sketches.bloomProbe(customers, col("c_custkey"),
      Sketches.bloomBits(bigSpenders, col("o_custkey")))
    val zsorted = lineitem.orderBy(Layout.zValue(col("pk_bucket"), col("sk_bucket")))
    val joined = Layout.saltedJoin(events, dims, "user_id",
      saltBy = col("event_id"), nSalts = 8)
    val _ = (ranked, hitters, pruned, zsorted, joined)
  }
}
