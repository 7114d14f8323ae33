package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.io.Tables.canon
import graft.model.CloudEvent
import graft.udf.{CloudEventsParse, JaccardTokens, LatestState, SeqId}

/** §2.9 engine extension surface (SURVEY.md): the UDF/UDAF/UDTF rows, each
  * exercised end-to-end and oracle-checked against the equivalent pure-SQL
  * formulation. These are deliberately the NON-codegen paths (a typed
  * `Aggregator`, registered Scala UDFs, a from_json Generator pipeline) —
  * the §2.1–2.8 operators stay on native expressions; this file proves the
  * extension points work and agree with them.
  */
object ExtOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // typed compaction Aggregator ≡ feed_compact_latest's window plan
    // (README.md:184-188); buffer = max-by-id envelope → merge-order free
    "latest_state" -> ((s, d) => {
      import s.implicits._
      val ces = CloudEvent.fromEvents(Tables.events(s, d))
      ces.groupByKey(_.subject.getOrElse(""))
        .agg(LatestState.toColumn.name("state"))
        .select(col("state.subject").cast("long").as("subject"),
          col("state.id").as("id"),
          col("state.type").as("type"),
          col("state.method").as("method"))
        .orderBy("subject")
    }),

    // UDTF surface: events → CloudEvents batch pages (README.md:11) →
    // CloudEventsParse explode → envelope rows; round-trip ≡ direct scan
    "cloudevents_parse" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_id") < 2000)
      val envelope = struct(
        lpad(col("event_id").cast("string"), 13, "0").as("id"),
        lit("1.0").as("specversion"),
        col("event_type").as("type"),
        lit("https://feeds.example/events").as("source"),
        col("ts_us").as("time_us"),
        col("user_id").cast("string").as("subject"),
        when(col("event_type") === "error", "DELETE").otherwise("PUT").as("method"),
        lit("application/json").as("datacontenttype"),
        col("props").as("data"))
      val pages = ev
        .groupBy((col("event_id") / 100).cast("long").as("page_no"))
        .agg(CloudEventsParse.toPage(collect_list(envelope)).as("page_json"))
      pages
        .select(CloudEventsParse.explodePage(col("page_json")).as("ce"))
        .select(col("ce.id").as("id"), col("ce.type").as("type"),
          col("ce.time_us").as("time_us"),
          col("ce.subject").cast("long").as("subject"),
          col("ce.method").as("method"), col("ce.data").as("data"))
        .orderBy("id")
    }),

    // seq-prefixed id codec (README.md:159): encode via the registered
    // scalar UDF (§2.9 surface), decode via the codegen'd native Catalyst
    // expression (graft.catalyst.SeqIdDecodeExpr) — both extension points
    // in one oracle-checked roundtrip
    "seq_id_order" -> ((s, d) => {
      SeqId.register(s)
      graft.catalyst.GraftExtensions.install(s)
      Tables.events(s, d)
        .filter(col("event_id") % 50 === 0)
        .select(col("event_id"),
          SeqId.encodeUdf(col("event_id"), md5(col("event_id").cast("string"))).as("seq_id"))
        .withColumn("parsed_seq", expr("seq_id_decode_native(seq_id)"))
        .orderBy("event_id")
    }),

    // scalar UDF over token arrays: Jaccard of consecutive same-lang docs
    "jaccard_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          array_distinct(split(col("text"), " ")).as("tks"))
      val a = docs.select(col("doc_id").as("d1"), col("lang").as("l1"), col("tks").as("t1"))
      val b = docs.select(col("doc_id").as("d2"), col("lang").as("l2"), col("tks").as("t2"))
      a.join(b, col("d2") === col("d1") + 1 && col("l1") === col("l2"))
        .select(col("d1"), col("d2"),
          canon(JaccardTokens.jaccardUdf(col("t1"), col("t2"))).as("jac_c"))
        .orderBy("d1")
    })
  )

  def oracles: Map[String, String] = Map(
    "latest_state" ->
      """SELECT user_id AS subject,
        |  lpad(CAST(event_id AS VARCHAR), 13, '0') AS id,
        |  event_type AS type,
        |  CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END AS method
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY subject""".stripMargin,

    "cloudevents_parse" ->
      """SELECT lpad(CAST(event_id AS VARCHAR), 13, '0') AS id,
        |  event_type AS type, epoch_us(ts) AS time_us, user_id AS subject,
        |  CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END AS method,
        |  props AS data
        |FROM events WHERE event_id < 2000 ORDER BY id""".stripMargin,

    "seq_id_order" ->
      """WITH e AS (SELECT event_id,
        |  lpad(CAST(event_id AS VARCHAR), 13, '0') || '::' || md5(CAST(event_id AS VARCHAR)) AS seq_id
        |  FROM events WHERE event_id % 50 = 0)
        |SELECT event_id, seq_id,
        |  CAST(split_part(seq_id, '::', 1) AS BIGINT) AS parsed_seq
        |FROM e ORDER BY event_id""".stripMargin,

    "jaccard_tokens" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(str_split(text, ' ')) AS tks
        |           FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(floor((len(list_intersect(a.tks, b.tks)) * 1.0 /
        |    (len(a.tks) + len(b.tks) - len(list_intersect(a.tks, b.tks)))) * 10000) AS BIGINT) AS jac_c
        |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
        |ORDER BY d1""".stripMargin
  )
}
