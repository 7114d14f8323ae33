package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.io.Tables.canon

/** §2.6 scalar function surface (SURVEY.md): string/datetime/math/
  * conditional/JSON/map/array/hash expressions — all codegen'd built-ins
  * (`org.apache.spark.sql.functions`), no UDFs, so every query stays inside
  * WholeStageCodegen. JSON late-binding realizes the spec's schemaless
  * `data` payload access (reference README.md:315-316).
  */
object Scalars {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // string expression pipeline over part names
    "fn_string" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub5"),
          lpad(col("p_name"), 15, ".").as("pad"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("undersc"),
          length(col("p_name")).as("len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("cat"),
          split(col("p_name"), " ").getItem(1).as("tok2"))
        .orderBy("p_partkey")
    }),

    // datetime expressions over order dates (all time output as epoch_us)
    "fn_datetime" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          unix_micros(date_trunc("month", col("o_orderdate"))).as("month_us"),
          unix_micros((col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("timestamp")).as("plus30_us"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"))
        .orderBy("o_orderkey")
    }),

    // math expressions (no round — determinism rule 1)
    "fn_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(canon(col("l_extendedprice"), 100) - lit(5000000L)).as("absdev"),
          ceil(col("l_quantity")).as("qceil"),
          floor(col("l_quantity")).as("qfloor"),
          canon(sqrt(col("l_extendedprice"))).as("sqrt_c"),
          canon(pow(col("l_quantity"), 2), 1).as("qsq"),
          canon(log(col("l_extendedprice"))).as("ln_c"),
          (canon(col("l_extendedprice"), 100) % 97).as("mod97"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // conditional expressions
    "fn_conditional" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          greatest(canon(col("c_acctbal"), 100), lit(0L)).as("bal_pos"),
          least(canon(col("c_acctbal"), 100), lit(500000L)).as("bal_cap"))
        .orderBy("c_custkey")
    }),

    // JSON path extraction from the schemaless props payload
    "fn_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          (get_json_object(col("props"), "$.k").cast("long") % 7).as("k_mod7"),
          get_json_object(col("props"), "$.missing").isNull.as("miss"))
        .orderBy("event_id")
        .limit(500)
    }),

    // payload as a typed map: keys (CSV-serialized for the harness) + lookup
    "fn_map" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          array_join(sort_array(map_keys(from_json(col("props"), lit("map<string,bigint>")))), ",").as("ks"),
          element_at(from_json(col("props"), lit("map<string,bigint>")), "k").as("kv"))
        .orderBy("event_id")
        .limit(500)
    }),

    // array ops + higher-order functions over embeddings
    "fn_array" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          canon(element_at(col("embedding"), 1).cast("double")).as("e1_c"),
          size(slice(col("embedding"), 1, 4)).as("sl4"),
          canon(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))).as("ssq_c"))
        .orderBy("vec_id")
    }),

    // Higher-order-function surface: filter / exists / forall /
    // transform / zip_with lambdas over the embedding arrays — counts
    // and flags all integer (coordinates canon'd BEFORE arithmetic), and
    // the zip_with product pairs each vector with its own reverse so
    // the lambda genuinely consumes two arrays.
    "fn_higher_order" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("zc", expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 10000) as bigint))"))
        .select(col("vec_id"),
          expr("size(filter(zc, x -> x > 0))").cast("long").as("n_pos"),
          expr("case when forall(zc, x -> abs(x) < 10000) then 1 else 0 end")
            .cast("long").as("all_small"),
          expr("case when exists(zc, x -> x > 3000) then 1 else 0 end")
            .cast("long").as("any_big"),
          expr("aggregate(zip_with(zc, reverse(zc), (a, b) -> a * b), " +
            "cast(0 as bigint), (acc, x) -> acc + x)").as("revdot"))
        .orderBy("vec_id")
    }),

    // content fingerprint (md5)
    "fn_hash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"),
          substring(md5(col("text")), 1, 4).as("bucket"))
        .orderBy("doc_id")
        .limit(300)
    })
  )

  def oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |  substr(p_name, 1, 5) AS sub5, lpad(p_name, 15, '.') AS pad,
        |  replace(p_name, ' ', '_') AS undersc, length(p_name) AS len,
        |  p_brand || '/' || p_type AS cat, split_part(p_name, ' ', 2) AS tok2
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  epoch_us(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS month_us,
        |  epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30_us,
        |  datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(CAST(floor(l_extendedprice * 100) AS BIGINT) - 5000000) AS absdev,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qceil,
        |  CAST(floor(l_quantity) AS BIGINT) AS qfloor,
        |  CAST(floor(sqrt(l_extendedprice) * 10000) AS BIGINT) AS sqrt_c,
        |  CAST(floor(pow(l_quantity, 2)) AS BIGINT) AS qsq,
        |  CAST(floor(ln(l_extendedprice) * 10000) AS BIGINT) AS ln_c,
        |  CAST(floor(l_extendedprice * 100) AS BIGINT) % 97 AS mod97
        |FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  greatest(CAST(floor(c_acctbal * 100) AS BIGINT), 0) AS bal_pos,
        |  least(CAST(floor(c_acctbal * 100) AS BIGINT), 500000) AS bal_cap
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod7,
        |  json_extract_string(props, '$.missing') IS NULL AS miss
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,

    "fn_map" ->
      """SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') AS ks,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,

    "fn_array" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS e1_c,
        |  len(list_slice(embedding, 1, 4)) AS sl4,
        |  CAST(floor(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) * 10000) AS BIGINT) AS ssq_c
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_higher_order" ->
      """WITH z AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS zc
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(list_filter(zc, x -> x > 0)) AS BIGINT) AS n_pos,
        |  CAST(CASE WHEN len(list_filter(zc, x -> abs(x) >= 10000)) = 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS all_small,
        |  CAST(CASE WHEN len(list_filter(zc, x -> x > 3000)) > 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS any_big,
        |  CAST(list_reduce(list_transform(generate_series(1, len(zc)),
        |    i -> zc[i] * zc[len(zc) - i + 1]), (a, b) -> a + b) AS BIGINT)
        |    AS revdot
        |FROM z ORDER BY vec_id""".stripMargin,

    "fn_hash" ->
      """SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 4) AS bucket
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin
  )
}
