package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.api.Sampling

/** §2.34 typed Aggregator (UDAF) surface — custom mergeable aggregation
  * state as first-class engine extensions driven through
  * `KeyValueGroupedDataset.agg`: a per-group min-hash signature, a
  * presence bitmask OR, and a bounded top-k heap (the window-free top-k
  * pattern). Each Aggregator's merge is associative + commutative, so
  * partial aggregation (map-side combine) is exact — the property the
  * oracle checks.
  *
  * Scale shapes (100 TB notes):
  *  - every Aggregator here carries O(1) state per group (4 longs, 1
  *    long, ≤3 pairs), so the aggregation is map-side combinable and the
  *    shuffle moves |groups|·state, not data rows;
  *  - udaf_topk_group is the pattern that REPLACES rank windows at
  *    scale: a per-group bounded heap never sorts the partition, where
  *    row_number() would sort every group's rows. The oracle proves it
  *    equals the window formulation.
  *  - the min-hash seed hash replicates Sampling.hashUniform's 24-bit
  *    md5 decode over "seed:id" — bit-identical in the JVM
  *    (MessageDigest) and in DuckDB's md5().
  */
object UdafOps {

  /** 24-bit integer decode of md5("seed:id") — the JVM twin of
    * [[Sampling.hexDecodeSql]] over that concatenation. */
  private[graft] def seedHash24(seed: Long, id: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$id".getBytes(StandardCharsets.UTF_8))
      .take(3).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Per-group 4-seed min-hash signature over extracted row ids. */
  private[graft] def minHashAgg[I](f: I => Long): Aggregator[I, Array[Long], Array[Long]] =
    new Aggregator[I, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.fill(4)(Long.MaxValue)
      def reduce(b: Array[Long], row: I): Array[Long] = {
        val id = f(row)
        var i = 0
        while (i < 4) { b(i) = math.min(b(i), seedHash24(i.toLong, id)); i += 1 }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < 4) { a(i) = math.min(a(i), b(i)); i += 1 }
        a
      }
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }

  /** Presence-bitmask OR over extracted masks. */
  private def bitOrAgg[I](f: I => Long): Aggregator[I, Long, Long] =
    new Aggregator[I, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, row: I): Long = b | f(row)
      def merge(a: Long, b: Long): Long = a | b
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Bounded top-3 heap by (value desc, id asc) — the window-free
    * per-group top-k. State = at most 3 (value, id) pairs, kept sorted. */
  private def top3Agg[I](f: I => (Long, Long)): Aggregator[I, Seq[(Long, Long)], Seq[(Long, Long)]] =
    new Aggregator[I, Seq[(Long, Long)], Seq[(Long, Long)]] {
      private def keep(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
        s.sortBy { case (v, id) => (-v, id) }.take(3)
      def zero: Seq[(Long, Long)] = Seq.empty
      def reduce(b: Seq[(Long, Long)], row: I): Seq[(Long, Long)] =
        keep(b :+ f(row))
      def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
        keep(a ++ b)
      def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
      def bufferEncoder: Encoder[Seq[(Long, Long)]] =
        ExpressionEncoder[Seq[(Long, Long)]]()
      def outputEncoder: Encoder[Seq[(Long, Long)]] =
        ExpressionEncoder[Seq[(Long, Long)]]()
    }

  /** JVM twin of [[Sampling.hashUniform]]'s 24-bit decode of
    * md5(id) — first 3 digest bytes as an integer. */
  private[graft] def idHash24(id: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id".getBytes(StandardCharsets.UTF_8))
      .take(3).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** A-Res priority −ln(u)/w with u from [[idHash24]] — identical
    * arithmetic to the Sampling.sampleWeighted column expression
    * (java.lang.Math.log on both paths). */
  private[graft] def aresPriority(id: Long, w: Long): Double =
    -math.log((idHash24(id) + 1).toDouble / 16777217.0) /
      math.max(w.toDouble, 1e-12)

  /** Bounded A-Res reservoir: the k smallest (priority, id) pairs —
    * merge = keep the k smallest of the union (associative,
    * commutative; the weighted sample is a FUNCTION of the id set, so
    * partials combine exactly). */
  private def reservoirAgg[I](k: Int, f: I => (Double, Long, Long))
      : Aggregator[I, Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] =
    new Aggregator[I, Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] {
      private def keep(s: Seq[(Double, Long, Long)]) =
        s.sortBy { case (p, id, _) => (p, id) }.take(k)
      def zero: Seq[(Double, Long, Long)] = Seq.empty
      def reduce(b: Seq[(Double, Long, Long)], row: I) = keep(b :+ f(row))
      def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]) =
        keep(a ++ b)
      def finish(r: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = r
      def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
        ExpressionEncoder[Seq[(Double, Long, Long)]]()
      def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
        ExpressionEncoder[Seq[(Double, Long, Long)]]()
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-source weighted reservoir (A-Res, k = 20, weight = n_chars)
    // as a typed Aggregator: state is a bounded priority list, merged by
    // keep-smallest — the UDAF form of sample_weighted/samplePerGroup.
    // The oracle re-derives every reservoir with a rank window; the
    // Aggregator never sorts a group, just maintains ≤ 20 pairs.
    "udaf_reservoir_sample" -> ((s, d) => {
      import s.implicits._
      val res = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .agg(reservoirAgg[(String, Long, Long)](20,
          t => (aresPriority(t._2, t._3), t._2, t._3)).toColumn.name("res"))
        .toDF("source", "res")
      res.select(col("source"), posexplode(col("res")).as(Seq("i", "e")))
        .select(col("source"), (col("i") + 1).cast("long").as("rk"),
          col("e._2").as("doc_id"), col("e._3").as("n_chars"),
          floor(col("e._1") * lit(100000000.0)).cast("long").as("pri_c"))
        .orderBy("source", "rk")
    }),
    // Per-source 4-seed min-hash signature of the doc-id set, via a
    // custom typed Aggregator (merge = elementwise min — associative,
    // commutative, map-side combinable). Output long form (source, seed,
    // sig); the oracle recomputes each signature as min(md5-decode).
    "udaf_minhash_group" -> ((s, d) => {
      import s.implicits._
      val sig = Tables.documents(s, d)
        .select(col("source"), col("doc_id")).as[(String, Long)]
        .groupByKey(_._1)
        .agg(minHashAgg[(String, Long)](_._2).toColumn.name("sig"))
        .toDF("source", "sig")
      sig.select(col("source"), posexplode(col("sig")).as(Seq("seed", "sig")))
        .select(col("source"), col("seed").cast("long").as("seed"),
          col("sig"))
        .orderBy("source", "seed")
    }),

    // Event-type presence bitmask per user-id bucket (5 known types →
    // bits 0..4), OR-merged by a custom Aggregator; popcount alongside.
    "udaf_bitmask_or" -> ((s, d) => {
      import s.implicits._
      val typeBit =
        "case event_type when 'click' then 1 when 'error' then 2 " +
          "when 'purchase' then 4 when 'signup' then 8 " +
          "when 'view' then 16 else 32 end"
      val masks = Tables.events(s, d)
        .select(expr("user_id % 100").as("bucket"),
          expr(typeBit).cast("long").as("m"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .agg(bitOrAgg[(Long, Long)](_._2).toColumn.name("mask"))
        .toDF("bucket", "mask")
      masks.select(col("bucket"), col("mask"),
          expr("bit_count(mask)").cast("long").as("n_types"))
        .orderBy("bucket")
    }),

    // Per-type top-3 events by (canon value desc, event_id asc) via the
    // bounded-heap Aggregator — proven ≡ the row_number() window by the
    // oracle. The state never exceeds 3 pairs per group; nothing sorts.
    "udaf_topk_group" -> ((s, d) => {
      import s.implicits._
      val top = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * 10000).cast("long").as("vc"),
          col("event_id")).as[(String, Long, Long)]
        .groupByKey(_._1)
        .agg(top3Agg[(String, Long, Long)](t => (t._2, t._3))
          .toColumn.name("top"))
        .toDF("event_type", "top")
      top.select(col("event_type"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("event_type"), (col("i") + 1).cast("long").as("rk"),
          col("e._1").as("value_c"), col("e._2").as("event_id"))
        .orderBy("event_type", "rk")
    })
  )

  /** SQL replica of [[seedHash24]] for the oracle: md5 over
    * 'seed:id' decoded via the shared 6-hex-digit decode. */
  private def seedHashSql(seed: Int, idExpr: String): String =
    Sampling.hexDecodeSql(s"md5(CAST($seed AS VARCHAR) || ':' || " +
      s"CAST($idExpr AS VARCHAR))")

  def oracles: Map[String, String] = Map(
    "udaf_reservoir_sample" -> {
      val hv = Sampling.hexDecodeSql("m")
      s"""WITH u AS (SELECT source, doc_id, n_chars,
        |    md5(CAST(doc_id AS VARCHAR)) AS m FROM documents),
        |h AS (SELECT source, doc_id, n_chars, $hv AS hv FROM u),
        |p AS (SELECT source, doc_id, n_chars,
        |    -ln(CAST(hv + 1 AS DOUBLE) / 16777217.0) /
        |      greatest(CAST(n_chars AS DOUBLE), 1e-12) AS pri
        |  FROM h),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY pri, doc_id) AS rk FROM p)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars,
        |  CAST(floor(pri * 100000000.0) AS BIGINT) AS pri_c
        |FROM r WHERE rk <= 20 ORDER BY source, rk""".stripMargin
    },

    "udaf_minhash_group" -> {
      val seeds = (0 to 3).map(i =>
        s"SELECT source, CAST($i AS BIGINT) AS seed, " +
          s"CAST(min(${seedHashSql(i, "doc_id")}) AS BIGINT) AS sig " +
          "FROM documents GROUP BY source").mkString("\nUNION ALL\n")
      s"""$seeds
        |ORDER BY source, seed""".stripMargin
    },

    "udaf_bitmask_or" ->
      """WITH m AS (SELECT user_id % 100 AS bucket,
        |    CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |      WHEN 'view' THEN 16 ELSE 32 END AS m
        |  FROM events)
        |SELECT bucket, CAST(bit_or(m) AS BIGINT) AS mask,
        |  CAST(bit_count(bit_or(m)) AS BIGINT) AS n_types
        |FROM m GROUP BY bucket ORDER BY bucket""".stripMargin,

    "udaf_topk_group" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 10000) AS BIGINT) AS value_c, event_id
        |  FROM events),
        |rnk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY value_c DESC, event_id) AS rk FROM v)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, value_c, event_id
        |FROM rnk WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin
  )
}
