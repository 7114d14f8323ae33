package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** §2.37 distributed ML training steps — the aggregate-shaped inner
  * loops of classical ML expressed as exact Spark aggregations: the
  * normal-equation moment accumulation of linear regression (Xᵀ X, Xᵀ y
  * as ONE map-side-combinable pass) and decision-stump split finding
  * (the per-feature histogram + cumulative split scan of every GBDT
  * implementation).
  *
  * Scale shapes (100 TB notes):
  *  - linreg_normal_acc: the whole step is ONE aggregate with
  *    (p+1)² + (p+1) cells of BIGINT state over canon-quantized
  *    features — the classic "sufficient statistics" shuffle that makes
  *    linear models trainable at any scale (driver-side solve of the
  *    tiny system is out of the engine's scope by design);
  *  - stump_split_gain: candidate splits come from the value-bounded
  *    feature histogram; left/right class counts are prefix sums over
  *    that histogram (windows over bands, never rows). The weighted
  *    Gini is evaluated on doubles derived from exact integers with an
  *    IDENTICAL expression tree in both engines, then floor-quantized.
  */
object MlOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Normal-equation sufficient statistics for predicting quantity
    // from (1, discount_c, tax_c, price_unit): Xᵀ X and Xᵀ y entries in
    // long form (i, j, xtx / i, xty) — every sum exact BIGINT over
    // canon features; merge-order independent by construction.
    "linreg_normal_acc" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        lit(1L).as("x0"),
        floor(col("l_discount") * 100).cast("long").as("x1"),
        floor(col("l_tax") * 100).cast("long").as("x2"),
        floor(col("l_extendedprice")).cast("long").as("x3"),
        floor(col("l_quantity")).cast("long").as("y"))
      val xs = Seq("x0", "x1", "x2", "x3")
      val aggs =
        (for (i <- xs.indices; j <- xs.indices if j >= i)
          yield sum(col(xs(i)) * col(xs(j))).as(s"xtx_${i}_$j")) ++
        xs.indices.map(i => sum(col(xs(i)) * col("y")).as(s"xty_$i"))
      val acc = li.agg(aggs.head, aggs.tail: _*)
      val rows =
        (for (i <- xs.indices; j <- xs.indices if j >= i)
          yield struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
            lit("xtx").as("kind"), col(s"xtx_${i}_$j").as("v"))) ++
        xs.indices.map(i => struct(lit(i.toLong).as("i"),
          lit(-1L).as("j"), lit("xty").as("kind"), col(s"xty_$i").as("v")))
      acc.select(explode(array(rows: _*)).as("r"))
        .select(col("r.i").as("i"), col("r.j").as("j"),
          col("r.kind").as("kind"), col("r.v").as("v"))
        .orderBy("kind", "i", "j")
    }),

    // Decision-stump split finding on the n_chars histogram for the
    // binary target lang = 'en': for every candidate boundary (split at
    // band b: left = bands ≤ b), the weighted Gini impurity — minimized
    // row first. Doubles enter only AFTER exact integer prefix sums,
    // with the same expression tree in both engines, then canon(1e6).
    "stump_split_gain" -> ((s, d) => {
      val hist = Tables.documents(s, d)
        .select(expr("n_chars div 25").as("band"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      val wC = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wT = Window.partitionBy()
      val scored = hist
        .withColumn("nl", sum("n").over(wC))
        .withColumn("posl", sum("pos").over(wC))
        .withColumn("nt", sum("n").over(wT))
        .withColumn("post", sum("pos").over(wT))
        .filter(col("nl") < col("nt")) // a split must leave a right side
        .withColumn("nr", col("nt") - col("nl"))
        .withColumn("posr", col("post") - col("posl"))
        .withColumn("negl", col("nl") - col("posl"))
        .withColumn("negr", col("nr") - col("posr"))
        .withColumn("gini_c", floor((
          (col("nl").cast("double") -
            (col("posl") * col("posl") + col("negl") * col("negl"))
              .cast("double") / col("nl").cast("double")) +
          (col("nr").cast("double") -
            (col("posr") * col("posr") + col("negr") * col("negr"))
              .cast("double") / col("nr").cast("double"))) /
          col("nt").cast("double") * lit(1000000.0)).cast("long"))
      scored.select("band", "nl", "nr", "posl", "posr", "gini_c")
        .orderBy("gini_c", "band")
        .limit(10)
        .orderBy("band")
    })
  )

  def oracles: Map[String, String] = Map(
    "linreg_normal_acc" -> {
      val xs = Seq("CAST(1 AS BIGINT)",
        "CAST(floor(l_discount * 100) AS BIGINT)",
        "CAST(floor(l_tax * 100) AS BIGINT)",
        "CAST(floor(l_extendedprice) AS BIGINT)")
      val xtx = for (i <- xs.indices; j <- xs.indices if j >= i) yield
        s"SELECT CAST($i AS BIGINT) AS i, CAST($j AS BIGINT) AS j, " +
          s"'xtx' AS kind, CAST(sum((${xs(i)}) * (${xs(j)})) AS BIGINT) AS v " +
          "FROM li"
      val xty = xs.indices.map(i =>
        s"SELECT CAST($i AS BIGINT), CAST(-1 AS BIGINT), 'xty', " +
          s"CAST(sum((${xs(i)}) * y) AS BIGINT) FROM li")
      s"""WITH li AS (SELECT l_discount, l_tax, l_extendedprice,
        |    CAST(floor(l_quantity) AS BIGINT) AS y FROM lineitem)
        |${(xtx ++ xty).mkString("\nUNION ALL\n")}
        |ORDER BY kind, i, j""".stripMargin
    },

    "stump_split_gain" ->
      """WITH h AS (SELECT n_chars // 25 AS band, count(*) AS n,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos
        |  FROM documents GROUP BY 1),
        |c AS (SELECT *, CAST(sum(n) OVER (ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS nl,
        |    CAST(sum(pos) OVER (ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS posl,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt,
        |    CAST(sum(pos) OVER () AS BIGINT) AS post
        |  FROM h),
        |sp AS (SELECT *, nt - nl AS nr, post - posl AS posr,
        |    nl - posl AS negl, (nt - nl) - (post - posl) AS negr
        |  FROM c WHERE nl < nt),
        |g AS (SELECT band, nl, nr, posl, posr,
        |    CAST(floor((
        |      (CAST(nl AS DOUBLE) -
        |        CAST(posl * posl + negl * negl AS DOUBLE) / CAST(nl AS DOUBLE)) +
        |      (CAST(nr AS DOUBLE) -
        |        CAST(posr * posr + negr * negr AS DOUBLE) / CAST(nr AS DOUBLE))
        |    ) / CAST(nt AS DOUBLE) * 1000000.0) AS BIGINT) AS gini_c
        |  FROM sp)
        |SELECT * FROM (SELECT * FROM g ORDER BY gini_c, band LIMIT 10)
        |ORDER BY band""".stripMargin
  )
}
