package graft.udf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Set-similarity kernel over token arrays (§2.9): Jaccard = |A∩B| / |A∪B|
  * on DISTINCT tokens. Used by the near-dup verification path and exposed
  * as both a Scala UDF (the extension-point showcase) and a native
  * HOF-composed Column (the codegen'd hot path). Tests assert the two are
  * equal on arbitrary inputs.
  */
object JaccardTokens {

  val jaccardFn: (Seq[String], Seq[String]) => Double = (a, b) => {
    val sa = if (a == null) Set.empty[String] else a.toSet
    val sb = if (b == null) Set.empty[String] else b.toSet
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else (sa & sb).size.toDouble / union
  }

  val jaccardUdf = udf(jaccardFn)

  /** Native equivalent: array_intersect/size on pre-distinct arrays. */
  def jaccardNative(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = (size(da) + size(db)).cast("double") - inter
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("jaccard_tokens", jaccardFn)
}
