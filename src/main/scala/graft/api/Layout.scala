package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout API for scan efficiency at scale: Z-order (Morton) curve
  * values for multi-dimensional clustering — sort/partition 100 TB of
  * parquet by `zValue` and range predicates on EITHER key prune most
  * files via min/max footer stats — and key-salting for skew-resistant
  * shuffle joins.
  */
object Layout {

  /** Morton interleave of two `bits`-bit bucket coordinates (each in
    * `[0, 2^bits)`): bit i of `x` lands at position 2i+1, bit i of `y` at
    * 2i. Pure fixed-order integer arithmetic (no engine-specific bit
    * operators), so any SQL engine reproduces the value exactly. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      (floor(x / lit((1L << i).toDouble)).cast("long") % 2) * lit(1L << (2 * i + 1)) +
        (floor(y / lit((1L << i).toDouble)).cast("long") % 2) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** Skew-resistant equi-join of a large fact side against a dimension:
    * the fact side gets a deterministic per-row salt in `[0, nSalts)`
    * derived from `saltBy` (a unique row id — NEVER the join key, which
    * would put a hot key's rows back on one reducer), the dimension is
    * replicated once per salt, and the join runs on `(key, salt)` so a
    * hot key's probe rows spread over `nSalts` reducers. The dimension
    * side carries a shuffle-hash hint: salting targets exactly the case
    * where the dimension is too big to broadcast but small enough to
    * replicate `nSalts`-fold. Output equals the plain inner join on
    * `key` (both sides must expose the join key under the same name). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, nSalts: Int = 8): DataFrame = {
    val f = fact.withColumn("_graft_salt", pmod(hash(saltBy), lit(nSalts)))
    val d = dim.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(nSalts - 1)))).hint("shuffle_hash")
    f.join(d, Seq(key, "_graft_salt")).drop("_graft_salt")
  }
}
