package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling & vocabulary-selection API. Every pseudo-random
  * ingredient derives from md5 of a unique row id — stable across engines,
  * reruns, and repartitioning, where `rand()` is none of those (the same
  * design rule as [[Curation.sampleByHash]] and [[Corpus.shuffleOrder]]).
  *
  * Scale shapes:
  *  - weighted sampling is a map-only priority computation + one global
  *    top-k (`TakeOrderedAndProject` — no global sort materializes);
  *  - per-group quotas use a window PARTITIONED by the group (never a
  *    global single-partition window);
  *  - vocabulary coverage windows run over the VOCABULARY-sized count
  *    table, not over token instances.
  */
object Sampling {

  /** Uniform u ∈ (0, 1] derived from the first 6 hex digits of
    * `md5(id)`: pure `ascii`/arithmetic hex decode (fixed-order integer
    * sum — no engine-specific `conv`), then `(h + 1) / (16^6 + 1)`. Any
    * SQL engine reproduces the value exactly. */
  def hashUniform(id: Column): Column = {
    val m = md5(id.cast("string"))
    val h = (1 to 6).map { i =>
      val a = ascii(substring(m, i, 1))
      val digit = when(a >= 97, a - 87).otherwise(a - 48)
      digit.cast("long") * lit(1L << (4 * (6 - i)))
    }.reduce(_ + _)
    (h + lit(1.0)) / lit(16777217.0)
  }

  /** Raw 24-bit integer decode h ∈ [0, 2²⁴) of `md5(id)`'s first 6 hex
    * digits — the integer [[hashUniform]] is built on, for callers that
    * compare against integer thresholds directly (inverse-CDF ladders)
    * instead of round-tripping through a double. SQL twin:
    * [[hexDecodeSql]]. */
  def hashDecode24(id: Column): Column = {
    val m = md5(id.cast("string"))
    (1 to 6).map { i =>
      val a = ascii(substring(m, i, 1))
      val digit = when(a >= 97, a - 87).otherwise(a - 48)
      digit.cast("long") * lit(1L << (4 * (6 - i)))
    }.reduce(_ + _)
  }

  /** Deterministic bucket in [0, k): the same 6-hex-digit integer decode
    * as [[hashUniform]], taken mod k. Used for fold/split assignment —
    * reproducible in any SQL engine via [[hexDecodeSql]] `% k`. */
  def hashBucket(id: Column, k: Int): Column = {
    val m = md5(id.cast("string"))
    val h = (1 to 6).map { i =>
      val a = ascii(substring(m, i, 1))
      val digit = when(a >= 97, a - 87).otherwise(a - 48)
      digit.cast("long") * lit(1L << (4 * (6 - i)))
    }.reduce(_ + _)
    pmod(h, lit(k.toLong))
  }

  /** SQL (DuckDB/ANSI) replica of [[hashUniform]]'s 6-hex-digit decode,
    * for oracle generators: fixed-order integer sum of ascii-decoded digit
    * values over `m` (an md5 hex string expression). Kept NEXT TO
    * [[hashUniform]] so the two can never silently desynchronize — every
    * oracle that checks a hashUniform-derived result must build its
    * decode from here. */
  def hexDecodeSql(m: String): String =
    (1 to 6).map { i =>
      val mult = 1L << (4 * (6 - i))
      s"(CASE WHEN ascii(substr($m, $i, 1)) >= 97 THEN ascii(substr($m, $i, 1)) - 87 " +
        s"ELSE ascii(substr($m, $i, 1)) - 48 END) * $mult"
    }.mkString(" + ")

  /** Weighted sample without replacement (Efraimidis–Spirakis A-Res): each
    * row gets priority `-ln(u) / w` (u = [[hashUniform]] of `id`, w =
    * `weight`, clamped ≥ 1e-12) and the k smallest priorities win —
    * inclusion probability proportional to weight, deterministic given
    * ids. Returns the sampled rows with their `priority`. Map-only
    * scoring + global top-k: the full data is never sorted. */
  def sampleWeighted(df: DataFrame, id: Column, weight: Column,
                     k: Int): DataFrame =
    df.withColumn("priority",
        -log(hashUniform(id)) / greatest(weight.cast("double"), lit(1e-12)))
      .orderBy(col("priority"), id)
      .limit(k)

  /** Deterministic per-group quota sample: the first `k` rows of each
    * `group` in `(md5(id), id)` order. Appends `sample_rank` (1-based).
    *
    * Scale-safe two-phase top-k: a single window partitioned only by the
    * group would sort each group's ENTIRE data in one task (for a
    * low-cardinality group column at 100 TB, a handful of giant
    * partitions). Instead phase 1 keeps each (group, salt) shard's local
    * top-k — the global top-k is always contained in the union of the
    * shards' top-k — and phase 2 ranks only the ≤ k·nSalts survivors per
    * group. The salt affects the physical plan, never the result. */
  def samplePerGroup(df: DataFrame, group: Column, id: Column,
                     k: Int, nSalts: Int = 64): DataFrame = {
    val keyed = df.withColumn("_graft_skey", md5(id.cast("string")))
      .withColumn("_graft_salt", pmod(hash(id), lit(nSalts)))
    val wLocal = Window.partitionBy(group, col("_graft_salt"))
      .orderBy(col("_graft_skey"), id)
    val wGroup = Window.partitionBy(group).orderBy(col("_graft_skey"), id)
    keyed
      .withColumn("_graft_lrk", row_number().over(wLocal))
      .filter(col("_graft_lrk") <= k)
      .withColumn("sample_rank", row_number().over(wGroup).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("_graft_skey", "_graft_salt", "_graft_lrk")
  }

  /** Vocabulary truncation by cumulative coverage: per `group`, order
    * items by `(cnt DESC, item)` and keep the smallest prefix reaching
    * `pctTimes100`% of total instances — an item stays while the
    * cumulative count BEFORE it is under the threshold, so the first item
    * at or past the line is included and coverage is reached. All-integer
    * arithmetic (`cum_before · 100 < total · pct`): engine-portable with
    * no float thresholds. Input `counts` must be one row per (group,
    * item) with an integer `cnt` column; windows run over this
    * VOCABULARY-sized relation, never over instances. Appends `vrank`,
    * `cum` (inclusive) and keeps qualifying rows. */
  def vocabCoverage(counts: DataFrame, group: Column, item: Column,
                    cnt: Column, pctTimes100: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(cnt.desc, item)
    val tot = Window.partitionBy(group)
    counts
      .withColumn("vrank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(cnt).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_graft_tot", sum(cnt).over(tot))
      .filter((col("cum") - cnt) * 100 < col("_graft_tot") * pctTimes100)
      .drop("_graft_tot")
  }
}
