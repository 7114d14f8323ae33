package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic-sketch API: a count-min sketch (heavy-hitter frequency
  * estimation in fixed memory) and a Bloom filter (existence pruning for
  * joins), both built from md5-derived hash positions so Spark and any
  * independent checker (e.g. a SQL engine) compute bit-identical sketches.
  *
  * Scale shapes:
  *  - sketch CONSTRUCTION pre-aggregates per item first (one map-side-
  *    combinable shuffle carrying one row per distinct item), then folds
  *    the vocabulary-sized count table into the fixed `depth × width`
  *    cell grid — the sketch size is independent of data volume, which is
  *    the entire point at 100 TB;
  *  - cell grids and bit sets are tiny (≤ depth·16^width rows) and always
  *    broadcast to probes;
  *  - estimates never underestimate (count-min guarantee); Bloom probes
  *    never produce false negatives — both properties are tested.
  */
object Sketches {

  private def bucket(seed: Column, item: Column, hexChars: Int): Column =
    substring(md5(concat(seed.cast("string"), lit(":"), item.cast("string"))),
      1, hexChars)

  private def seeds(n: Int): Column = explode(sequence(lit(0), lit(n - 1)))

  /** Count-min cell grid from a per-item count table `(item, cnt)`:
    * `depth` hash rows × `16^widthHexChars` buckets; cell = Σ cnt of items
    * hashing there. Mergeable across shards by cellwise addition. */
  def cmsCells(counts: DataFrame, item: Column, cnt: Column, depth: Int = 4,
               widthHexChars: Int = 2): DataFrame =
    counts.select(item.as("_graft_item"), cnt.as("_graft_cnt"))
      .withColumn("_graft_seed", seeds(depth))
      .withColumn("_graft_bucket",
        bucket(col("_graft_seed"), col("_graft_item"), widthHexChars))
      .groupBy("_graft_seed", "_graft_bucket")
      .agg(sum(col("_graft_cnt")).as("cell"))

  /** Count-min estimates for every distinct `item` in `df`, next to the
    * exact count: returns `(item, exact, est)` with `est ≥ exact` always
    * (the count-min one-sided error guarantee). The heavy lifting is the
    * single per-item count aggregate; the grid join is broadcast. */
  def countMin(df: DataFrame, item: Column, depth: Int = 4,
               widthHexChars: Int = 2): DataFrame = {
    val counts = df.select(item.as("_graft_item"))
      .groupBy("_graft_item").agg(count(lit(1)).as("_graft_cnt"))
    val cells = cmsCells(counts, col("_graft_item"), col("_graft_cnt"),
      depth, widthHexChars)
    counts
      .withColumn("_graft_seed", seeds(depth))
      .withColumn("_graft_bucket",
        bucket(col("_graft_seed"), col("_graft_item"), widthHexChars))
      .join(broadcast(cells), Seq("_graft_seed", "_graft_bucket"))
      .groupBy("_graft_item")
      .agg(max(col("_graft_cnt")).as("exact"), min(col("cell")).as("est"))
      .withColumnRenamed("_graft_item", "item")
  }

  /** K-minimum-values distinct-count sketch per group: among the
    * md5-derived uniforms of the group's distinct `id`s, the k-th
    * smallest value `u_k` estimates the distinct count as `(k−1)/u_k`
    * (the classic KMV estimator). Built exclusively from
    * [[Sampling.hashUniform]], so — unlike HLL — the estimate is
    * bit-reproducible by any independent SQL engine, which puts a
    * *sketch* under a differential oracle.
    *
    * Returns one row per group: `(group, n_exact, est)`; groups with
    * fewer than `k` distinct ids fall back to the exact count (the KMV
    * buffer isn't full — the sketch IS the exact set).
    *
    * Scale shape: one distinct shuffle on `(group, id)`, then the
    * k-smallest per group via the salted two-phase top-k (phase 1 keeps
    * each (group, salt) shard's local top-k; phase 2 ranks only the
    * ≤ k·nSalts survivors) — a group's full id set never sorts in a
    * single window partition. At 100 TB the per-group state is k rows. */
  def kmvDistinct(df: DataFrame, group: Column, id: Column, k: Int = 32,
                  nSalts: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = df.select(group.as("_graft_g"), id.as("_graft_id")).distinct()
      .withColumn("_graft_u", Sampling.hashUniform(col("_graft_id")))
      .withColumn("_graft_salt", pmod(hash(col("_graft_id")), lit(nSalts)))
    val wLocal = Window.partitionBy(col("_graft_g"), col("_graft_salt"))
      .orderBy(col("_graft_u"), col("_graft_id"))
    val wGroup = Window.partitionBy(col("_graft_g"))
      .orderBy(col("_graft_u"), col("_graft_id"))
    val exact = dist.groupBy("_graft_g").agg(count(lit(1)).as("n_exact"))
    val kth = dist
      .withColumn("_graft_lrk", row_number().over(wLocal))
      .filter(col("_graft_lrk") <= k)
      .withColumn("_graft_rk", row_number().over(wGroup))
      .filter(col("_graft_rk") === k)
      .select(col("_graft_g"), col("_graft_u").as("_graft_uk"))
    exact.join(kth, Seq("_graft_g"), "left")
      .select(col("_graft_g").as("group"), col("n_exact"),
        when(col("_graft_uk").isNotNull,
            lit((k - 1).toDouble) / col("_graft_uk"))
          .otherwise(col("n_exact").cast("double")).as("est"))
  }

  /** The KMV sketch CONTENT per group — the k smallest `(u, id)` pairs
    * of the group's distinct ids, 1-based rank included. This is the
    * mergeable form: set operations (union by re-rank, intersection by
    * inclusion–exclusion) compose from these rows. Same salted
    * two-phase top-k shape as [[kmvDistinct]]; ≤ k rows per group. */
  def kmvSketchRows(df: DataFrame, group: Column, id: Column, k: Int = 32,
                    nSalts: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = df.select(group.as("_graft_g"), id.as("_graft_id")).distinct()
      .withColumn("_graft_u", Sampling.hashUniform(col("_graft_id")))
      .withColumn("_graft_salt", pmod(hash(col("_graft_id")), lit(nSalts)))
    val wLocal = Window.partitionBy(col("_graft_g"), col("_graft_salt"))
      .orderBy(col("_graft_u"), col("_graft_id"))
    val wGroup = Window.partitionBy(col("_graft_g"))
      .orderBy(col("_graft_u"), col("_graft_id"))
    dist
      .withColumn("_graft_lrk", row_number().over(wLocal))
      .filter(col("_graft_lrk") <= k)
      .withColumn("_graft_rk", row_number().over(wGroup))
      .filter(col("_graft_rk") <= k)
      .select(col("_graft_g").as("group"), col("_graft_id").as("id"),
        col("_graft_u").as("u"), col("_graft_rk").as("rk"))
  }

  /** Bloom bit set of `build`'s keys: the distinct `(seed, slot)` pairs
    * occupied by `k` md5-derived positions per key in a `16^slotHexChars`-
    * slot space. At most `k·16^slotHexChars` rows regardless of build
    * size — always broadcastable. */
  def bloomBits(build: DataFrame, key: Column, k: Int = 3,
                slotHexChars: Int = 3): DataFrame =
    build.select(key.cast("string").as("_graft_k"))
      .withColumn("_graft_seed", seeds(k))
      .select(col("_graft_seed"),
        bucket(col("_graft_seed"), col("_graft_k"), slotHexChars)
          .as("_graft_slot"))
      .distinct()

  /** Probe `probe`'s `key` against a Bloom bit set: appends `bloom_pass`
    * (all `k` positions occupied — no false negatives by construction;
    * false positives at the filter's designed rate). Membership is
    * computed once per DISTINCT key, then joined back (a key-partitioned
    * shuffle join at scale; the bit-set side is broadcast). */
  def bloomProbe(probe: DataFrame, key: Column, bits: DataFrame, k: Int = 3,
                 slotHexChars: Int = 3): DataFrame = {
    val marked = probe.select(key.cast("string").as("_graft_k")).distinct()
      .withColumn("_graft_seed", seeds(k))
      .withColumn("_graft_slot",
        bucket(col("_graft_seed"), col("_graft_k"), slotHexChars))
      .join(broadcast(bits.withColumn("_graft_hit", lit(1L))),
        Seq("_graft_seed", "_graft_slot"), "left")
      .groupBy("_graft_k")
      .agg((sum(coalesce(col("_graft_hit"), lit(0L))) === k).as("bloom_pass"))
    probe.join(marked, key.cast("string") === col("_graft_k"), "left")
      .drop("_graft_k")
  }
}
