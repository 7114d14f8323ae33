package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the §2.20 loop/recovery/layout operators,
  * checked against independent driver-side recomputation.
  */
class LoopOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  test("kmeans_train_iters: Lloyd objective never increases across the loop") {
    // J(a2, c1) — the operator's output — must be ≤ J(a1, c0), the
    // one-step objective: both update and reassignment are monotone.
    val out = SparkEntry.queries("kmeans_train_iters")(spark, d).collect()
    assert(out.nonEmpty && out.length <= 8)
    val j2 = out.map(_.getLong(2)).sum
    val emb = graft.io.Tables.embeddings(spark, d)
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
        .as("ev"))
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"ev".as("cv"))
    val j1 = emb.crossJoin(broadcast(cents))
      .select($"vec_id", expr(
        "aggregate(zip_with(ev, cv, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("sqd"))
      .groupBy("vec_id").agg(min("sqd").as("sqd"))
      .agg(sum("sqd")).as[Long].head()
    assert(j2 <= j1, s"Lloyd objective increased: $j1 -> $j2")
    // every vector assigned exactly once
    assert(out.map(_.getLong(1)).sum ==
      graft.io.Tables.embeddings(spark, d).count())
  }

  test("feed_snapshot_resume ≡ full-replay read model") {
    val resumed = SparkEntry.queries("feed_snapshot_resume")(spark, d)
      .collect().map(_.toSeq)
    val full = SparkEntry.queries("feed_read_model")(spark, d)
      .collect().map(_.toSeq)
    assert(resumed.toSeq == full.toSeq,
      "snapshot+tail merge must equal full replay (compaction associativity)")
    assert(resumed.nonEmpty)
  }

  test("zonemap_prune: skipping is lossless and actually skips") {
    val out = SparkEntry.queries("zonemap_prune")(spark, d).collect()
    assert(out.nonEmpty)
    val (scanned, total) = (out.head.getLong(4), out.head.getLong(3))
    assert(scanned < total, "the 7-day probe must prune some chunks")
    assert(scanned > 0)
    // per-type aggregates from the DIRECT filter — no chunk logic
    val direct = graft.io.Tables.events(spark, d)
      .filter($"ts_us" >= 1704844800000000L && $"ts_us" < 1705449600000000L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(floor($"value" * 10000).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      assert(direct(r.getString(0)) == ((r.getLong(1), r.getLong(2))))
    }
  }

  test("compaction_plan: groups partition the files, contiguous per day") {
    val out = SparkEntry.queries("compaction_plan")(spark, d).collect()
    val nFiles = graft.io.Tables.events(spark, d)
      .select(to_date(timestamp_micros($"ts_us")).as("day"),
        hour(timestamp_micros($"ts_us")).as("hr"))
      .distinct().count()
    assert(out.map(_.getLong(2)).sum == nFiles, "every file in exactly one group")
    out.groupBy(_.get(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // hour spans of consecutive groups never overlap
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
        case _ =>
      }
    }
  }

  test("manifest_diff: statuses consistent with both manifests") {
    val out = SparkEntry.queries("manifest_diff")(spark, d).collect()
    assert(out.nonEmpty)
    val statuses = out.map(_.getString(4)).toSet
    assert(statuses.contains("added"), "head-of-corpus files only in v2")
    out.foreach { r =>
      val (n1, n2, st) = (r.getLong(2), r.getLong(3), r.getString(4))
      st match {
        case "added"     => assert(n1 == 0 && n2 > 0)
        case "removed"   => assert(n1 > 0 && n2 == 0)
        case "unchanged" => assert(n1 == n2 && n1 > 0)
        case "changed"   => assert(n1 > 0 && n2 > 0)
      }
    }
  }

  test("trend_fit_group: slope reproduces from the collected sums") {
    val out = SparkEntry.queries("trend_fit_group")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (num, den, slope) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(den > 0, "x must vary within every group")
      val expect =
        if (num >= 0) num * 1000000L / den else -(-num * 1000000L / den)
      assert(slope == expect)
      // a ppm-scale slope of a bounded value over a month stays small
      assert(math.abs(slope) < 100000000L)
    }
  }
}
