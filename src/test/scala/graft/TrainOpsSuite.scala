package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TrainOps

import scala.util.Random

/** Unit tests for the training-curation kernels, most importantly the
  * connected-components routine: hook + pointer-jumping compression must
  * converge within the round cap even on adversarial graph shapes (a long
  * path is the worst case for plain hook-only label propagation, whose
  * round count grows with the component diameter).
  */
class TrainOpsSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** driverLimit=0 forces the distributed hook+compress path; the default
    * exercises the driver union-find path. Both must agree. */
  private def cc(edges: Seq[(Long, Long)], distributed: Boolean): Map[Long, Long] =
    TrainOps.connectedComponents(edges.toDF("src", "dst"),
        driverLimit = if (distributed) 0 else 1000000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components: long path (diameter 300) fully collapses (both paths)") {
    val path = (0L until 300L).map(i => (i, i + 1))
    for (distributed <- Seq(true, false)) {
      val got = cc(path, distributed)
      assert(got.size === 301)
      assert(got.values.toSet === Set(0L),
        s"every path node must label to node 0 (distributed=$distributed)")
    }
  }

  test("connected components: star, clique, and disjoint components (both paths)") {
    val star = (1L to 50L).map(i => (100L, 100L + i))
    val clique = for (i <- 200L to 205L; j <- (i + 1) to 205L) yield (i, j)
    val pair = Seq((900L, 901L))
    for (distributed <- Seq(true, false)) {
      val got = cc(star ++ clique ++ pair, distributed)
      assert(got(100L) === 100L && got(150L) === 100L)
      assert((200L to 205L).forall(got(_) === 200L))
      assert(got(900L) === 900L && got(901L) === 900L)
      // representative is always the component minimum and a member
      got.foreach { case (n, rep) => assert(rep <= n) }
    }
  }

  test("connected components: random graphs, both paths agree with union-find") {
    val rnd = new Random(7)
    for (_ <- 1 to 3) {
      val n = 120
      val edges = Seq.fill(140)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // brute-force union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.foreach { case (a, b) => union(a, b) }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(cc(edges, distributed = true) === expected)
      assert(cc(edges, distributed = false) === expected)
    }
  }

  test("strictDedupLabels: cached per (session, dir), equals a fresh CC, and twins bypass it") {
    val d = "/root/testdata/sf0.001"
    val cached1 = TrainOps.strictDedupLabels(spark, d)
    val cached2 = TrainOps.strictDedupLabels(spark, d)
    // one build per (session, dataset): the second call returns the SAME
    // cached DataFrame instance, not a re-derivation
    assert(cached1 eq cached2)
    // the cached labeling is exactly connectedComponents over the strict
    // pair graph derived fresh
    val freshPairs = graft.ops.Pipeline.queries("dedup_ngram_jaccard")(spark, d)
      .select(org.apache.spark.sql.functions.col("d1"),
        org.apache.spark.sql.functions.col("d2"))
    val fresh = TrainOps.connectedComponents(freshPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cachedSet = cached1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cachedSet === fresh)
    // the _dist twin stays on its forced independent path: its result must
    // agree without having gone through the cache (it derives prefix-path
    // pairs + driverLimit=0 CC; equality here is the twin contract)
    val dist = TrainOps.queries("dedup_cluster_cc_dist")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dist === fresh)
  }

  test("sample_stratified is a subset, deterministic, and lang-complete at sf0.001") {
    val q = TrainOps.queries("sample_stratified")
    val a = q(spark, TestSpark.sfDir).collect().map(_.getLong(0)).toSeq
    val b = q(spark, TestSpark.sfDir).collect().map(_.getLong(0)).toSeq
    assert(a === b, "hash sampling must be deterministic across runs")
    assert(a.nonEmpty && a.length < 500)
  }
}
