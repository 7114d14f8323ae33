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

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TrainOps.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components: long path (diameter 300) fully collapses") {
    val path = (0L until 300L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size === 301)
    assert(got.values.toSet === Set(0L), "every path node must label to node 0")
  }

  test("connected components: star, clique, and disjoint components") {
    val star = (1L to 50L).map(i => (100L, 100L + i))
    val clique = for (i <- 200L to 205L; j <- (i + 1) to 205L) yield (i, j)
    val pair = Seq((900L, 901L))
    val got = cc(star ++ clique ++ pair)
    assert(got(100L) === 100L && got(150L) === 100L)
    assert((200L to 205L).forall(got(_) === 200L))
    assert(got(900L) === 900L && got(901L) === 900L)
    // representative is always the component minimum and a member
    got.foreach { case (n, rep) => assert(rep <= n) }
  }

  test("connected components: random graphs agree with brute-force union-find") {
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
      assert(cc(edges) === expected)
    }
  }

  test("sample_stratified is a subset, deterministic, and lang-complete at sf0.001") {
    val q = TrainOps.queries("sample_stratified")
    val a = q(spark, TestSpark.sfDir).collect().map(_.getLong(0)).toSeq
    val b = q(spark, TestSpark.sfDir).collect().map(_.getLong(0)).toSeq
    assert(a === b, "hash sampling must be deterministic across runs")
    assert(a.nonEmpty && a.length < 500)
  }
}
