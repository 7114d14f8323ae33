package graft

import org.scalatest.funsuite.AnyFunSuite

/** One smoke test per SURVEY.md §2 contract row: the query runs at
  * sf0.001, returns a well-formed schema, and (for rows where emptiness
  * would mean a broken operator) a non-empty result. The DuckDB
  * hash-compare itself is the driver's t2 gate; this suite catches plan
  * regressions (analysis errors, schema drift) in `sbt test`.
  */
class OperatorSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  /** Rows that are legitimately empty at sf0.001. */
  private val mayBeEmpty = Set("feed_empty_tail", "join_anti", "set_except",
    "text_dedup_exact", "text_dedup_near", "jaccard_tokens")

  test("every oracle key has a matching query (driver contract)") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    // only the sketch aggregate is oracle-exempt (SURVEY §2.3)
    assert((qs -- os) === Set("agg_approx_distinct"))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"operator $name runs at sf0.001") {
      val df = fn(spark, d)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
