package graft.api

/** Shared DuckDB oracle SQL building blocks.
  *
  * The near-dup family's oracles all verify candidate pairs by
  * intersecting per-doc 5-gram shingle SETS. The original chained-CTE
  * form (`len(list_intersect(a.gs, b.gs))` over a length-banded
  * self-join) is exact but brute-forced by DuckDB: at sf1 it burns the
  * 600 s per-key sweep budget (the r11/r12 sweeps' only TIMEOUT class).
  * This block computes the identical pair relation through a dense
  * bitset encode instead — dictionary-encode the shingles, aggregate
  * each doc's set into one 4096-bit bitstring (`bitstring_agg`), and
  * verify with `bit_count(a.b & b.b)` — the same per-word AND+popcount
  * kernel the Spark dense path runs (`BitsetExpressions`). Identical
  * output (set intersect == popcount of the AND of the two indicator
  * vectors); measured 65.3 s -> 4.6 s at sf0.1 on dedup_containment's
  * oracle, digest-equal at sf0.01/sf0.1 on every key that swapped in
  * this block (BASELINE.md round 13).
  *
  * The 4096-bit width is a constant (bitstring_agg requires constant
  * bounds); the corpus dictionary is ~2.1k shingles at every SF. A
  * corpus that outgrows it fails LOUDLY through the error() guard
  * rather than truncating.
  */
object OracleSql {

  /** CTE chain ending in `pairs(d1, d2)`: the length-banded (±20
    * n_chars), same-language, Jaccard >= 0.7 near-dup pair relation
    * over 5-gram shingle sets of `base` (a relation with doc_id, lang,
    * n_chars, text). Callers append from `, edges AS (...)`. Also
    * leaves `p(d1, d2, shared, n1, n2)` in scope. Callers that only
    * need `p` (they apply their own threshold) pass
    * `withPairs = false` so the chain ends at `p` — DuckDB may honor
    * the MATERIALIZED hint even for an unreferenced trailing CTE, and
    * the 0.7 filter would then run for nothing.
    */
  def shingleJaccardPairs(base: String = "documents",
                          withPairs: Boolean = true): String =
    s"""gs0 AS MATERIALIZED (SELECT doc_id, lang, n_chars,
      |    list_distinct(list_transform(generate_series(1, greatest(length(text) - 4, 1)),
      |      i -> substr(text, i, 5))) AS gs
      |  FROM $base),
      |stok AS (SELECT doc_id, unnest(gs) AS tk FROM gs0),
      |sdict AS MATERIALIZED (SELECT tk, row_number() OVER (ORDER BY tk) - 1 AS tid
      |          FROM (SELECT DISTINCT tk FROM stok)),
      |sguard AS (SELECT CASE WHEN max(tid) < 4096 THEN 1 ELSE CAST(
      |    error('oracle shingle dictionary exceeds the 4096-bit bitset') AS INTEGER)
      |  END AS ok FROM sdict),
      |sbit AS (SELECT doc_id, bitstring_agg(tid, 0, 4095) AS b
      |         FROM stok JOIN sdict USING (tk) GROUP BY doc_id),
      |gsb AS MATERIALIZED (SELECT g.doc_id, g.lang, g.n_chars,
      |        g.n_chars // 20 AS bkt, len(g.gs) AS n, sb.b
      |        FROM gs0 g JOIN sbit sb USING (doc_id)),
      |gpr AS (SELECT gsb.*, unnest([bkt - 1, bkt, bkt + 1]) AS jb FROM gsb),
      |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
      |        bit_count(a.b & b.b) AS shared, a.n AS n1, b.n AS n2
      |      FROM gpr a JOIN gsb b ON a.lang = b.lang AND a.jb = b.bkt
      |        AND a.doc_id < b.doc_id
      |        AND abs(a.n_chars - b.n_chars) <= 20, sguard
      |      WHERE sguard.ok = 1)""".stripMargin + (if (withPairs)
    """,
      |pairs AS MATERIALIZED (SELECT d1, d2 FROM p
      |          WHERE shared * 1.0 / (n1 + n2 - shared) >= 0.7)""".stripMargin
    else "")

  /** CTE chunk `wdict, wguard, sets(doc_id, b, n)`: each doc's DISTINCT
    * word-token set dictionary-encoded into one 512-bit bitstring
    * (expects `tok(doc_id, …, tk)` in scope). Word-granularity variant
    * of the [[shingleJaccardPairs]] bitset verify: the former
    * `list_intersect` form materialized two word-list STRING columns
    * per candidate pair — at sf1's 190M-pair LSH candidate sets that
    * string traffic alone blew the sweep budget; `bit_count(a & b)`
    * verifies the same shared count with one 64-byte AND+popcount.
    * A corpus whose word dictionary outgrows 512 fails LOUDLY through
    * the wguard error() rather than truncating.
    */
  val wordBitsets: String =
    """wdict AS (SELECT tk, row_number() OVER (ORDER BY tk) - 1 AS tid
      |        FROM (SELECT DISTINCT tk FROM tok)),
      |wguard AS (SELECT CASE WHEN max(tid) < 512 THEN 1 ELSE CAST(
      |    error('oracle word dictionary exceeds the 512-bit bitset') AS INTEGER)
      |  END AS ok FROM wdict),
      |sets AS (SELECT doc_id, bitstring_agg(tid, 0, 511) AS b,
      |         count(DISTINCT tk) AS n
      |         FROM tok JOIN wdict USING (tk) GROUP BY doc_id)""".stripMargin
}
