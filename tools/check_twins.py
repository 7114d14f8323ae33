#!/usr/bin/env python3
"""Spark-vs-Spark digest equality for the forced-strategy twin queries.

Each pair/triple below computes the SAME relation under deliberately
different physical plans (broadcast vs forced-shuffle, bitset vs prefix
index). Their outputs must be digest-identical; at sf1 this is the
plan-independence check for keys whose chained-CTE DuckDB oracle is
quadratic and times out. Digests match check_sf1.py's definition.

Usage: python3 tools/check_twins.py <verifyOutDir>
"""
import sys, glob, os
import duckdb

TWINS = [
    ["dedup_minhash_lsh", "dedup_minhash_shuffle"],
    ["dedup_ngram_jaccard", "dedup_ngram_jaccard_prefix", "dedup_ngram_jaccard_shuffle"],
    ["dedup_weighted_jaccard", "dedup_weighted_jaccard_shuffle"],
    ["graph_kcore", "graph_kcore_shuffle"],
    ["dedup_cluster_cc", "dedup_cluster_cc_dist"],
    # round-12 additions: direct sf1 evidence for the former oracle-budget
    # gap keys (VERDICT r11 task 1) — algorithmic twins where possible
    ["dedup_containment", "dedup_containment_prefix"],
    ["dedup_incremental", "dedup_incremental_fullscan"],
    ["dedup_keep_best", "dedup_keep_best_dist"],
    ["graph_triangle_count", "graph_triangle_count_shuffle"],
    ["graph_jaccard_edges", "graph_jaccard_edges_shuffle"],
    ["dedup_survivorship_report", "dedup_survivorship_dist"],
    # round-13 addition: the composed corpus-health dashboard and its
    # prefix-pairs + distributed-CC twin (the survivorship-twin pattern)
    ["corpus_health_report", "corpus_health_dist"],
]

def digest(con, files):
    rel = f"SELECT * FROM read_parquet({files!r})"
    cols = sorted(r[0] for r in con.execute(f"DESCRIBE ({rel})").fetchall())
    parts = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in cols)
    n, h = con.execute(
        f"SELECT count(*), COALESCE(SUM(CAST(hash(concat_ws(chr(31), {parts}))"
        f" AS HUGEINT)), 0) FROM ({rel})").fetchone()
    return cols, n, h

def main(out_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/graft_duck_spill'")
    bad = 0
    for group in TWINS:
        digs = []
        for name in group:
            files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            if not files:
                print(f"SKIP {group}: {name} has no result"); digs = None; break
            digs.append((name, digest(con, files)))
        if not digs:
            continue
        base = digs[0][1]
        ok = all(d == base for _, d in digs)
        print(("PASS " if ok else "FAIL ") +
              " == ".join(n for n, _ in digs) + f" ({base[1]} rows)")
        bad += 0 if ok else 1
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
