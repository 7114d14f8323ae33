#!/usr/bin/env python3
"""sf1-scale variant of check.py (the local t2 replica) for the 100x
confidence sweep.

Same FULL differential — every key of oracle_sql.json, Spark parquet vs
the DuckDB oracle on the same tables — but the row-by-row pandas compare
is replaced by an ORDER-INSENSITIVE DIGEST computed entirely inside
DuckDB: row count + SUM(hash(row)) over the name-sorted, VARCHAR-cast,
NULL-sentineled columns. Results with 100M+ rows (dedup_minhash_lsh
emits 190M pairs at sf1 — the pair count is a property of the corpus,
not a bug) compare in bounded memory; both sides go through the same
CAST rules so the compare stays exact up to hash-sum collisions
(negligible at 64-bit for a confidence sweep).

Usage: python3 tools/check_sf1.py <sfDir> <verifyOutDir> [--expect-all]
"""
import json, sys, glob, os
import duckdb

def digest(con, rel_sql):
    cols = sorted(r[0] for r in con.execute(f"DESCRIBE ({rel_sql})").fetchall())
    # chr(31) joins, chr(1) is the NULL sentinel: both unreachable in the
    # fixtures' text domain, so NULL never collides with a real value
    parts = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in cols)
    n, h = con.execute(
        f"SELECT count(*), COALESCE(SUM(CAST(hash(concat_ws(chr(31), {parts}))"
        f" AS HUGEINT)), 0) FROM ({rel_sql})").fetchone()
    return cols, n, h

def main(sf_dir, out_dir, expect_all=False):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/graft_duck_spill'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = 0
    fails = []
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            if expect_all:
                print(f"FAIL {name}: no result directory (full run expected)")
                n_fail += 1; fails.append(name)
            else:
                n_skip += 1
            continue
        try:
            sc, sn, sh = digest(con, f"SELECT * FROM read_parquet({files!r})")
            dc, dn, dh = digest(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1; fails.append(name); continue
        if sn != dn:
            print(f"FAIL {name}: rows {sn} vs {dn}")
            n_fail += 1; fails.append(name); continue
        if sh != dh:
            print(f"FAIL {name}: digest mismatch over {sn} rows")
            n_fail += 1; fails.append(name); continue
        print(f"PASS {name} ({sn} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} not-run")
    if fails:
        print("failed keys: " + " ".join(fails))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--expect-all" in sys.argv[3:]))
