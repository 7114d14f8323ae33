#!/usr/bin/env python3
"""Oracle-side budget audit (verdict-r12 task 6 data collector).

Times ONLY the DuckDB oracle digest for every key in oracle_sql.json
against an sf dir — no Spark result parquets needed — so the full
412-key sf1 oracle cost is measurable in one pass. Any PASS-side oracle
within 2x of the 600 s sweep ceiling (>300 s) is a candidate for a
banded-oracle rewrite (the join_range_banded r12 pattern).

Usage: python3 tools/audit_oracle_times.py <sfDir> <oracleSqlJson>
       [--timeout N] [--only k1,k2] [--done FILE]
Prints one line per key: "OK <key> <secs>" or "TIMEOUT <key> <ceiling>".
"""
import json, sys, glob, os, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_sf1 import run_bounded, digest, Timeout
import duckdb


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    timeout = int(args[args.index("--timeout") + 1]) if "--timeout" in args else 600
    only = None
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))
    done = set()
    if "--done" in args:
        with open(args[args.index("--done") + 1]) as f:
            done = {l.split()[1] for l in f if l.startswith(("OK", "TIMEOUT"))}
    with open(oracle_json) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
    if "GRAFT_DUCK_THREADS" in os.environ:
        con.execute(f"SET threads={os.environ['GRAFT_DUCK_THREADS']}")
    spill = os.environ.get("GRAFT_DUCK_TMP", "/tmp/graft_duck_audit")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    for name in sorted(oracles):
        if (only and name not in only) or name in done:
            continue
        t0 = time.monotonic()
        try:
            _, n, _ = digest(con, oracles[name], timeout)
            print(f"OK {name} {time.monotonic() - t0:.1f} rows={n}", flush=True)
        except Timeout:
            print(f"TIMEOUT {name} {timeout}", flush=True)
        except Exception as e:
            print(f"FAIL {name} {e}", flush=True)


if __name__ == "__main__":
    main()
