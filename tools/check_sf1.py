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

A handful of oracle SQLs are quadratic pair generators that DuckDB
brute-forces (the Spark plans band/bucket them; chained-CTE SQL can't) —
at sf1 those single-handedly run for hours. --timeout N (seconds,
default 600) interrupts any one key's compare and reports it TIMEOUT
instead of blocking the sweep; timed-out keys get their secondary
checks (forced-shuffle twin digest equality, counts) recorded in
BASELINE.md. --done FILE skips keys already verified (one per line) so
an interrupted sweep resumes.

Usage: python3 tools/check_sf1.py <sfDir> <verifyOutDir>
       [--expect-all] [--timeout N] [--done FILE]
"""
import json, sys, glob, os, threading, time
import duckdb

# The oracle SQL relies on version-sensitive DuckDB syntax (notably
# positional struct indexing z[1]/z[2] on list_zip elements, whose
# structs are UNNAMED in 1.0.x so named extraction is impossible —
# ops/Pipeline.scala weightedJaccardSql). Fail loudly on an engine
# upgrade instead of silently changing oracle semantics.
PINNED_DUCKDB = "1.0."
assert duckdb.__version__.startswith(PINNED_DUCKDB), (
    f"oracle SQL is pinned to DuckDB {PINNED_DUCKDB}x, found "
    f"{duckdb.__version__}; re-validate the positional-struct and "
    "bitstring_agg oracles before bumping this pin")

class Timeout(Exception):
    pass

def run_bounded(con, sql, timeout):
    """Execute with a PER-STATEMENT interrupt timer. A single timer around
    a multi-statement block can fire in the gap between statements, where
    DuckDB's interrupt is a no-op — and the next statement then runs
    unbounded (observed wedging the sharded sf1 sweep).

    The `fired` flag closes the completion race: the timer can fire AFTER
    fetchall() returned but BEFORE cancel(), leaving a stale interrupt
    armed on the shared connection that would spuriously TIMEOUT the next
    (fast) statement. When the statement completed despite a fire, a
    no-op statement absorbs the stale interrupt."""
    fired = threading.Event()

    def _interrupt():
        fired.set()
        con.interrupt()

    timer = threading.Timer(timeout, _interrupt)
    timer.start()
    try:
        rows = con.execute(sql).fetchall()
    except (duckdb.InterruptException, RuntimeError) as e:
        if "INTERRUPT" in str(e).upper() or isinstance(e, duckdb.InterruptException):
            raise Timeout()
        raise
    finally:
        timer.cancel()
        # cancel() does not wait for an in-flight callback: join() makes
        # `fired` final AND guarantees any interrupt has been delivered
        # before the absorber below runs (otherwise the callback could
        # land its interrupt after the absorber completed, re-arming the
        # exact stale interrupt this closes)
        timer.join()
    if fired.is_set():
        # completed anyway — swallow the possibly-pending stale interrupt
        try:
            con.execute("SELECT 1").fetchall()
        except (duckdb.InterruptException, RuntimeError):
            pass
    return rows

def digest(con, rel_sql, timeout):
    cols = sorted(r[0] for r in
                  run_bounded(con, f"DESCRIBE ({rel_sql})", timeout))
    # chr(31) joins, chr(1) is the NULL sentinel: both unreachable in the
    # fixtures' text domain, so NULL never collides with a real value
    parts = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in cols)
    n, h = run_bounded(con,
        f"SELECT count(*), COALESCE(SUM(CAST(hash(concat_ws(chr(31), {parts}))"
        f" AS HUGEINT)), 0) FROM ({rel_sql})", timeout)[0]
    return cols, n, h

def main(sf_dir, out_dir, expect_all=False, timeout=600, done=frozenset()):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    # GRAFT_DUCK_MEM lets sharded parallel runs split the box's RAM
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
    if "GRAFT_DUCK_THREADS" in os.environ:
        con.execute(f"SET threads={os.environ['GRAFT_DUCK_THREADS']}")
    # GRAFT_DUCK_TMP gives each parallel shard its OWN spill dir — two
    # DuckDB processes sharing one temp_directory collide on the spill
    # file names and abort each other (observed: IOException "Could not
    # remove duckdb_temp_storage-N.tmp" killing 3 of 4 shards)
    spill = os.environ.get("GRAFT_DUCK_TMP", "/tmp/graft_duck_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = n_timeout = 0
    fails, timeouts = [], []
    n_resumed = 0
    for name in sorted(oracles):
        if name in done:
            n_resumed += 1
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            if expect_all:
                print(f"FAIL {name}: no result directory (full run expected)")
                n_fail += 1; fails.append(name)
            else:
                n_skip += 1
            continue
        t0 = time.monotonic()
        try:
            sc, sn, sh = digest(con, f"SELECT * FROM read_parquet({files!r})",
                                timeout)
            t_spark_side = time.monotonic() - t0
            dc, dn, dh = digest(con, oracles[name], timeout)
        except Timeout:
            print(f"TIMEOUT {name}: oracle exceeded {timeout}s", flush=True)
            n_timeout += 1; timeouts.append(name)
            continue
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            n_fail += 1; fails.append(name); continue
        # per-key oracle seconds: the budget audit — any PASS within 2x of
        # the timeout ceiling is a candidate for a banded-oracle rewrite
        t_oracle = time.monotonic() - t0 - t_spark_side
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1; fails.append(name); continue
        if sn != dn:
            print(f"FAIL {name}: rows {sn} vs {dn}")
            n_fail += 1; fails.append(name); continue
        if sh != dh:
            print(f"FAIL {name}: digest mismatch over {sn} rows")
            n_fail += 1; fails.append(name); continue
        print(f"PASS {name} ({sn} rows, oracle {t_oracle:.1f}s)", flush=True)
        n_pass += 1
    # bounded-error differential for the oracle-exempt approximate key
    # (same contract as check.py: within 3x the documented rsd of exact)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check import check_approx_bound
    # the exact COUNT(DISTINCT) rides run_bounded like every sweep oracle
    # — a wedge there must trip the interrupt timer, not stall the sweep
    try:
        ok, msg = check_approx_bound(con, out_dir, expect_all,
            run=lambda sql: run_bounded(con, sql, timeout))
    except Timeout:
        ok, msg = None, ""
        print(f"TIMEOUT agg_approx_distinct[bound] (> {timeout}s)")
        n_timeout += 1; timeouts.append("agg_approx_distinct[bound]")
    if ok is not None:
        print(msg)
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_resumed} resumed / {n_fail} fail / "
          f"{n_timeout} timeout / {n_skip} not-run")
    if fails:
        print("failed keys: " + " ".join(fails))
    if timeouts:
        print("timeout keys: " + " ".join(timeouts))
    # distinct exit codes so automation can't read a wedged/partial sweep
    # as green: 1 = mismatch, 2 = no mismatch but timeouts under
    # --expect-all (sweep incomplete — secondary evidence required)
    if n_fail:
        return 1
    if expect_all and n_timeout:
        return 2
    return 0

if __name__ == "__main__":
    args = sys.argv[3:]
    timeout = int(args[args.index("--timeout") + 1]) if "--timeout" in args else 600
    done = frozenset()
    if "--done" in args:
        with open(args[args.index("--done") + 1]) as f:
            done = frozenset(l.strip() for l in f if l.strip())
    sys.exit(main(sys.argv[1], sys.argv[2], "--expect-all" in args,
                  timeout, done))
