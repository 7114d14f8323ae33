#!/usr/bin/env python3
"""Per-key medians across the committed quiet sf1 bench records.

BASELINE.md's standing argument: sf1 totals on this box are dominated by
+-20-30% run-to-run swings on the output-bound dedup keys, so rounds must
be graded against PER-KEY MEDIANS across the committed records, not any
single sweep. This script makes that concrete: it reads every committed
bench_full_sf1.json (one per round since r12), computes each key's median
and spread, and emits the markdown table BASELINE.md embeds for the
dedup-heavy keys plus any key whose cross-round max/min exceeds the
volatility threshold.

Usage:
    python3 tools/perkey_medians.py            # dedup-7 table for BASELINE.md
    python3 tools/perkey_medians.py --volatile # + every key with >1.3x spread
    python3 tools/perkey_medians.py --all      # every key, csv-ish
"""
import json
import statistics
import subprocess
import sys

# committed quiet sf1 records, oldest->newest (round label, git ref)
RECORDS = [
    ("r12", "df4d2a8"),
    ("r13", "ba7bd27"),
    ("r14", "125d7d2"),
    ("r15", "f25b164"),
    # append ("r16", "<commit>") when the round-16 record lands
]

DEDUP_HEAVY = [
    "dedup_minhash_lsh", "dedup_weighted_jaccard", "dedup_simhash",
    "dedup_incremental", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "text_span_dedup",
]
VOLATILITY = 1.3  # cross-round max/min above this is listed


def load(ref):
    out = subprocess.run(["git", "show", f"{ref}:bench_full_sf1.json"],
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out)["queries"]


def main():
    rows = {}
    labels = []
    for label, ref in RECORDS:
        try:
            qs = load(ref)
        except subprocess.CalledProcessError:
            print(f"WARN: no bench_full_sf1.json at {ref} ({label})",
                  file=sys.stderr)
            continue
        labels.append(label)
        for k, v in qs.items():
            if not k.startswith("_build") and v >= 0:
                rows.setdefault(k, {})[label] = v

    def stats(k):
        vals = [rows[k][l] for l in labels if l in rows[k]]
        return (statistics.median(vals), min(vals), max(vals),
                (max(vals) / min(vals)) if min(vals) > 0 else float("inf"))

    if "--all" in sys.argv:
        for k in sorted(rows):
            med, lo, hi, ratio = stats(k)
            print(f"{k},{med:.2f},{lo:.2f},{hi:.2f},{ratio:.2f}")
        return

    volatile = sorted(k for k in rows
                      if k not in DEDUP_HEAVY and len(rows[k]) >= 2
                      and stats(k)[3] > VOLATILITY and stats(k)[0] > 1.0) \
        if "--volatile" in sys.argv else []
    print("| key | " + " | ".join(labels) + " | median | max/min |")
    print("|---|" + "---|" * (len(labels) + 2))
    for group in (DEDUP_HEAVY, volatile):
        for k in group:
            if k not in rows:
                continue
            med, _, _, ratio = stats(k)
            cells = " | ".join(
                f"{rows[k][l]:.1f}" if l in rows[k] else "—" for l in labels)
            print(f"| `{k}` | {cells} | **{med:.1f}** | {ratio:.2f}× |")
        if group is DEDUP_HEAVY and volatile:
            print("| _volatile (>1.3× spread, >1 s median) below_ |" +
                  " |" * (len(labels) + 2))


if __name__ == "__main__":
    main()
