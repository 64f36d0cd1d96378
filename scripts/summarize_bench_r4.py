"""Summarize bench_r4_auto.jsonl (+ BENCH_MATRIX.jsonl) into the
round-4 tables for BENCH.md: per-primitive best rows, fused/value A/B
winners, phase profiles, ICI calibration.

    python scripts/summarize_bench_r4.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R2 = {  # BENCH_BASELINE.json snapshot (round 2) for the delta column
    "bfs_do_rmat20": 1032.9, "sssp_rmat20": 26.1, "pr_rmat20": 465.0,
    "hits_rmat20": 467.0, "cc_rmat20": 366.0, "bc_rmat20": 81.0,
    "bfs_deep_grid1024": 4.7, "tc_rmat17": None,
}
REF = {  # K40c soc-orkut reference rows (BASELINE.md)
    "bfs_do_rmat20": 38165.0, "sssp_rmat20": 216.7, "pr_rmat20": 1228.5,
    "cc_rmat20": 1004.9, "bc_rmat20": 1069.5,
}


def rows(path):
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    pass


def main():
    best = {}
    misc = []
    for r in list(rows(os.path.join(ROOT, "bench_r4_auto.jsonl"))) + \
            list(rows(os.path.join(ROOT, "BENCH_MATRIX.jsonl"))):
        m = r.get("metric", "")
        if "value" in r and r.get("unit") in ("MTEPS", None):
            if m not in best or r["value"] > best[m]["value"]:
                best[m] = r
        else:
            misc.append(r)
    print("| metric | round 4 | ms | round 2 | ref (K40c) |")
    print("|---|---:|---:|---:|---:|")
    for m in sorted(best):
        r = best[m]
        r2 = R2.get(m)
        ref = REF.get(m)
        print(f"| {m} | {r['value']} | {r.get('elapsed_ms', '')} | "
              f"{r2 if r2 is not None else ''} | "
              f"{ref if ref is not None else ''} |")
    print()
    for r in misc:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
