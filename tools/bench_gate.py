"""Benchmark regression gate (reference methodology doc/results.md:28-35).

Compares a bench_all JSON-lines run against the committed baseline and
fails (exit 1) if any primitive regressed more than the threshold.

    python bench_all.py | tee bench_now.jsonl
    python tools/bench_gate.py bench_now.jsonl

CI runs this only when TPU hardware is present; the committed baseline
(BENCH_BASELINE.json) is refreshed whenever a round's numbers move.
"""

import json
import os
import sys

THRESHOLD = float(os.environ.get("BENCH_GATE_THRESHOLD", "0.10"))
BASELINE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_BASELINE.json")


def main(path: str) -> int:
    with open(BASELINE) as f:
        base = {r["metric"]: r for r in
                (json.loads(line) for line in f if line.strip())}
    failures = []
    seen = set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            r = json.loads(line)
            m = r.get("metric")
            if m not in base:
                print(f"  new metric {m}: {r.get('value')} {r.get('unit')}")
                continue
            seen.add(m)
            b, v = base[m]["value"], r["value"]
            ratio = v / b if b else 1.0
            tag = "OK" if ratio >= 1.0 - THRESHOLD else "REGRESSION"
            print(f"  {m}: {v:.1f} vs baseline {b:.1f} "
                  f"({ratio - 1:+.1%}) {tag}")
            if ratio < 1.0 - THRESHOLD:
                failures.append(m)
    missing = set(base) - seen
    for m in sorted(missing):
        print(f"  missing metric {m} (baseline {base[m]['value']})")
    if failures:
        print(f"FAILED: {len(failures)} regressed > {THRESHOLD:.0%}: "
              f"{failures}")
        return 1
    print("bench gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "bench_now.jsonl"))
