#!/usr/bin/env python
"""Performance regression gate (SURVEY.md §4.7).

Runs the bench, appends to benchmarks/history.jsonl, and exits nonzero if
the new number regresses >10% against the best recorded value. Only
meaningful on real TPU runners; skips (exit 0) on other backends.

    python tools/perf_check.py [--config CONFIG] [--threshold 0.10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)  # bench.py lives at the repo root
HIST = os.path.join(_ROOT, "benchmarks", "history.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--threshold", type=float, default=0.10)
    ap.add_argument("--record-only", action="store_true")
    args = ap.parse_args()

    from bench import run_bench
    import jax
    if jax.default_backend() != "tpu":
        print("perf_check: not on TPU, skipping")
        return 0

    result = run_bench(config=args.config)
    value = result["value"]

    best = None
    if os.path.exists(HIST):
        with open(HIST) as fh:
            for line in fh:
                rec = json.loads(line)
                if best is None or rec["value"] > best:
                    best = rec["value"]

    os.makedirs(os.path.dirname(HIST), exist_ok=True)
    with open(HIST, "a") as fh:
        fh.write(json.dumps(result) + "\n")

    print(json.dumps(result))
    if best is not None and not args.record_only:
        if value < best * (1.0 - args.threshold):
            print(f"PERF REGRESSION: {value} < {best} * "
                  f"(1 - {args.threshold})", file=sys.stderr)
            return 1
        print(f"perf ok: {value} vs best {best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
