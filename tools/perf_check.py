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

    # both fidelity modes gate independently (see bench.py: `value` is
    # the LoD-default headline, `value_exact` the full-DE mode)
    best = {"value": None, "value_exact": None}
    if os.path.exists(HIST):
        with open(HIST) as fh:
            for line in fh:
                rec = json.loads(line)
                for key in best:
                    v = rec.get(key)
                    if v is not None and (best[key] is None
                                          or v > best[key]):
                        best[key] = v

    os.makedirs(os.path.dirname(HIST), exist_ok=True)
    with open(HIST, "a") as fh:
        fh.write(json.dumps(result) + "\n")

    print(json.dumps(result))
    rc = 0
    if not args.record_only:
        for key, b in best.items():
            v = result.get(key)
            if b is None or v is None:
                continue
            if v < b * (1.0 - args.threshold):
                print(f"PERF REGRESSION [{key}]: {v} < {b} * "
                      f"(1 - {args.threshold})", file=sys.stderr)
                rc = 1
            else:
                print(f"perf ok [{key}]: {v} vs best {b}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
