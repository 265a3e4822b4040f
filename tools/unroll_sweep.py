"""Re-sweep the while-trip unroll constants on the metric workload.

The unrolls (DE_UNROLL, MARCH_UNROLL, SOFT_MARCH_UNROLL) were swept
under the std bulb iteration (r3 — measured tables live next to each
constant). When per-iteration cost changes (e.g. the r4 cheb default is
~20% cheaper per DE iteration), the overhead/iteration balance moves and
the optimum can shift, so this tool re-runs the bench in a SUBPROCESS
per variant (the constants bind at import time) with the
SURFJAX_*_UNROLL env overrides.

Usage: python tools/unroll_sweep.py [de=4,8] [march=8,16] [soft=4,8,16]
       (each axis swept one-at-a-time around the committed defaults;
        run on the real TPU, strictly one job at a time — CLAUDE.md)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

AXES = {
    "de": ("SURFJAX_DE_UNROLL", [4, 8]),
    "march": ("SURFJAX_MARCH_UNROLL", [8, 16]),
    "soft": ("SURFJAX_SOFT_MARCH_UNROLL", [4, 8, 16]),
}


def _run_one(env_extra: dict) -> dict | None:
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    proc = subprocess.run(
        [sys.executable, "bench.py", "repeats=2", "n_frames=24"],
        cwd=_ROOT, env=env, capture_output=True, text=True, timeout=3600)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "value" in row:
            return row
    print(f"  FAILED rc={proc.returncode}: {proc.stderr[-400:]}",
          flush=True)
    return None


def main() -> int:
    spec = sys.argv[1:] or ["de=4,8", "march=8,16", "soft=4,8,16"]
    for item in spec:
        axis, _, vals = item.partition("=")
        var, default_vals = AXES[axis]
        values = ([int(v) for v in vals.split(",")] if vals
                  else default_vals)
        print(f"== axis {axis} ({var}) ==", flush=True)
        for v in values:
            row = _run_one({var: v})
            if row is None:
                continue
            print(f"  {axis}={v:3d}  LoD {row['value']:6.1f}  "
                  f"exact {row['value_exact']:6.1f} Mrays/s",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
