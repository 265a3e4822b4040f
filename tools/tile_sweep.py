"""Sweep pallas tile geometry (tile_rows) on the metric workload, both
fidelity modes. Re-run whenever per-trip loop overhead changes (the
march/DE while-trip unrolls moved the optimum 64 -> 48 in r3 — see
docs/ROUND3.md).

Usage: python tools/tile_sweep.py [tile_rows ...]

subtile_rows stays 0: nonzero values crash Mosaic's ApplyVectorLayout
on real TPU (see core/types.py) — sweep it only under interpret mode.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import _time_mode, metric_workload, rays_per_frame

    rows_list = [int(a) for a in sys.argv[1:]] or [16, 32, 48, 64, 96]

    scene, static, params, intr, settings, R_flat, positions = \
        metric_workload(n_frames=24)

    for rows in rows_list:
        s = settings.with_(tile_rows=rows)
        dt, n_hits = _time_mode(static, intr, s, params, R_flat,
                                positions, repeats=2)
        se = s.with_(secondary_lod_iters=0, ao_lod_iters=0)
        dte, _ = _time_mode(static, intr, se, params, R_flat,
                            positions, repeats=2)
        rays = rays_per_frame(scene, s, intr, n_hits)
        print(f"tile_rows={rows:3d}  "
              f"LoD {dt*1e3:6.2f} ms ({rays/dt/1e6:6.1f} Mrays/s)  "
              f"exact {dte*1e3:6.2f} ms ({rays/dte/1e6:6.1f})",
              flush=True)


if __name__ == "__main__":
    main()
