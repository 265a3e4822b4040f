"""Sweep pallas tile geometry (tile_rows, subtile_rows) on the metric
workload, both fidelity modes. Re-run whenever per-trip loop overhead
changes (march/DE unrolls moved the optimum before — see docs/ROUND3.md).

Usage: python tools/tile_sweep.py [tile_rows ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import _time_mode, DEFAULT_CONFIG
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics

    rows_list = [int(a) for a in sys.argv[1:]] or [16, 32, 48, 64, 96]

    scene, camera, settings, _ = load_config(DEFAULT_CONFIG)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    intr = camera.intrinsics
    width, height = 1920, 1080
    fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
    camera = Camera(Intrinsics.from_fov(width, height, fov),
                    rotation=camera.rotation, position=camera.position)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics
    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)
    n_frames = 24
    positions = jnp.asarray(
        pos0[None, :] + np.float32(1e-4) * np.arange(
            n_frames, dtype=np.float32)[:, None])
    rays = 11089301.0  # c3 1080p per-frame ray count (bench.py accounting)

    for rows in rows_list:
        for sub in (0, 8, 16):
            s = settings.with_(tile_rows=rows, subtile_rows=sub)
            dt, _ = _time_mode(static, intr, s, params, R_flat,
                               positions, repeats=2)
            se = s.with_(secondary_lod_iters=0, ao_lod_iters=0)
            dte, _ = _time_mode(static, intr, se, params, R_flat,
                                positions, repeats=2)
            print(f"tile_rows={rows:3d} sub={sub:2d}  "
                  f"LoD {dt*1e3:6.2f} ms ({rays/dt/1e6:6.1f} Mrays/s)  "
                  f"exact {dte*1e3:6.2f} ms ({rays/dte/1e6:6.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
