"""Sweep march_cap / shadow_march_cap for the capped-march residual
scheduler (kernels/render_tile.py::_block_residual) on the c3 1080p
workload, scan-dispatch timing (same method as bench.py).

Usage: python tools/cap_sweep.py [config] [n_frames]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_stages import time_settings  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/c3_sdf.yaml"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    width, height = 1920, 1080

    scene, camera, settings, _ = load_config(config)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    intr = camera.intrinsics
    if (intr.width, intr.height) != (width, height):
        fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
        camera = Camera(Intrinsics.from_fov(width, height, fov),
                       rotation=camera.rotation, position=camera.position)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics
    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)
    positions = jnp.asarray(
        pos0[None, :] + np.float32(1e-4) * np.arange(
            n_frames, dtype=np.float32)[:, None])

    variants = [("baseline", 0, 0)]
    for mc in (24, 32, 48):
        variants.append((f"mc={mc}", mc, 0))
    for sc in (12, 16, 24):
        variants.append((f"sc={sc}", 0, sc))
    variants += [("mc=32 sc=16", 32, 16), ("mc=24 sc=12", 24, 12)]

    for name, mc, sc in variants:
        s = settings.with_(march_cap=mc, shadow_march_cap=sc)
        dt = time_settings(static, params, intr, R_flat, positions, s)
        print(f"{name:14s} {dt * 1e3:8.2f} ms/frame")


if __name__ == "__main__":
    main()
