"""Decompose the c3 1080p PRIMARY march cost: scene subsets and march
scheduling variants, scan-dispatch timing (same method as bench.py).

Usage: python tools/primary_sweep.py
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

    scene, camera, settings, _ = load_config("configs/c3_sdf.yaml")
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    settings = settings.with_(shadows=False, ao=False)
    intr = camera.intrinsics
    fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
    camera = Camera(Intrinsics.from_fov(1920, 1080, fov),
                    rotation=camera.rotation, position=camera.position)
    intr = camera.intrinsics
    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)
    positions = jnp.asarray(
        pos0[None, :] + np.float32(1e-4) * np.arange(
            8, dtype=np.float32)[:, None])

    import copy

    def subset(keep):
        s2 = copy.copy(scene)
        s2.objects = [scene.objects[i] for i in keep]
        s2._frozen = None
        st, pr = s2.freeze()
        return st, {k: jnp.asarray(v) for k, v in pr.items()}

    static, params = subset([0, 1, 2])

    scene_variants = [
        ("full scene", [0, 1, 2]),
        ("no bulb", [0, 2]),
        ("no blob", [1, 2]),
        ("floor only", [2]),
        ("empty scene", []),
    ]
    for name, keep in scene_variants:
        st, pr = subset(keep)
        dt = time_settings(st, pr, intr, R_flat, positions, settings)
        print(f"{name:24s} {dt * 1e3:8.2f} ms")

    setting_variants = [
        ("max_steps=64", settings.with_(max_steps=64)),
        ("relax=2.0", settings.with_(over_relax=2.0)),
        ("relax=1.2", settings.with_(over_relax=1.2)),
        # subtile_rows variants removed: they crash Mosaic
        # ApplyVectorLayout on real TPU (see core/types.py)
        ("tile_rows=32", settings.with_(tile_rows=32)),
        ("tile_rows=16", settings.with_(tile_rows=16)),
        ("eps_scale=2e-3", settings.with_(hit_eps_scale=2e-3)),
        ("normals=fd", settings.with_(normals="fd")),
    ]
    for name, s in setting_variants:
        dt = time_settings(static, params, intr, R_flat, positions, s)
        print(f"{name:24s} {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
