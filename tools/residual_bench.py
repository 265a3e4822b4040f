#!/usr/bin/env python
"""Scheduler shoot-out on the capped-march residual's DESIGN-CASE scene
(VERDICT r2 item 8): many small clustered SDF objects, where the slow
lanes cluster spatially instead of lining a fractal silhouette.

Times, on the current backend (run on the TPU host):
  - plain tile path (baseline)
  - capped-march residual at several march_cap / shadow_march_cap values

Usage: python tools/residual_bench.py [size] [n_frames]
"""

from __future__ import annotations

import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_stages import time_settings  # noqa: E402


def clustered_scene():
    """The 31-object scene of tests/test_kernels.py::
    test_many_objects_scene_scale: 30 small SDF spheres + a floor."""
    from surfjax.api import Camera, Material, Plane, PointLight, Scene, \
        Sphere
    from surfjax.core.types import RenderSettings

    scene = Scene()
    rng = np.random.RandomState(7)
    for i, (x, y) in enumerate(itertools.product(range(6), range(5))):
        c = (float(x - 2.5), float(y - 2.0), 4.0 + float(rng.rand()))
        scene.add(Sphere(center=c, radius=0.3),
                  Material.lambert((0.2 + 0.02 * i, 0.5, 0.8)),
                  engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-2.5),
              Material.lambert((0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0),
                               color=(1.0, 1.0, 1.0)))
    cam = Camera.pinhole(512, 512, 45.0, position=(0.0, 0.0, -2.0),
                         target=(0.0, 0.0, 4.0))
    settings = RenderSettings(shadows=True, max_steps=96)
    return scene, cam, settings


def main():
    import jax
    import jax.numpy as jnp

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    scene, camera, settings = clustered_scene()
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    if size != 512:
        from surfjax.api import Camera
        camera = Camera.pinhole(size, size, 45.0,
                                position=(0.0, 0.0, -2.0),
                                target=(0.0, 0.0, 4.0))
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics
    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)
    positions = jnp.asarray(
        pos0[None, :] + np.float32(1e-4) * np.arange(
            n_frames, dtype=np.float32)[:, None])

    variants = [
        ("tile baseline", settings),
        ("march_cap=16", settings.with_(march_cap=16)),
        ("march_cap=32", settings.with_(march_cap=32)),
        ("shadow_cap=16", settings.with_(shadow_march_cap=16)),
        ("caps 32/16", settings.with_(march_cap=32, shadow_march_cap=16)),
    ]
    for name, s in variants:
        dt = time_settings(static, params, intr, R_flat, positions, s)
        print(f"{name:16s} {dt * 1e3:8.2f} ms/frame")


if __name__ == "__main__":
    main()
