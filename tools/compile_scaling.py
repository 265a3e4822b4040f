#!/usr/bin/env python
"""TPU compile-time scaling vs object count (VERDICT r2 item 9).

The pallas kernels unroll the scene statically: _read_params unpacks
n_leaves x 8 SMEM scalars and trace_core emits one march per SDF object.
This tool measures wall-clock compile seconds of the fused frame kernel
at several object counts on the current backend, bounding the practical
scene-size limit documented in docs/COMPONENTS.md.

Usage: python tools/compile_scaling.py [counts ...]   (default 8 16 31)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scene_n(n_spheres: int):
    from surfjax.api import Camera, Material, Plane, PointLight, Scene, \
        Sphere

    scene = Scene()
    rng = np.random.RandomState(7)
    for i in range(n_spheres):
        c = (float(i % 6 - 2.5), float(i // 6 - 2.0),
             4.0 + float(rng.rand()))
        scene.add(Sphere(center=c, radius=0.3),
                  Material.lambert((0.2 + 0.02 * i, 0.5, 0.8)),
                  engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-2.5),
              Material.lambert((0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0),
                               color=(1.0, 1.0, 1.0)))
    cam = Camera.pinhole(256, 256, 45.0, position=(0.0, 0.0, -2.0),
                         target=(0.0, 0.0, 4.0))
    return scene, cam


def main():
    import jax
    import jax.numpy as jnp
    from surfjax.core.types import RenderSettings
    from surfjax.pipeline.frame import frame_step

    counts = [int(a) for a in sys.argv[1:]] or [8, 16, 31]
    settings = RenderSettings(shadows=True, max_steps=96)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    for n in counts:
        scene, cam = scene_n(n)
        static, params = scene.freeze()
        params = {k: jnp.asarray(v) for k, v in params.items()}
        intr = cam.intrinsics
        R_flat = jnp.asarray(
            np.asarray(cam.rotation, np.float32).reshape(9))
        pos = jnp.asarray(np.asarray(cam.position, np.float32))

        t0 = time.perf_counter()
        fb = jax.jit(lambda p, R, t: frame_step(
            static, intr, settings, p, R, t))(params, R_flat, pos)
        float(fb.rgb.mean())  # sync through the relay
        dt = time.perf_counter() - t0
        print(f"objects {n + 1:3d}: first-dispatch (compile+run) "
              f"{dt:7.2f} s")


if __name__ == "__main__":
    main()
