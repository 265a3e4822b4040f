#!/usr/bin/env python
"""Compile+render scaling vs object count (VERDICT r2 item 9, r3 Weak #4).

The pallas kernels unroll the scene statically: _read_params unpacks
n_leaves x 8 SMEM scalars and trace_core emits one march per SDF object
— warm compile measured ~0.67 s/object on TPU v5e (r3). r4 adds
RenderSettings.vector_objects: eligible single-leaf sphere/box objects
("crowd") march via ONE fori_loop with dynamic SMEM parameter reads, so
compile is O(1) in crowd size. This tool measures, per object count and
per mode (unrolled vs crowd):

    compile  — first-dispatch wall seconds (compile + one frame)
    render   — min-of-3 warm frame seconds (camera jittered per dispatch)

documenting the crossover in docs/COMPONENTS.md ("Scene-size ceiling").

Usage: python tools/compile_scaling.py [counts ...]   (default 8 16 32 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This tool MEASURES compile wall time: the repo-local persistent compile
# cache (surfjax/utils/compile_cache.py) would replay cached executables
# and falsify the compile column — force it OFF unconditionally (advisor
# r4: setdefault let an exported SURFJAX_COMPILE_CACHE=<dir> keep the
# cache on and falsify the column this tool exists to measure).
if os.environ.get("SURFJAX_COMPILE_CACHE", "off").lower() not in (
        "0", "off", "none", "disable", "disabled"):
    print("compile_scaling: overriding SURFJAX_COMPILE_CACHE="
          f"{os.environ['SURFJAX_COMPILE_CACHE']!r} -> 'off' (this tool "
          "measures compile time)", file=sys.stderr)
os.environ["SURFJAX_COMPILE_CACHE"] = "off"


def scene_n(n_spheres: int, kind: str = "sphere"):
    from surfjax.api import Camera, Material, Plane, PointLight, Scene, \
        Sphere, smooth_union

    scene = Scene()
    rng = np.random.RandomState(7)
    for i in range(n_spheres):
        c = (float(i % 6 - 2.5), float(i // 6 - 2.0),
             4.0 + float(rng.rand()))
        if kind == "csgpair":
            # crowd-INELIGIBLE object class (r4 verdict Next #4): a
            # two-leaf smooth-union tree per object — stays on the
            # statically-unrolled path regardless of vector_objects
            node = smooth_union(
                Sphere(center=c, radius=0.3),
                Sphere(center=(c[0] + 0.2, c[1], c[2]), radius=0.22),
                0.15)
        else:
            node = Sphere(center=c, radius=0.3)
        scene.add(node, Material.lambert((0.2 + 0.02 * i, 0.5, 0.8)),
                  engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-2.5),
              Material.lambert((0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0),
                               color=(1.0, 1.0, 1.0)))
    cam = Camera.pinhole(256, 256, 45.0, position=(0.0, 0.0, -2.0),
                         target=(0.0, 0.0, 4.0))
    return scene, cam


def measure(n: int, vector_objects: bool, repeats: int = 3,
            kind: str = "sphere"):
    import jax
    import jax.numpy as jnp
    from surfjax.core.types import RenderSettings
    from surfjax.pipeline.frame import frame_step

    settings = RenderSettings(shadows=True, max_steps=96,
                              vector_objects=vector_objects)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    scene, cam = scene_n(n, kind)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = cam.intrinsics
    R_flat = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))
    pos0 = np.asarray(cam.position, np.float32)

    fn = jax.jit(lambda p, R, t: frame_step(static, intr, settings,
                                            p, R, t))
    t0 = time.perf_counter()
    fb = fn(params, R_flat, jnp.asarray(pos0))
    float(fb.rgb.mean())  # sync through the relay
    compile_s = time.perf_counter() - t0

    times = []
    for k in range(repeats):
        pos = jnp.asarray(pos0 + np.float32(1e-4) * (k + 1))
        t0 = time.perf_counter()
        fb = fn(params, R_flat, pos)
        float(fb.rgb.mean())
        times.append(time.perf_counter() - t0)
    return compile_s, float(np.min(times))


def main():
    import jax
    kind = "sphere"
    counts = []
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            kind = a.split("=", 1)[1]
        else:
            counts.append(int(a))
    counts = counts or [8, 16, 32, 64]
    print(f"backend: {jax.default_backend()}  scene kind: {kind}")
    # r5: two-leaf union/smooth-union pairs are crowd-eligible too
    # (render_tile.split_crowd pair sections), so both kinds measure
    # both modes
    modes = (False, True)
    rows = []
    for n in counts:
        for vec in modes:
            mode = "crowd" if vec else "unrolled"
            try:
                compile_s, render_s = measure(n, vec, kind=kind)
            except Exception as e:  # OOM/Mosaic limits at huge N: record
                print(f"| objects {n + 1:4d} | {mode:8s} | FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            rows.append({"objects": n + 1, "mode": mode, "kind": kind,
                         "compile_s": round(compile_s, 2),
                         "render_ms": round(render_s * 1e3, 2)})
            print(f"| objects {n + 1:4d} | {mode:8s} "
                  f"| compile {compile_s:7.2f} s "
                  f"| render {render_s * 1e3:8.2f} ms |", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
