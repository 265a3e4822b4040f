#!/usr/bin/env python
"""Bench every SPEC config (BASELINE.json:7-11) and print a table + JSONL.

The driver's headline metric comes from bench.py (config 3 at 1080p); this
tool records the full workload matrix for docs/COMPONENTS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def bench_scene(scene, camera, settings, lights, name, repeats=3,
                batch=24):
    """Scan-dispatch timing (same methodology as bench.py): `batch`
    slightly-jittered frames rendered in ONE lax.scan dispatch, wall
    time divided by batch — no roundtrip subtraction term."""
    import jax
    import jax.numpy as jnp
    from surfjax.pipeline.frame import frame_step

    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics
    R = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)

    @jax.jit
    def run(params, positions):
        def body(acc, pos):
            fb = frame_step(static, intr, settings, params, R, pos)
            return acc + fb.rgb.mean(), fb.hit.sum()
        acc, hs = jax.lax.scan(body, jnp.float32(0.0), positions)
        return acc, hs[0]

    positions = jnp.asarray(
        pos0[None, :] + np.float32(1e-4) * np.arange(
            batch, dtype=np.float32)[:, None])
    acc, hits = run(params, positions)
    float(acc)
    hits = float(hits)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(params, positions)[0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.min(ts)) / batch

    primary = float(intr.width * intr.height)
    shadow = hits * lights if settings.shadows else 0.0
    ao = hits * settings.ao_samples if settings.ao else 0.0
    rays = primary + shadow + ao
    return {
        "config": name,
        "resolution": [intr.width, intr.height],
        "frame_ms": round(dt * 1000, 2),
        "fps": round(1.0 / dt, 2),
        "mrays_per_s": round(rays / dt / 1e6, 1),
        "rays_per_frame": int(rays),
    }


def main():
    from tests.scenes import (
        config1_sphere, config2_csg, config3_sdf, config4_mesh,
    )
    from surfjax.api import Camera
    from surfjax.core.camera import Intrinsics

    results = []
    s1 = config1_sphere(256)
    results.append(bench_scene(s1[0], s1[1], s1[2], 1, "c1 sphere 256^2",
                               batch=64))
    s2 = config2_csg(512)
    results.append(bench_scene(s2[0], s2[1], s2[2], 2, "c2 csg 512^2",
                               batch=32))
    s3 = config3_sdf(1024)
    results.append(bench_scene(s3[0], s3[1], s3[2], 1, "c3 sdf 1024^2"))
    # the FIXTURE camera at the metric resolution — NOT the headline
    # workload (BASELINE.md "Metric workload"): it frames the scene
    # differently and reads ~35% lower than the config camera
    sc, cam, st = config3_sdf(1024)
    cam = Camera(Intrinsics.from_fov(1920, 1080, 45.0),
                 rotation=cam.rotation, position=cam.position)
    results.append(bench_scene(sc, cam, st, 1, "c3 FIXTURE-cam 1080p"))
    # THE metric workload (configs/c3_sdf.yaml camera reframed to 1080p,
    # fused sequence path) — same numbers as bench.py
    from bench import run_bench
    hb = run_bench()
    results.append({
        "config": "c3 METRIC (bench.py)",
        "resolution": [1920, 1080],
        "frame_ms": round(hb["frame_time_s"] * 1000, 2),
        "fps": hb["frames_per_sec"],
        "mrays_per_s": hb["value"],
        "rays_per_frame": hb["rays_per_frame"],
    })
    results.append({
        "config": "c3 METRIC exact-LoD0",
        "resolution": [1920, 1080],
        "frame_ms": round(hb["frame_time_exact_s"] * 1000, 2),
        "fps": round(1.0 / hb["frame_time_exact_s"], 2),
        "mrays_per_s": hb["value_exact"],
        "rays_per_frame": hb["rays_per_frame"],
    })
    s4 = config4_mesh(1920, 1080)
    results.append(bench_scene(s4[0], s4[1], s4[2], 1,
                               "c4 FIXTURE mesh (128 tris) 1080p"))
    from surfjax.config import load_config
    c4 = load_config("configs/c4_mesh.yaml")
    results.append(bench_scene(c4[0], c4[1], c4[2], 1,
                               "c4 CONFIG mesh (8192 tris) 1080p"))

    for r in results:
        print(json.dumps(r))
    print()
    print(f"{'config':<18}{'res':<12}{'ms/frame':>10}{'fps':>8}"
          f"{'Mrays/s':>10}")
    for r in results:
        print(f"{r['config']:<18}{str(r['resolution']):<12}"
              f"{r['frame_ms']:>10}{r['fps']:>8}{r['mrays_per_s']:>10}")


if __name__ == "__main__":
    main()
