"""Benchmark harness (SURVEY.md §2 component 24).

Metric [BASELINE.json:2]: Mrays/sec/chip at 1080p (256-step trace);
frames/sec incl. shadow rays. Target: >=500 Mrays/sec/chip on TPU v5e
[BASELINE.json:5] — vs_baseline is measured against that target (the
reference publishes no numbers; BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s/chip", "vs_baseline": N}

Ray accounting (SURVEY.md §5.5): primary rays = H*W; shadow rays = one per
(hit, light) — the metric explicitly includes shadow rays; AO probe marches
are counted as one ray per (hit, probe direction) when enabled.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


DEFAULT_CONFIG = "configs/c3_sdf.yaml"
TARGET_MRAYS = 500.0  # BASELINE.json:5 target on v5e


def run_bench(config: str | None = None, repeats: int = 5,
              width: int = 1920, height: int = 1080) -> dict:
    import jax
    from surfjax import render
    from surfjax.api import Camera
    from surfjax.config import load_config

    scene, camera, settings, _ = load_config(config or DEFAULT_CONFIG)
    # benchmark at 1080p regardless of the config's own resolution
    # (the metric is defined at 1080p, BASELINE.json:2)
    intr = camera.intrinsics
    if (intr.width, intr.height) != (width, height):
        from surfjax.core.camera import Intrinsics
        fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
        camera = Camera(Intrinsics.from_fov(width, height, fov),
                        rotation=camera.rotation, position=camera.position)

    # warm-up / compile
    fb = jax.block_until_ready(render(scene, camera, settings))
    n_hits = float(np.asarray(fb.hit).sum())
    n_lights = max(len(scene.lights), 0)
    primary = float(width * height)
    shadow = n_hits * n_lights if settings.shadows else 0.0
    ao = n_hits * settings.ao_samples if settings.ao else 0.0
    rays_per_frame = primary + shadow + ao

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(render(scene, camera, settings))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    mrays = rays_per_frame / dt / 1e6
    n_dev = jax.local_device_count()
    mrays_per_chip = mrays / max(n_dev, 1) if n_dev > 1 else mrays
    return {
        "metric": ("Mrays/sec/chip at 1080p (256-step trace); "
                   "frames/sec incl. shadow rays"),
        "value": round(mrays_per_chip, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays_per_chip / TARGET_MRAYS, 4),
        "frames_per_sec": round(1.0 / dt, 4),
        "rays_per_frame": int(rays_per_frame),
        "primary_rays": int(primary),
        "shadow_rays": int(shadow),
        "ao_rays": int(ao),
        "frame_time_s": round(dt, 5),
        "backend": jax.default_backend(),
        "devices": n_dev,
        "settings_backend": settings.backend,
    }


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else None
    result = run_bench(config=config)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
