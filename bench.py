"""Benchmark harness (SURVEY.md §2 component 24).

Metric [BASELINE.json:2]: Mrays/sec/chip at 1080p (256-step trace);
frames/sec incl. shadow rays. Target: >=500 Mrays/sec/chip on TPU v5e
[BASELINE.json:5] — vs_baseline is measured against that target (the
reference publishes no numbers; BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s/chip", "vs_baseline": N}

Methodology: the frame step plus per-buffer scalar reductions are fused into
ONE jitted program, so each timed iteration is a single dispatch returning a
few scalars. The measured empty-dispatch roundtrip (significant through the
axon TPU tunnel this machine uses) is subtracted. Ray accounting
(SURVEY.md §5.5): primary = H*W; shadow = one ray per (hit, light); AO = one
probe ray per (hit, probe direction).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


DEFAULT_CONFIG = "configs/c3_sdf.yaml"
TARGET_MRAYS = 500.0  # BASELINE.json:5 target on v5e


def run_bench(config: str | None = None, repeats: int = 11,
              width: int = 1920, height: int = 1080) -> dict:
    import jax
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics
    from surfjax.pipeline.frame import frame_step

    scene, camera, settings, _ = load_config(config or DEFAULT_CONFIG)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    # the metric is defined at 1080p (BASELINE.json:2)
    intr = camera.intrinsics
    if (intr.width, intr.height) != (width, height):
        fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
        camera = Camera(Intrinsics.from_fov(width, height, fov),
                        rotation=camera.rotation, position=camera.position)

    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def step(params, R_flat, cam_pos):
        fb = frame_step(static, intr, settings, params, R_flat, cam_pos)
        # scalar summary only -> single tiny host transfer per frame
        return (fb.rgb.mean(), fb.depth.mean(), fb.hit.sum())

    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)

    # measure dispatch roundtrip with a trivial program
    triv = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((8, 128))
    float(triv(x))
    rts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(triv(x))
        rts.append(time.perf_counter() - t0)
    # relay stalls are additive noise: min is the cleanest estimator
    roundtrip = float(np.min(rts))

    # warm-up / compile; vary camera position per rep to defeat any caching
    _, _, hits = step(params, R_flat, jnp.asarray(pos0))
    n_hits = float(hits)

    times = []
    for i in range(repeats):
        pos = jnp.asarray(pos0 + np.float32(1e-4) * (i + 1))
        t0 = time.perf_counter()
        r = step(params, R_flat, pos)
        float(r[0])
        times.append(time.perf_counter() - t0)
    dt = max(float(np.min(times)) - roundtrip, 1e-9)

    n_lights = len(scene.lights)
    primary = float(width * height)
    shadow = n_hits * n_lights if settings.shadows else 0.0
    ao = n_hits * settings.ao_samples if settings.ao else 0.0
    rays_per_frame = primary + shadow + ao

    mrays = rays_per_frame / dt / 1e6
    n_dev = jax.local_device_count()
    return {
        "metric": ("Mrays/sec/chip at 1080p (256-step trace); "
                   "frames/sec incl. shadow rays"),
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "frames_per_sec": round(1.0 / dt, 4),
        "rays_per_frame": int(rays_per_frame),
        "primary_rays": int(primary),
        "shadow_rays": int(shadow),
        "ao_rays": int(ao),
        "frame_time_s": round(dt, 5),
        "dispatch_roundtrip_s": round(roundtrip, 5),
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
