"""Stage-time breakdown for the pallas frame, scan-dispatch methodology.

Times setting variants of the c3 workload (or any config) at 1080p with
N frames per dispatch so tunnel overhead amortizes away. NOTE: this
tool scans `frame_step` per frame (so every settings variant, including
mesh scenes, goes through the same code path); bench.py's fused
sequence path amortizes per-frame overhead further — measured on an
EMPTY scene, this scan path carries ~3.9 ms/frame of infrastructure vs
~1.2 ms on the fused 48-frame path. DELTAS between variants are
comparable; absolute numbers here run ~2.8 ms/frame above the bench.
Differences between variants give per-stage costs:

    primary   = time(shadows=off, ao=off)
    +shadows  = time(shadows=on,  ao=off) - primary
    +ao       = time(shadows=on,  ao=on)  - previous

Usage: python tools/profile_stages.py [config] [n_frames]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_settings(static, params, intr, R_flat, positions, settings,
                  repeats: int = 2) -> float:
    import jax
    import jax.numpy as jnp
    from surfjax.pipeline.frame import frame_step

    n_frames = positions.shape[0]

    @jax.jit
    def run_scan(params, R_flat, positions):
        def body(acc, pos):
            fb = frame_step(static, intr, settings, params, R_flat, pos)
            return acc + fb.rgb.mean() + fb.depth.mean() + fb.hit.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), positions)
        return acc

    float(run_scan(params, R_flat, positions))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_scan(params, R_flat, positions))
        times.append(time.perf_counter() - t0)
    return float(np.min(times)) / n_frames


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

    # bench.py's value_exact mode: LoDs 0 + over_relax 1.0 (the
    # oracle-trajectory settings) — the roofline's achieved side must be
    # captured at the same settings the headline discloses (r5)
    exact = settings.with_(secondary_lod_iters=0, ao_lod_iters=0,
                           over_relax=1.0)
    # (label, settings, key whose time the delta is taken against)
    variants = [
        ("primary only", settings.with_(shadows=False, ao=False), None),
        ("+ shadows", settings.with_(ao=False), "primary only"),
        ("full frame", settings, "+ shadows"),
        ("+ shadows exact", exact.with_(ao=False), "primary only"),
        ("full exact", exact, "+ shadows exact"),
    ]
    seen = {}
    for name, s, base in variants:
        dt = time_settings(static, params, intr, R_flat, positions, s)
        seen[name] = dt
        delta = dt - seen.get(base, 0.0)
        print(f"{name:16s} {dt * 1e3:8.2f} ms  "
              f"(delta {max(delta, 0.0) * 1e3:+7.2f} ms)")


if __name__ == "__main__":
    main()
