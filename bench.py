"""Benchmark harness (SURVEY.md §2 component 24).

Metric [BASELINE.json:2]: Mrays/sec/chip at 1080p (256-step trace);
frames/sec incl. shadow rays. Target: >=500 Mrays/sec/chip on TPU v5e
[BASELINE.json:5] — vs_baseline is measured against that target (the
reference publishes no numbers; BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s/chip", "vs_baseline": N}

THE metric workload (pinned — see BASELINE.md "Metric workload"):
configs/c3_sdf.yaml reframed to 1920x1080 at the config camera (same fov).

TWO fidelity modes are measured and reported every run (r5 — the r4
"value_exact keeps relax 1.6" caveat is retired because relax measured
TIME-NEUTRAL at full DE; benchmarks/relax_sweep_r5.log):
  value        — the config's settings as-is (secondary-ray fractal LoD
                 default-on: shadow marches truncate the Mandelbulb DE at
                 secondary_lod_iters, AO probes at ao_lod_iters; measured
                 error bounds in core/types.py — conservative darkening,
                 q99 visibility diff 3.9e-3).
  value_exact  — both LoDs 0 AND over_relax=1.0: full-DE secondary rays
                 on the ORACLE trajectory — exactly the settings the
                 golden parity tests compare against the oracles. (The
                 former separate value_oracle_traj mode is this mode;
                 the former "full-DE, relaxed trajectory" mode bought
                 no time and is gone.)
The mode parameters (secondary_lod_iters / ao_lod_iters / over_relax) are
disclosed in the JSON so the headline number is never ambiguous about
what it measured. mrays_primary_shadow excludes AO probes (the cheapest
ray class, ~68% of the all-rays count) for an at-a-glance composition
check.

Methodology: N full frames are rendered inside ONE jitted dispatch via
the sequence path (camera position varies per frame to defeat caching)
and the wall time of that single dispatch is divided by N — for
mesh-free scenes this is the fused sequence kernel (one pallas call,
F x tiles grid); otherwise a vmapped frame pipeline. Dispatch/tunnel
overhead therefore amortizes to <1% with no subtraction term. A single
scalar reduction over the stacked framebuffers feeds the final float()
fetch, which is the synchronization point (block_until_ready does not
block through the axon TPU relay this host uses). Ray accounting
(SURVEY.md §5.5): primary = H*W; shadow = one ray per (hit, light);
AO = one probe ray per (hit, probe direction).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


DEFAULT_CONFIG = "configs/c3_sdf.yaml"
TARGET_MRAYS = 500.0  # BASELINE.json:5 target on v5e


def _time_mode(static, intr, settings, params, R_flat, positions,
               repeats: int):
    """-> (seconds per frame, hits per frame) for one settings variant."""
    import jax
    import jax.numpy as jnp
    from surfjax.pipeline.frame import _sequence_jit

    n_frames = positions.shape[0]

    @jax.jit
    def run_scan(params, R_flat, positions):
        F = positions.shape[0]
        R_flats = jnp.broadcast_to(R_flat[None, :], (F, 9))
        fb = _sequence_jit(static, intr, settings, params, R_flats,
                          positions)
        return fb.rgb.mean(), fb.depth.mean(), fb.hit.sum()

    # warm-up / compile
    acc = run_scan(params, R_flat, positions)
    n_hits = float(acc[2]) / n_frames

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        acc = run_scan(params, R_flat, positions)
        float(acc[0])  # scalar fetch = sync point through the relay
        times.append(time.perf_counter() - t0)
    return float(np.min(times)) / n_frames, n_hits


def metric_workload(config: str | None = None, width: int = 1920,
                    height: int = 1080, n_frames: int = 48):
    """Build THE pinned metric workload (BASELINE.md): the config's scene
    reframed to width x height at the config camera's fov, with per-frame
    sub-pixel camera jitter (same workload, defeats result caching).
    -> (scene, static, params, intr, settings, R_flat, positions).
    Shared by bench.py and the sweep tools so they measure the identical
    workload."""
    import jax
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics

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

    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    pos0 = np.asarray(camera.position, np.float32)
    positions = jnp.asarray(
        pos0[None, :] + np.float32(1e-4) * np.arange(
            n_frames, dtype=np.float32)[:, None])
    return scene, static, params, intr, settings, R_flat, positions


def rays_per_frame(scene, settings, intr, n_hits: float) -> float:
    """Ray accounting (SURVEY.md §5.5): primary = H*W; shadow = one ray
    per (hit, light); AO = one probe per (hit, probe direction)."""
    primary = float(intr.width * intr.height)
    shadow = n_hits * len(scene.lights) if settings.shadows else 0.0
    ao = n_hits * settings.ao_samples if settings.ao else 0.0
    return primary + shadow + ao


def run_bench(config: str | None = None, repeats: int = 3,
              width: int = 1920, height: int = 1080,
              n_frames: int = 48, overrides: dict | None = None) -> dict:
    import jax

    scene, static, params, intr, settings, R_flat, positions = \
        metric_workload(config, width, height, n_frames)
    if overrides:
        # variant sweeps on the pinned workload (e.g. bulb_iter=cheb);
        # disclosed in the JSON so an overridden run can't be mistaken
        # for the headline
        settings = settings.with_(**overrides)

    dt, n_hits = _time_mode(static, intr, settings, params, R_flat,
                            positions, repeats)
    # value_exact = full DE AND over_relax=1.0: the oracle-trajectory
    # settings the golden parity tests run at. Relax measured
    # time-neutral at full DE (module docstring), so the honest mode
    # costs nothing over the r4 "full-DE, relaxed" one it replaces.
    exact = settings.with_(secondary_lod_iters=0, ao_lod_iters=0,
                           over_relax=1.0)
    dt_exact, _ = _time_mode(static, intr, exact, params, R_flat,
                             positions, repeats)

    primary = float(width * height)
    shadow = n_hits * len(scene.lights) if settings.shadows else 0.0
    ao = n_hits * settings.ao_samples if settings.ao else 0.0
    rpf = rays_per_frame(scene, settings, intr, n_hits)

    mrays = rpf / dt / 1e6
    mrays_exact = rpf / dt_exact / 1e6
    n_dev = jax.local_device_count()
    return {
        "metric": ("Mrays/sec/chip at 1080p (256-step trace); "
                   "frames/sec incl. shadow rays"),
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        # exact fidelity mode: LoDs 0 AND over_relax=1.0 — full-DE
        # secondary rays on the oracle trajectory, the settings the
        # golden parity tests run at (see module docstring)
        "value_exact": round(mrays_exact, 3),
        "vs_baseline_exact": round(mrays_exact / TARGET_MRAYS, 4),
        # composition check: the metric without AO probes (one 4-tap
        # probe per direction is far cheaper than a 256-step trace)
        "mrays_primary_shadow": round((primary + shadow) / dt / 1e6, 3),
        "mrays_primary_shadow_exact": round(
            (primary + shadow) / dt_exact / 1e6, 3),
        # fidelity-mode disclosure for the headline `value`
        "secondary_lod_iters": settings.secondary_lod_iters,
        "ao_lod_iters": settings.ao_lod_iters,
        "over_relax": settings.over_relax,
        "bulb_iter": settings.bulb_iter,
        "frames_per_sec": round(1.0 / dt, 4),
        "rays_per_frame": int(rpf),
        "primary_rays": int(primary),
        "shadow_rays": int(shadow),
        "ao_rays": int(ao),
        "frame_time_s": round(dt, 5),
        "frame_time_exact_s": round(dt_exact, 5),
        "frames_per_dispatch": n_frames,
        "backend": jax.default_backend(),
        "devices": n_dev,
        "settings_backend": settings.backend,
        **({"overrides": {k: str(v) for k, v in overrides.items()}}
           if overrides else {}),
    }


def _last_good_history_row() -> dict | None:
    """Most recent TPU row of benchmarks/history.jsonl, for context in the
    unavailable-backend error line (the relay being down says nothing
    about the renderer's speed; the last good measurement does)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "history.jsonl")
    last = None
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if row.get("backend") == "tpu":
                    last = row
    except OSError:
        return None
    return last


def main():
    # Round-3 postmortem (VERDICT.md Missing #1): with the axon relay down,
    # the first backend touch hangs ~28 min inside plugin init. Probe with
    # a watchdog subprocess and fail FAST with a structured line instead.
    from surfjax.utils.backend_probe import (
        honor_env_platforms, probe_backend,
    )

    probe = probe_backend()
    if not probe.get("ok"):
        err = {
            "metric": ("Mrays/sec/chip at 1080p (256-step trace); "
                       "frames/sec incl. shadow rays"),
            "value": None,
            "unit": "Mrays/s/chip",
            "vs_baseline": None,
            "backend": "unavailable",
            "error": probe.get("error", "backend probe failed"),
            "last_good": _last_good_history_row(),
        }
        print(json.dumps(err))
        sys.exit(1)
    # an explicit JAX_PLATFORMS must win over the axon sitecustomize in
    # THIS process too (the probe child already honors it)
    honor_env_platforms()

    # argv: [config] [key=value ...] — key=value pairs are
    # RenderSettings overrides for variant sweeps (disclosed in the
    # JSON), except the harness params `repeats` / `n_frames`, which
    # shorten sweep runs (tools/unroll_sweep.py) without touching the
    # measured workload's settings
    config = None
    overrides = {}
    harness = {"repeats": 3, "n_frames": 48}
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    v = {"true": True, "false": False}.get(v.lower(), v)
            if k in harness:
                harness[k] = int(v)
            else:
                overrides[k] = v
        else:
            config = a
    result = run_bench(config=config, overrides=overrides or None,
                       **harness)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
