#!/usr/bin/env python
"""Attribute the c5 TPU fidelity-gate failures (round-4 first capture).

The blind first-run thresholds tripped on both c5 rows
(benchmarks/tpu_gate_20260818_080928/fidelity.log):

    c5_anim.yaml rgb q99 3.633e-04  (threshold 5e-05, borrowed from the
                                     analytic c2 class)
    c5 fit-step  grad rel 1.87e-01  (threshold 2e-02, set from a CPU
                                     sanity run where dev == ref)

This tool measures WHERE each gap lives so the thresholds (or the
estimator) can be fixed from data instead of renegotiated blindly:

  Part A (rgb): per-orbit-frame device-vs-golden deltas split by an
    edge-band mask (3x3 golden-rgb local range) and by |Δdepth|; plus a
    shadows-off variant. Hypothesis: c5 is a *marched* smooth-union SDF
    (unlike analytic c1/c2 or exact-t mesh c4), so device-FP march
    trajectories land at O(eps)-different hit t, and the delta tail is
    concentrated at silhouette/shadow-boundary pixels — the same class
    as c3's carve-out, minus the chaos.

  Part B (grad): the pose-fit probe's device-vs-CPU gradient agreement
    as a function of the IFT silhouette-denominator clamp
    (SURFJAX_IFT_CLAMP sweep), plus the |∇f·d| distribution at the hit
    points. Hypothesis: a few near-grazing pixels sit below the clamp,
    get amplified by 1/clamp, and their FP-noise-limited contributions
    dominate the image-mean gradient's cross-backend diff.

Run on the TPU host:  python tools/c5_attribution.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

CONFIG = "configs/c5_anim.yaml"
CLAMPS = ("1e-4", "1e-3", "1e-2", "1e-1")


def _edge_band(rgb_g: np.ndarray, tol: float = 0.02) -> np.ndarray:
    """Pixels whose 3x3 golden-rgb local range exceeds tol: silhouettes,
    shadow boundaries, smooth-union creases. (H, W) bool."""
    lum = rgb_g.mean(axis=-1)
    h, w = lum.shape
    pad = np.pad(lum, 1, mode="edge")
    lo = np.full((h, w), np.inf)
    hi = np.full((h, w), -np.inf)
    for dy in range(3):
        for dx in range(3):
            win = pad[dy:dy + h, dx:dx + w]
            lo = np.minimum(lo, win)
            hi = np.maximum(hi, win)
    return (hi - lo) > tol


def _q(d, q):
    return float(np.quantile(d, q)) if d.size else float("nan")


def part_a():
    from surfjax.golden import cpp_bridge
    from surfjax.pipeline.frame import render_frame
    from tools.fidelity_matrix import _c5_frame_cameras
    import jax

    scene, cams, settings = _c5_frame_cameras(CONFIG)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    variants = [("default", settings),
                ("shadows off", settings.with_(shadows=False))]
    print("== Part A: c5 rgb delta attribution (device vs C++ golden) ==")
    for vname, s in variants:
        for cam, fname in cams:
            fb = render_frame(scene, cam, s)
            g = cpp_bridge.render(scene, cam, s)
            rgb_d = np.asarray(fb.rgb)
            rgb_g = g["rgb"].reshape(rgb_d.shape)
            t_d = np.asarray(fb.depth)
            t_g = g["depth"].reshape(t_d.shape)
            hit = g["hit"].reshape(t_d.shape).astype(bool)
            d = np.abs(rgb_d - rgb_g)
            band = _edge_band(rgb_g)
            dband = d[band]
            dint = d[~band]
            dt = np.abs(t_d - t_g)[hit]
            tot = d.sum()
            print(f"| {vname:11s} {fname:8s} | q99 {_q(d, 0.99):.3e} "
                  f"max {d.max():.3e} "
                  f"| band({band.mean() * 100:.1f}% px) q99 "
                  f"{_q(dband, 0.99):.3e} max {dband.max():.3e} "
                  f"| interior q99 {_q(dint, 0.99):.3e} "
                  f"max {dint.max():.3e} "
                  f"| band energy {d[band].sum() / max(tot, 1e-30) * 100:.1f}% "
                  f"| dt(hit) q99 {_q(dt, 0.99):.3e} max {dt.max():.3e} |")


def _grad_cpu_subprocess(clamp: str):
    code = (
        "import json, sys\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {_ROOT!r})\n"
        "from surfjax.config import load_config\n"
        "from surfjax.diff.fit import pose_loss_and_grad\n"
        f"scene, cam, settings, _ = load_config({CONFIG!r})\n"
        "loss, g = pose_loss_and_grad(scene, cam, settings)\n"
        "print(json.dumps({'loss': loss, 'gw': g['w'].tolist(),\n"
        "                  'gdt': g['dt'].tolist()}))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["SURFJAX_IFT_CLAMP"] = clamp
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=_ROOT,
                          capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _grad_device_subprocess(clamp: str):
    """Device grad in a subprocess too: SURFJAX_IFT_CLAMP is read at
    module import, so the parent (which already imported sdf) can't
    re-sweep it in-process."""
    code = (
        "import json, sys\n"
        "import numpy as np\n"
        f"sys.path.insert(0, {_ROOT!r})\n"
        "from surfjax.config import load_config\n"
        "from surfjax.diff.fit import pose_loss_and_grad\n"
        f"scene, cam, settings, _ = load_config({CONFIG!r})\n"
        "loss, g = pose_loss_and_grad(scene, cam, settings)\n"
        "print(json.dumps({'loss': loss, 'gw': g['w'].tolist(),\n"
        "                  'gdt': g['dt'].tolist()}))\n"
    )
    env = dict(os.environ)
    env["SURFJAX_IFT_CLAMP"] = clamp
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=_ROOT,
                          capture_output=True, text=True, timeout=900)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _vec(r):
    return np.concatenate([np.asarray(r["gw"], np.float64),
                           np.asarray(r["gdt"], np.float64)])


def part_b():
    print("== Part B: pose-fit grad agreement vs IFT denominator clamp ==")
    for clamp in CLAMPS:
        dev = _grad_device_subprocess(clamp)
        ref = _grad_cpu_subprocess(clamp)
        gd, gr = _vec(dev), _vec(ref)
        rel = np.linalg.norm(gd - gr) / max(np.linalg.norm(gr), 1e-12)
        cos = float(gd @ gr / max(np.linalg.norm(gd) * np.linalg.norm(gr),
                                  1e-30))
        relw = (np.linalg.norm(gd[:3] - gr[:3])
                / max(np.linalg.norm(gr[:3]), 1e-12))
        reldt = (np.linalg.norm(gd[3:] - gr[3:])
                 / max(np.linalg.norm(gr[3:]), 1e-12))
        print(f"| clamp {clamp:5s} | rel L2 {rel:.3e} | cos {cos:.6f} "
              f"| rel(w) {relw:.3e} | rel(dt) {reldt:.3e} "
              f"| |g_dev| {np.linalg.norm(gd):.4e} "
              f"|g_ref| {np.linalg.norm(gr):.4e} "
              f"| loss rel {abs(dev['loss'] - ref['loss']) / abs(ref['loss']):.2e} |")


def part_c():
    """Distribution of |∇f·d| at the probe pose's primary hits (CPU jnp,
    the same forward the fit differentiates): how many pixels sit below
    each clamp candidate."""
    import jax
    import jax.numpy as jnp
    from surfjax.config import load_config
    from surfjax.core.camera import flat_camera_rays
    from surfjax.core.scene_compile import ENGINE_SDF
    from surfjax.diff.fit import _matmul9, rodrigues
    from surfjax.engines.sdf import eval_sdf, _sphere_trace_impl

    scene, cam, settings, _ = load_config(CONFIG)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    oir = next(o for o in static.ir.objects if o.engine == ENGINE_SDF)
    intr = cam.intrinsics
    R0 = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))
    t0 = jnp.asarray(np.asarray(cam.position, np.float32))
    w = jnp.asarray((0.02, -0.01, 0.015), jnp.float32)
    dt = jnp.asarray((0.01, -0.02, 0.005), jnp.float32)
    R = _matmul9(rodrigues(w), R0)
    o, d, _n = flat_camera_rays(intr, R, t0 + dt)
    lp, npar = params["leaf_params"], params["node_params"]
    t, hit = _sphere_trace_impl(oir, lp, npar, o, d, settings.t_min,
                                settings.t_max, settings.max_steps,
                                settings.hit_eps, settings.hit_eps_scale)
    ts = jnp.where(hit, t, 0.0)
    p = (o[0] + ts * d[0], o[1] + ts * d[1], o[2] + ts * d[2])

    def f(px, py, pz):
        return eval_sdf(oir, lp, npar, (px, py, pz)).sum()

    gx, gy, gz = jax.grad(f, argnums=(0, 1, 2))(*p)
    denom = np.asarray(gx * d[0] + gy * d[1] + gz * d[2])
    hit = np.asarray(hit)
    ad = np.abs(denom[hit])
    print("== Part C: |∇f·d| at probe-pose primary hits (CPU jnp) ==")
    print(f"| hits {hit.sum()} | min {ad.min():.3e} | q1 {_q(ad, 0.01):.3e} "
          f"| q10 {_q(ad, 0.10):.3e} | median {_q(ad, 0.5):.3e} |")
    for c in (1e-4, 1e-3, 1e-2, 1e-1):
        n = int((ad < c).sum())
        print(f"|   below clamp {c:g}: {n} px ({n / max(ad.size, 1) * 100:.3f}%)")


def part_d():
    """Forward divergence at the PERTURBED probe pose, device(jnp) vs
    forced-CPU subprocess: hit-mask flips + rgb/depth deltas. A handful
    of flipped eps-band pixels each flip an entire per-pixel gradient
    contribution between backends (zero on miss), which no clamp can
    reconcile."""
    import tempfile

    import jax.numpy as jnp
    from surfjax.config import load_config
    from surfjax.core.camera import flat_camera_rays
    from surfjax.diff.fit import _matmul9, rodrigues
    from surfjax.pipeline.frame import render_rays

    scene, cam, settings, _ = load_config(CONFIG)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = cam.intrinsics
    R0 = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))
    t0 = jnp.asarray(np.asarray(cam.position, np.float32))
    R = _matmul9(rodrigues(jnp.asarray((0.02, -0.01, 0.015), jnp.float32)),
                 R0)
    pos = t0 + jnp.asarray((0.01, -0.02, 0.005), jnp.float32)
    o, d, _ = flat_camera_rays(intr, R, pos)
    fb = render_rays(static, settings, params, o, d)
    dev = {"rgb": np.asarray(fb.rgb),
           "hit": np.asarray(fb.hit).astype(bool),
           "depth": np.asarray(fb.depth)}

    out = tempfile.mktemp(suffix=".npz")
    code = (
        "import sys\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {_ROOT!r})\n"
        "import jax.numpy as jnp\n"
        "from surfjax.config import load_config\n"
        "from surfjax.core.camera import flat_camera_rays\n"
        "from surfjax.diff.fit import _matmul9, rodrigues\n"
        "from surfjax.pipeline.frame import render_rays\n"
        f"scene, cam, settings, _ = load_config({CONFIG!r})\n"
        "static, params = scene.freeze()\n"
        "params = {k: jnp.asarray(v) for k, v in params.items()}\n"
        "intr = cam.intrinsics\n"
        "R0 = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))\n"
        "t0 = jnp.asarray(np.asarray(cam.position, np.float32))\n"
        "R = _matmul9(rodrigues(jnp.asarray((0.02, -0.01, 0.015),"
        " jnp.float32)), R0)\n"
        "pos = t0 + jnp.asarray((0.01, -0.02, 0.005), jnp.float32)\n"
        "o, d, _ = flat_camera_rays(intr, R, pos)\n"
        "fb = render_rays(static, settings, params, o, d)\n"
        f"np.savez({out!r}, rgb=np.asarray(fb.rgb),"
        " hit=np.asarray(fb.hit), depth=np.asarray(fb.depth))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=_ROOT,
                          capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    refz = np.load(out)
    ref = {"rgb": refz["rgb"], "hit": refz["hit"].astype(bool),
           "depth": refz["depth"]}
    os.unlink(out)
    flips = dev["hit"] != ref["hit"]
    both = dev["hit"] & ref["hit"]
    drgb = np.abs(dev["rgb"] - ref["rgb"])
    ddep = np.abs(dev["depth"] - ref["depth"])[both]
    print("== Part D: forward divergence at the perturbed probe pose ==")
    print(f"| hit flips {int(flips.sum())} px "
          f"({flips.mean() * 100:.4f}%) of {dev['hit'].size} "
          f"| rgb q99 {_q(drgb, 0.99):.3e} max {drgb.max():.3e} "
          f"| depth(both-hit) q99 {_q(ddep, 0.99):.3e} "
          f"max {ddep.max() if ddep.size else 0:.3e} |")
    if flips.sum():
        # magnitude of the rgb step at flipped pixels: these are whole-
        # contribution gradient flips, the un-reconcilable class
        print(f"|   rgb delta at flipped px: mean "
              f"{drgb.reshape(-1, 3)[flips.reshape(-1)].mean():.3e} "
              f"max {drgb.reshape(-1, 3)[flips.reshape(-1)].max():.3e} |")


def main():
    from surfjax.utils.backend_probe import (honor_env_platforms,
                                             probe_backend)
    probe = probe_backend()
    if not probe.get("ok"):
        print(f"c5_attribution: backend unavailable ({probe.get('error')})",
              file=sys.stderr)
        return 2
    honor_env_platforms()
    import jax
    print(f"backend: {jax.default_backend()}")
    part_c()
    part_d()
    part_b()
    part_a()
    return 0


if __name__ == "__main__":
    sys.exit(main())
