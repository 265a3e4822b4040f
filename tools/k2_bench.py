"""Microbenchmark: K2 (shadow visibility kernel) in isolation on the c3
shadow-ray batch at 1080p, with A/B toggles via env:

  K2_RELAX=1.0|1.6      penumbra march relaxation
  K2_NO_WINDOW=1        disable the influence-window skip
  K2_NO_CLOSED=1        disable closed-form plane/sphere penumbra

Usage: python tools/k2_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics, camera_ray_dirs_dyn
    from surfjax.core.math import F32
    from surfjax.kernels import render_tile as rt

    relax = float(os.environ.get("K2_RELAX", "0") or 0)
    if os.environ.get("K2_NO_WINDOW"):
        rt._influence_window_orig = rt._influence_window
        rt._influence_window = lambda b, o, l, t0, tm, kf: (
            jnp.full_like(o[0], t0), tm * jnp.ones_like(o[0]))
        # the bound exists but the window is the full segment
    if os.environ.get("K2_NO_CLOSED"):
        rt._single_leaf_closed_form = lambda oir: None

    scene, camera, settings, _ = load_config("configs/c3_sdf.yaml")
    settings = settings.with_(backend="pallas")
    if relax:
        settings = settings.with_(over_relax=relax)
    if os.environ.get("K2_STEPS"):
        settings = settings.with_(shadow_steps=int(os.environ["K2_STEPS"]))
    if os.environ.get("K2_LOD"):
        settings = settings.with_(
            secondary_lod_iters=int(os.environ["K2_LOD"]))
    if os.environ.get("K2_TILE_ROWS"):
        settings = settings.with_(tile_rows=int(os.environ["K2_TILE_ROWS"]))
    if os.environ.get("K2_ITER"):
        it = int(os.environ["K2_ITER"])
        for ob in scene.objects:
            node = ob.node
            stack = [node]
            while stack:
                nd = stack.pop()
                if hasattr(nd, "iterations"):
                    object.__setattr__(nd, "iterations", it)
                for attr in ("a", "b"):
                    if hasattr(nd, attr):
                        stack.append(getattr(nd, attr))
        scene._frozen = None
    if os.environ.get("K2_DROP_BULB"):
        keep = []
        for ob in scene.objects:
            node = ob.node
            has_bulb = False
            stack = [node]
            while stack:
                nd = stack.pop()
                if hasattr(nd, "iterations"):
                    has_bulb = True
                for attr in ("a", "b"):
                    if hasattr(nd, attr):
                        stack.append(getattr(nd, attr))
            if not has_bulb:
                keep.append(ob)
        scene.objects = keep
        scene._frozen = None
    width, height = 1920, 1080
    intr = camera.intrinsics
    fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
    camera = Camera(Intrinsics.from_fov(width, height, fov),
                    rotation=camera.rotation, position=camera.position)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics
    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    cam_pos = jnp.asarray(np.asarray(camera.position, np.float32))

    H, W = height, width
    R = settings.tile_rows
    LANES = rt.LANES
    H2 = ((H + R - 1) // R) * R
    W2 = ((W + LANES - 1) // LANES) * LANES
    ty, tx = H2 // R, W2 // LANES
    rows = jnp.minimum(jnp.arange(H2, dtype=jnp.float32), F32(H - 1))
    cols = jnp.minimum(jnp.arange(W2, dtype=jnp.float32), F32(W - 1))
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")

    def tile_layout(a):
        return (a.reshape(ty, R, tx, LANES).transpose(0, 2, 1, 3)
                .reshape(ty * tx * R, LANES))

    rr_t = tile_layout(rr)
    cc_t = tile_layout(cc)
    d = camera_ray_dirs_dyn(intr, R_flat, rr_t, cc_t)
    o = (jnp.broadcast_to(cam_pos[0], rr_t.shape),
         jnp.broadcast_to(cam_pos[1], rr_t.shape),
         jnp.broadcast_to(cam_pos[2], rr_t.shape))

    lp = params["leaf_params"]
    nparams = params["node_params"]

    # K1 once to get hit state
    t, obj, n, ao, hit_f, _ = rt.render_tile_kernel(
        static, settings, 0, lp, nparams, o, d, t0=jnp.zeros_like(o[0]))
    t_sane = jnp.where(hit_f > F32(0.5), t, F32(0.0))
    p = tuple(o[k] + t_sane * d[k] for k in range(3))
    eps = F32(settings.shadow_eps)
    p_off = tuple(p[k] + n[k] * eps for k in range(3))
    lrow = params["lights"][0]
    lv = tuple(lrow[k] - p_off[k] for k in range(3))
    dist = jnp.sqrt((lv[0] * lv[0] + lv[1] * lv[1]) + lv[2] * lv[2])
    inv = F32(1.0) / dist
    l = tuple(lv[k] * inv for k in range(3))
    radius = lrow[6]
    soft_k = jnp.where(radius > F32(0.0), dist / radius,
                       jnp.full_like(dist, settings.soft_shadow_k))
    dist_eff = jnp.where(hit_f > F32(0.5), dist, F32(0.0))

    if os.environ.get("K2_QUALITY"):
        v_full = np.asarray(rt.trace_rays_kernel(
            static, settings.with_(secondary_lod_iters=0), 0, lp, nparams,
            p_off, l, dist_eff, soft_k)[0])
        v_lod = np.asarray(rt.trace_rays_kernel(
            static, settings, 0, lp, nparams, p_off, l, dist_eff,
            soft_k)[0])
        dq = np.abs(v_full - v_lod)
        print(f"vis diff vs full: mean {dq.mean():.5f} "
              f"q99 {np.quantile(dq, 0.99):.5f} max {dq.max():.5f} "
              f"(lod={settings.secondary_lod_iters})")

    N_REP = 20

    @jax.jit
    def run(p_off, l, dist_eff, soft_k):
        def body(acc, i):
            v, _ = rt.trace_rays_kernel(static, settings, 0, lp, nparams,
                                        p_off, l,
                                        dist_eff + F32(1e-7) * i, soft_k)
            return acc + v.mean(), None
        acc, _ = jax.lax.scan(body, F32(0.0),
                              jnp.arange(N_REP, dtype=jnp.float32))
        return acc

    acc = float(run(p_off, l, dist_eff, soft_k))  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(p_off, l, dist_eff, soft_k))
        times.append(time.perf_counter() - t0)
    dt = min(times) / N_REP
    print(f"K2 c3 1080p: {dt * 1e3:.2f} ms/call  (mean vis {acc / N_REP:.4f})"
          f"  relax={settings.over_relax} "
          f"window={'off' if os.environ.get('K2_NO_WINDOW') else 'on'} "
          f"closed={'off' if os.environ.get('K2_NO_CLOSED') else 'on'}")


if __name__ == "__main__":
    main()
