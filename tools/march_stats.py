"""March divergence statistics for the c3 workload (tool, not library).

Re-runs the kernel's march algorithms (closed-form bound entry/exit,
per-object full-SDF march with progressive clipping, penumbra march) in
pure jnp with step counters, on the SAME tile layout the pallas path
uses, and reports:

  - per-lane step distribution (mean / p50 / p95 / max)
  - sum of per-TILE maxima (what the tile kernel pays)
  - sum of per-lane steps (what perfect compaction would pay)
  - their ratio = the divergence tax per stage

Usage: python tools/march_stats.py [config] [width] [height] [tile_rows]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def march_steps(sdf_fn, o, d, t_start, t_clip, max_steps, hit_eps,
                relax=1.0, eps_scale=0.0, t_init=None):
    """_march with a per-lane step counter. Returns (t, hit, steps)."""
    import jax.numpy as jnp
    from surfjax.core.math import F32

    eps = F32(hit_eps)
    w = F32(relax)
    t = (t_start * jnp.ones_like(o[0])) if t_init is None else t_init
    done = jnp.where(t >= t_clip, F32(1.0), F32(0.0))
    hit = jnp.zeros_like(o[0])
    h_prev = jnp.zeros_like(o[0])
    st_prev = jnp.zeros_like(o[0])
    steps = jnp.zeros_like(o[0])
    for _ in range(max_steps):
        act = F32(1.0) - done
        if float(jnp.max(act)) == 0.0:
            break
        px = o[0] + t * d[0]
        py = o[1] + t * d[1]
        pz = o[2] + t * d[2]
        h = sdf_fn((px, py, pz))
        steps = steps + act
        if relax > 1.0:
            ovr = jnp.where(st_prev > h_prev + jnp.abs(h), F32(1.0), F32(0.0))
        else:
            ovr = jnp.zeros_like(h)
        ok = F32(1.0) - ovr
        eps_eff = eps + F32(eps_scale) * t
        hit_now = ok * jnp.where(h < eps_eff, F32(1.0), F32(0.0))
        over = ok * jnp.where(t > t_clip, F32(1.0), F32(0.0))
        hit = jnp.maximum(hit, hit_now * act)
        done_new = jnp.maximum(done, jnp.maximum(hit_now, over))
        step = w * h
        t_next = jnp.where(ovr > F32(0.5), (t - st_prev) + h_prev, t + step)
        t = jnp.where(done_new > F32(0.5), t, t_next)
        h_prev = jnp.where(done_new > F32(0.5), h_prev, ok * h)
        st_prev = jnp.where(done_new > F32(0.5), st_prev, ok * step)
        done = done_new
    return t, hit, steps


def soft_steps(sdf_fn, o, d, t_start, t_max, k, max_steps):
    import jax.numpy as jnp
    from surfjax.core.math import F32

    kf = k if hasattr(k, "shape") else F32(k)
    t = jnp.full_like(o[0], t_start)
    res = jnp.ones_like(o[0])
    done = jnp.where(t > t_max, F32(1.0), F32(0.0))
    steps = jnp.zeros_like(o[0])
    for _ in range(max_steps):
        act = F32(1.0) - done
        if float(jnp.max(act)) == 0.0:
            break
        px = o[0] + t * d[0]
        py = o[1] + t * d[1]
        pz = o[2] + t * d[2]
        h = sdf_fn((px, py, pz))
        steps = steps + act
        res_new = jnp.minimum(res, kf * h / t)
        s_allowed = (kf * h - res_new * t) / (kf + res_new)
        cap = jnp.maximum(F32(0.5), s_allowed)
        step = jnp.minimum(jnp.maximum(h, F32(1e-3)), cap)
        t_new = t + step
        done_new = jnp.maximum(
            done,
            jnp.maximum(jnp.where(res_new < F32(0.004), F32(1.0), F32(0.0)),
                        jnp.where(t_new > t_max, F32(1.0), F32(0.0))))
        res = jnp.where(done > F32(0.5), res, res_new)
        t = jnp.where(done > F32(0.5), t, t_new)
        done = done_new
    return res, steps


DUMP = {}


def report(name, steps_np, tile_rows, lanes=128):
    """steps_np: (rows_total, 128) array in tile layout."""
    DUMP[name.replace(" ", "_")] = steps_np
    rows_total = steps_np.shape[0]
    n_tiles = rows_total // tile_rows
    tiles = steps_np.reshape(n_tiles, tile_rows * lanes)
    tile_max = tiles.max(axis=1)
    lane_sum = float(steps_np.sum())
    tile_cost = float(tile_max.sum()) * tile_rows * lanes
    p = np.percentile(steps_np, [50, 95, 99])
    print(f"{name:28s} lane mean {steps_np.mean():7.2f} p50 {p[0]:5.0f} "
          f"p95 {p[1]:5.0f} p99 {p[2]:5.0f} max {steps_np.max():5.0f} | "
          f"tile-cost/lane-cost = {tile_cost / max(lane_sum, 1):.2f}x "
          f"(lane_sum {lane_sum / 1e6:.1f}M evals)")


def main():
    import jax
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics, camera_ray_dirs_dyn
    from surfjax.core.math import BIG, F32
    from surfjax.core.scene_compile import LIGHT_POINT
    from surfjax.engines.analytic import intersect_analytic
    from surfjax.engines.sdf import eval_sdf, leaf_sdf_fast
    from surfjax.kernels.render_tile import (
        _bound_entry, _object_bound, _split, LANES,
        normals_core,
    )

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/c3_sdf.yaml"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    R = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    scene, camera, settings, _ = load_config(config)
    intr = camera.intrinsics
    if (intr.width, intr.height) != (width, height):
        fov = 2.0 * float(np.degrees(np.arctan(0.5 * intr.height / intr.fy)))
        camera = Camera(Intrinsics.from_fov(width, height, fov),
                        rotation=camera.rotation, position=camera.position)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    intr = camera.intrinsics
    lp = params["leaf_params"]
    nparams = params["node_params"]

    H, W = height, width
    H2 = ((H + R - 1) // R) * R
    W2 = ((W + LANES - 1) // LANES) * LANES
    ty, tx = H2 // R, W2 // LANES
    rows = jnp.minimum(jnp.arange(H2, dtype=jnp.float32), F32(H - 1))
    cols = jnp.minimum(jnp.arange(W2, dtype=jnp.float32), F32(W - 1))
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")

    def tile_layout(a):
        return (a.reshape(ty, R, tx, LANES).transpose(0, 2, 1, 3)
                .reshape(ty * tx * R, LANES))

    R_flat = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
    cam_pos = np.asarray(camera.position, np.float32)
    rr_t = tile_layout(rr)
    cc_t = tile_layout(cc)
    d = camera_ray_dirs_dyn(intr, R_flat, rr_t, cc_t)
    o = (jnp.broadcast_to(F32(cam_pos[0]), rr_t.shape),
         jnp.broadcast_to(F32(cam_pos[1]), rr_t.shape),
         jnp.broadcast_to(F32(cam_pos[2]), rr_t.shape))

    analytic, sdf_objs, _ = _split(static)
    print(f"analytic objs: {[i for i, _ in analytic]}, "
          f"sdf objs: {[i for i, _ in sdf_objs]}")

    # analytic pass
    t_a = jnp.full_like(o[0], BIG)
    for i, oir in analytic:
        t_i, _ = intersect_analytic(oir, lp, o, d, settings.t_min,
                                    settings.t_max)
        t_a = jnp.minimum(t_a, t_i)
    t_clip = jnp.minimum(t_a, F32(settings.t_max))

    # primary: per object, cheap order, progressive clipping
    order = sorted(sdf_objs, key=lambda io: len(io[1].nodes))
    t_best = t_a
    obj_best = jnp.full_like(o[0], -1.0)
    exit_margin = settings.hit_eps + settings.hit_eps_scale * float(
        settings.t_max)
    for i, oir in order:
        sdf_i = lambda p, oir=oir: eval_sdf(oir, lp, nparams, p,
                                            leaf_fn=leaf_sdf_fast)
        # mirror the live kernel: closed-form bound entry/exit (the
        # iterative proxy phase no longer exists in render_tile.py)
        b_i = _object_bound(oir, lp, nparams)
        if b_i is not None:
            t1, clip_i = _bound_entry(
                b_i, o, d, jnp.full_like(o[0], settings.t_min), t_clip,
                exit_margin)
        else:
            t1 = jnp.full_like(o[0], settings.t_min)
            clip_i = t_clip
        t_i, hit_i, msteps = march_steps(
            sdf_i, o, d, 0.0, clip_i, settings.max_steps,
            settings.hit_eps, relax=settings.over_relax,
            eps_scale=settings.hit_eps_scale, t_init=t1)
        report(f"primary obj{i} full", np.asarray(msteps), R)
        better = (hit_i > F32(0.5)) & (t_i < t_best)
        t_best = jnp.where(better, t_i, t_best)
        obj_best = jnp.where(better, F32(float(i)), obj_best)
        t_clip = jnp.minimum(t_clip, t_best)

    hit_f = jnp.where(t_best < BIG * F32(0.5), F32(1.0), F32(0.0))
    print(f"hit fraction: {float(hit_f.mean()):.3f}")
    t_sane = jnp.where(hit_f > F32(0.5), t_best, F32(0.0))
    p = (o[0] + t_sane * d[0], o[1] + t_sane * d[1], o[2] + t_sane * d[2])
    leaf = jnp.zeros_like(o[0])
    n = normals_core(static, settings, lp, nparams, p, obj_best, leaf, d)
    eps = F32(settings.shadow_eps)
    p_off = (p[0] + n[0] * eps, p[1] + n[1] * eps, p[2] + n[2] * eps)

    # shadow rays toward light 0
    lrow = params["lights"][0]
    assert static.ir.lights[0] == LIGHT_POINT
    lvx = lrow[0] - p_off[0]
    lvy = lrow[1] - p_off[1]
    lvz = lrow[2] - p_off[2]
    dist = jnp.sqrt((lvx * lvx + lvy * lvy) + lvz * lvz)
    inv = F32(1.0) / dist
    l = (lvx * inv, lvy * inv, lvz * inv)
    radius = lrow[6]
    soft_k = jnp.where(radius > F32(0.0), dist / radius,
                       jnp.full_like(dist, settings.soft_shadow_k))
    dist_eff = jnp.where(hit_f > F32(0.5), dist, F32(0.0))

    nonmesh = sorted(analytic + sdf_objs, key=lambda io: len(io[1].nodes))
    soft_vis = jnp.ones_like(o[0])
    for i, oir in nonmesh:
        sdf_i = lambda pp, oir=oir: eval_sdf(oir, lp, nparams, pp,
                                             leaf_fn=leaf_sdf_fast)
        dist_i = jnp.where(soft_vis <= F32(0.0), F32(0.0), dist_eff)
        v_i, ssteps = soft_steps(sdf_i, p_off, l,
                                 settings.soft_shadow_tmin, dist_i,
                                 soft_k, settings.shadow_steps)
        report(f"shadow obj{i} march", np.asarray(ssteps), R)
        soft_vis = jnp.minimum(soft_vis, v_i)

    out = os.environ.get("MARCH_STATS_DUMP")
    if out:
        def untile(a):
            return (a.reshape(ty, tx, R, LANES).transpose(0, 2, 1, 3)
                    .reshape(H2, W2))

        np.savez(out, **{k: untile(v) for k, v in DUMP.items()},
                 H=H, W=W, H2=H2, W2=W2)
        print(f"dumped per-pixel step counts to {out}")


if __name__ == "__main__":
    main()
