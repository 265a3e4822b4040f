#!/usr/bin/env python
"""DE-iteration-level divergence accounting for the c3 bulb marches.

The march while-loop costs, per sample, the MAX over the tile's lanes of
needed bulb iterations (the while-DE exits when every lane escapes).
A hypothetical fused march+DE loop ("flat scheduling": one bulb
iteration per trip, per-lane march bookkeeping on DE completion) costs,
per tile, the max over lanes of TOTAL iterations along the whole march
(+1 init trip per sample), at a per-trip flop overhead of roughly
(DE iter + march logic)/(DE iter) ~= 2.2x.

This tool re-simulates the primary bulb march and the bulb penumbra
march in jnp with per-sample iteration counters and reports both cost
models, deciding whether the fusion is worth building:

    projected_speedup = current_cost / (flat_cost * OVERHEAD)

Usage: python tools/iter_stats.py [config] [width] [height] [lod]
       (defaults c3, 960, 540, 0 = full DE)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OVERHEAD = 2.2  # fused-trip flops / bare-DE-iteration flops (estimate)


def bulb_iters_needed(prm, p, max_iters: int):
    """Per-lane bulb iterations until escape (capped). Mirrors
    sdf_mandelbulb_while's escape semantics. NOTE: hand-copied iteration
    body — keep in sync with engines/sdf.py (the sibling NumPy copy in
    tools/gen_lobe_bounds.py is drift-pinned to the engine by
    tests/test_engines.py::test_bulb_bound_constants)."""
    import jax.numpy as jnp
    from surfjax.core.math import F32

    c = (prm[0], prm[1], prm[2])
    scale = prm[3]
    bailout2 = prm[4] * prm[4] * F32(16.0)
    inv_s = F32(1.0) / scale
    px = (p[0] - c[0]) * inv_s
    py = (p[1] - c[1]) * inv_s
    pz = (p[2] - c[2]) * inv_s
    wx, wy, wz = px, py, pz
    m = (wx * wx + wy * wy) + wz * wz
    esc = m > bailout2
    iters = jnp.zeros_like(m)
    tiny = F32(1e-4)
    for _ in range(max_iters):
        active = ~esc
        iters = iters + jnp.where(active, F32(1.0), F32(0.0))
        x, y, z = wx, wy, wz
        x2 = x * x
        x4 = x2 * x2
        y2 = y * y
        z2 = z * z
        z4 = z2 * z2
        k3 = x2 + z2
        k3s = jnp.maximum(k3, tiny)
        k37 = ((k3s * k3s) * (k3s * k3s)) * ((k3s * k3s) * k3s)
        k2 = F32(1.0) / jnp.sqrt(k37)
        k1 = ((x4 + y2 * y2) + z4) - F32(6.0) * (y2 * z2) \
            - F32(6.0) * (x2 * y2) + F32(2.0) * (z2 * x2)
        k4 = (x2 - y2) + z2
        wx_new = px + F32(64.0) * ((((x * y) * z) * (x2 - z2)) * k4) \
            * ((x4 - F32(6.0) * (x2 * z2)) + z4) * k1 * k2
        wy_new = py + (F32(-16.0) * (y2 * k3) * (k4 * k4) + k1 * k1)
        wz_new = pz + F32(-8.0) * (y * k4) \
            * ((((x4 * x4) - F32(28.0) * ((x4 * x2) * z2))
                + F32(70.0) * (x4 * z4))
               - F32(28.0) * ((x2 * z2) * z4) + (z4 * z4)) * k1 * k2
        wx = jnp.where(active, wx_new, wx)
        wy = jnp.where(active, wy_new, wy)
        wz = jnp.where(active, wz_new, wz)
        m = jnp.where(active, (wx * wx + wy * wy) + wz * wz, m)
        esc = esc | (m > bailout2)
    return iters


def main():
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import Intrinsics, camera_ray_dirs_dyn
    from surfjax.core.math import F32
    from surfjax.core.scene_compile import LEAF_MANDELBULB
    from surfjax.engines.sdf import eval_sdf, leaf_sdf_fast
    from surfjax.kernels.render_tile import (
        LANES, _bound_entry, _object_bound, _split,
    )

    config = sys.argv[1] if len(sys.argv) > 1 else "configs/c3_sdf.yaml"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 540
    lod = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    R = 64

    scene, camera, settings, _ = load_config(config)
    if len(sys.argv) > 5:
        # bench.py's value_exact mode marches at over_relax=1.0 — the
        # achieved-side roofline capture must use the same trajectory
        # settings the headline discloses (r5): pass 1.0 here for it
        settings = settings.with_(over_relax=float(sys.argv[5]))
    print(f"settings: over_relax={settings.over_relax} lod={lod} "
          f"bulb_iter={settings.bulb_iter}")
    intr = camera.intrinsics
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

    _, sdf_objs, _ = _split(static)
    bulb = next(oir for _, oir in sdf_objs
                if any(lf.kind == LEAF_MANDELBULB for lf in oir.leaves))
    prm = lp[bulb.leaves[0].slot]
    max_it = bulb.leaves[0].p1 if lod == 0 else min(lod, bulb.leaves[0].p1)
    sdf_b = lambda p: eval_sdf(bulb, lp, nparams, p,
                               leaf_fn=leaf_sdf_fast)

    def account(name, o_, d_, t0, t_clip, soft_k=None, steps=128,
                march_unroll=8, de_unroll=4):
        """March with per-sample iteration accounting (primary when
        soft_k is None, else penumbra semantics).

        Cost models reported (r5, verdict Next #1c):
          current  — sum over samples of per-tile max NEEDED iterations.
                     Rounds DOWN vs what the kernel runs (march trips
                     execute in MARCH_UNROLL-step quanta, the DE in
                     DE_UNROLL-iteration quanta) — comparing a stage
                     time against this undercount is how r4 read
                     "MFU >= 1.0", which is impossible by construction.
          executed — per-tile march steps rounded up to march_unroll
                     quanta (a tile marches until its worst lane is
                     done, whole trips at a time; extra steps evaluate
                     parked lanes: 1 needed iteration), and per-step DE
                     iterations rounded up to de_unroll quanta. This is
                     the iteration-lane count the hardware actually
                     executes; achieved ps/iter-lane = stage_time /
                     executed, and MFU = synthetic_ps(at the SAME
                     unroll) / achieved_ps must be <= 1.
        """
        t = t0
        done = np.asarray(t0 >= t_clip, np.float32)
        res = np.ones_like(done)
        cur_cost = 0.0     # sum over samples of per-tile max iters
        flat_iters = np.zeros_like(done)  # per-lane total iters (+1/sample)
        lane_iters = 0.0
        n_tiles = done.shape[0] // R
        # per-(tile, step) trace for the executed-quanta model
        tile_max_needed = []   # list of (n_tiles,) arrays
        tile_any_active = []   # list of (n_tiles,) bool arrays
        w = F32(settings.over_relax)
        h_prev = jnp.zeros_like(t)
        st_prev = jnp.zeros_like(t)
        for _ in range(steps):
            act = 1.0 - done
            if act.max() == 0.0:
                break
            px = o_[0] + t * d_[0]
            py = o_[1] + t * d_[1]
            pz = o_[2] + t * d_[2]
            it = np.asarray(bulb_iters_needed(prm, (px, py, pz), max_it))
            it_act = it * act
            tiles = it_act.reshape(n_tiles, R * LANES)
            # tile pays max over ALL lanes unless every lane parked;
            # parked lanes evaluate at the park point (0 iters)
            cur_cost += float(tiles.max(axis=1).sum()) * R * LANES
            tile_max_needed.append(tiles.max(axis=1))
            tile_any_active.append(
                act.reshape(n_tiles, R * LANES).max(axis=1) > 0.0)
            flat_iters = flat_iters + (it_act + act)
            lane_iters += float(it_act.sum())
            h = np.asarray(sdf_b((px, py, pz)))
            if soft_k is None:
                hit = h < settings.hit_eps + settings.hit_eps_scale * \
                    np.asarray(t)
                over = np.asarray(t) > np.asarray(t_clip)
                done = np.maximum(done, np.maximum(hit, over) * act)
                t = t + float(settings.over_relax) * h * (1.0 - done)
            else:
                res_new = np.minimum(res, soft_k * h / np.maximum(
                    np.asarray(t), 1e-6))
                res = np.where(done > 0.5, res, res_new)
                s_allowed = (soft_k * h - res_new * np.asarray(t)) / (
                    soft_k + res_new)
                step = np.clip(h, 1e-3, np.maximum(0.5, s_allowed))
                t_new = np.asarray(t) + step
                done = np.maximum(done, np.maximum(
                    (res_new < 0.004).astype(np.float32),
                    (t_new > np.asarray(t_clip)).astype(np.float32)) * act)
                t = np.where(done > 0.5, np.asarray(t), t_new)
            t = jnp.asarray(t)
        flat_tiles = flat_iters.reshape(n_tiles, R * LANES)
        flat_cost = float(flat_tiles.max(axis=1).sum()) * R * LANES
        proj = cur_cost / max(flat_cost * OVERHEAD, 1.0)

        # executed-quanta model: per tile, march steps round up to whole
        # march_unroll trips past the last step with an active lane; the
        # rounded-in extra steps evaluate every lane at the park point
        # (1 needed iteration); each step's DE runs in de_unroll quanta.
        def exec_model(du: int) -> float:
            """Executed iteration-lanes at DE_UNROLL=du (march trips
            fixed at march_unroll) from the per-(step, tile) trace."""
            if not tile_max_needed:
                return 0.0
            needed = np.stack(tile_max_needed)          # (S, n_tiles)
            active = np.stack(tile_any_active)          # (S, n_tiles)
            S = needed.shape[0]
            last = np.where(active.any(axis=0),
                            S - 1 - np.argmax(active[::-1], axis=0), -1)
            n_steps_exec = np.minimum(
                np.ceil((last + 1) / march_unroll) * march_unroll, steps)
            step_idx = np.arange(S)[:, None]
            executed = step_idx < n_steps_exec[None, :]
            # steps past `last` (parked) still run one de-trip
            de_iters = np.ceil(np.maximum(needed, 1.0) / du) * du
            de_iters = np.where(active, de_iters, float(du))
            cost = float((de_iters * executed).sum()) * R * LANES
            # trailing full-park steps beyond the simulated S (a tile
            # whose last active step was S-1 still completes its trip)
            tail = np.maximum(n_steps_exec - S, 0.0)
            cost += float(tail.sum()) * du * R * LANES
            return cost

        exec_cost = exec_model(de_unroll)
        exec_cost8 = exec_model(8)
        print(f"{name:18s} current {cur_cost/1e6:9.1f}M iter-lanes | "
              f"executed(u{march_unroll}/u{de_unroll}) "
              f"{exec_cost/1e6:9.1f}M | "
              f"executed(u{march_unroll}/u8) {exec_cost8/1e6:9.1f}M | "
              f"flat {flat_cost/1e6:9.1f}M (x{OVERHEAD} flops) | "
              f"lane-sum {lane_iters/1e6:9.1f}M | "
              f"projected fused speedup {proj:0.2f}x")

    # primary march over the bulb (bound entry, progressive clip vs
    # plane/blob omitted — bulb-only cost is what we're deciding on)
    b = _object_bound(bulb, lp, nparams)
    exit_margin = settings.hit_eps + settings.hit_eps_scale * float(
        settings.t_max)
    t_clip = jnp.full_like(o[0], F32(settings.t_max))
    t1, clip2 = _bound_entry(b, o, d, jnp.full_like(o[0], 1e-3), t_clip,
                             exit_margin)
    account("primary bulb", o, d, t1, clip2, steps=settings.max_steps)

    # penumbra march from floor/blob hits toward the light
    from surfjax.kernels.render_tile import trace_core
    t, obj, leaf, hit_f, _ = trace_core(static, settings, lp, nparams,
                                        o, d, settings.t_min,
                                        settings.t_max)
    t_sane = jnp.where(hit_f > F32(0.5), t, F32(0.0))
    p = tuple(o[k] + t_sane * d[k] for k in range(3))
    lrow = params["lights"][0]
    lv = tuple(lrow[k] - p[k] for k in range(3))
    dist = jnp.sqrt((lv[0] * lv[0] + lv[1] * lv[1]) + lv[2] * lv[2])
    l = tuple(c / dist for c in lv)
    dist_eff = jnp.where(hit_f > F32(0.5), dist, F32(0.0))
    from surfjax.kernels.render_tile import _influence_window
    t_lo, t_hi = _influence_window(b, p, l, F32(settings.soft_shadow_tmin),
                                   dist_eff, F32(settings.soft_shadow_k))
    account("penumbra bulb", p, l,
            jnp.maximum(t_lo, F32(settings.soft_shadow_tmin)),
            jnp.minimum(dist_eff, t_hi),
            soft_k=float(settings.soft_shadow_k),
            steps=settings.shadow_steps)


if __name__ == "__main__":
    main()
