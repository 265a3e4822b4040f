"""Wavefront (compacted) marching — the TPU answer to ray divergence.

Measured on config 3: a 64x128 pixel tile pays its slowest lane (mean
tile-max 40 march steps) while the mean lane needs ~9 — a ~3-4x divergence
tax that masking cannot recover. GPUs fix this with persistent-thread
wavefronts; the TPU-idiomatic equivalent implemented here:

  K1a  analytic hits + cheap proxy phase-1 per tile (as before)
  loop: XLA-side stable partition of rays (active first) — argsort +
        gather, which TPUs do at HBM bandwidth — then a Pallas ROUND
        kernel marches every tile 32 full-SDF steps; tiles whose lanes are
        all done exit in zero trips. Compaction keeps round tiles dense
        with active rays, so total work approaches the lane-step sum
        instead of the tile-max sum.
  K1c  winner attribution + normals + AO on the scattered-back results.

The rounds march the SCENE-MIN SDF (one combined march); the tile mode now
marches per object with progressive clipping, so the two modes agree to
hit-mask/epsilon rather than bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surfjax.core.math import BIG, F32
from surfjax.core.types import RenderSettings
from surfjax.engines.analytic import intersect_analytic
from surfjax.engines.sdf import ao_probes, eval_sdf
from surfjax.kernels.render_tile import (
    LANES, _PROXY_SWITCH, _interpret, _param_specs, _proxy_sdf_fn,
    _ray_specs, _read_params, _scene_sdf, _split, normals_core,
)

ROUND_STEPS = 32


# ---------------------------------------------------------------------------
# K1a: analytic hits + proxy phase 1
# ---------------------------------------------------------------------------

def _phase1_body(static, settings, n_leaves, n_nodes,
                 lp_ref, np_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 ta_ref, obj_ref, leaf_ref, t1_ref, need_ref):
    lp, nparams = _read_params(lp_ref, np_ref, n_leaves, n_nodes)
    analytic, sdf_objs, _ = _split(static)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])

    t_a = jnp.full_like(o[0], BIG)
    obj = jnp.full_like(o[0], -1.0)
    leaf = jnp.zeros_like(o[0])
    for i, oir in analytic:
        t_i, leaf_i = intersect_analytic(oir, lp, o, d, settings.t_min,
                                         settings.t_max)
        better = t_i < t_a
        t_a = jnp.where(better, t_i, t_a)
        obj = jnp.where(better, F32(float(i)), obj)
        leaf = jnp.where(better, leaf_i.astype(jnp.float32), leaf)

    t_clip = jnp.minimum(t_a, F32(settings.t_max))
    proxy_fn = _proxy_sdf_fn(sdf_objs, lp, nparams) if sdf_objs else None
    if proxy_fn is None:
        t1 = jnp.full_like(o[0], settings.t_min)
    else:
        sw = F32(_PROXY_SWITCH)
        t0 = jnp.full_like(o[0], settings.t_min)
        done0 = jnp.where(t0 >= t_clip, F32(1.0), F32(0.0))

        def cond(s):
            i, _, done = s
            return (i < settings.max_steps) & (jnp.min(done) < F32(0.5))

        def body(s):
            i, t, done = s
            px = o[0] + t * d[0]
            py = o[1] + t * d[1]
            pz = o[2] + t * d[2]
            h = proxy_fn((px, py, pz))
            near = jnp.where(h < sw, F32(1.0), F32(0.0))
            over = jnp.where(t > t_clip, F32(1.0), F32(0.0))
            done_new = jnp.maximum(done, jnp.maximum(near, over))
            t = jnp.where(done_new > F32(0.5), t, t + h)
            return i + 1, t, done_new

        _, t1, _ = jax.lax.while_loop(cond, body, (0, t0, done0))

    ta_ref[:] = t_a
    obj_ref[:] = obj
    leaf_ref[:] = leaf
    t1_ref[:] = t1
    need_ref[:] = jnp.where(t1 < t_clip, F32(1.0), F32(0.0))


# ---------------------------------------------------------------------------
# K1b: one wavefront round — ROUND_STEPS full-SDF substeps
# ---------------------------------------------------------------------------

def _round_body(static, settings, n_leaves, n_nodes,
                lp_ref, np_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                t_ref, hp_ref, sp_ref, done_ref, hit_ref, tclip_ref,
                to_ref, hpo_ref, spo_ref, doneo_ref, hito_ref):
    lp, nparams = _read_params(lp_ref, np_ref, n_leaves, n_nodes)
    _, sdf_objs, _ = _split(static)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    t_clip = tclip_ref[:]
    sdf_fn = lambda p: _scene_sdf(sdf_objs, lp, nparams, p)
    eps = F32(settings.hit_eps)
    es = F32(settings.hit_eps_scale)
    w = F32(settings.over_relax)
    relax = settings.over_relax > 1.0
    z0 = jnp.zeros_like(o[0])

    def cond(s):
        i, _, _, _, done, _ = s
        return (i < ROUND_STEPS) & (jnp.min(done) < F32(0.5))

    def body(s):
        i, t, h_prev, st_prev, done, hit = s
        px = o[0] + t * d[0]
        py = o[1] + t * d[1]
        pz = o[2] + t * d[2]
        h = sdf_fn((px, py, pz))
        if relax:
            ovr = jnp.where(st_prev > h_prev + jnp.abs(h),
                            F32(1.0), F32(0.0))
        else:
            ovr = z0
        ok = F32(1.0) - ovr
        eps_eff = eps + es * t
        hit_now = ok * jnp.where(h < eps_eff, F32(1.0), F32(0.0))
        over = ok * jnp.where(t > t_clip, F32(1.0), F32(0.0))
        active = F32(1.0) - done
        hit = jnp.maximum(hit, hit_now * active)
        done_new = jnp.maximum(done, jnp.maximum(hit_now, over))
        step = w * h
        t_next = jnp.where(ovr > F32(0.5), (t - st_prev) + h_prev, t + step)
        t = jnp.where(done_new > F32(0.5), t, t_next)
        h_prev = jnp.where(done_new > F32(0.5), h_prev, ok * h)
        st_prev = jnp.where(done_new > F32(0.5), st_prev, ok * step)
        return i + 1, t, h_prev, st_prev, done_new, hit

    _, t, hp, sp, done, hit = jax.lax.while_loop(
        cond, body, (0, t_ref[:], hp_ref[:], sp_ref[:], done_ref[:],
                     hit_ref[:]))
    to_ref[:] = t
    hpo_ref[:] = hp
    spo_ref[:] = sp
    doneo_ref[:] = done
    hito_ref[:] = hit


# ---------------------------------------------------------------------------
# K1c: winner attribution + normals + AO
# ---------------------------------------------------------------------------

def _finish_body(static, settings, n_leaves, n_nodes,
                 lp_ref, np_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_ref, objp_ref, leaf_ref, hit_ref,
                 obj_ref, nx_ref, ny_ref, nz_ref, ao_ref):
    lp, nparams = _read_params(lp_ref, np_ref, n_leaves, n_nodes)
    _, sdf_objs, _ = _split(static)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    t = t_ref[:]
    hit_f = hit_ref[:]
    obj = objp_ref[:]
    leaf = leaf_ref[:]

    t_sane = jnp.where(hit_f > F32(0.5), t, F32(0.0))
    p = (o[0] + t_sane * d[0], o[1] + t_sane * d[1], o[2] + t_sane * d[2])

    # resolve sdf winners (obj == -2 sentinel): argmin of per-object SDF
    if sdf_objs:
        if len(sdf_objs) == 1:
            sdf_obj_id = F32(float(sdf_objs[0][0]))
            obj = jnp.where(obj == F32(-2.0),
                            jnp.full_like(obj, float(sdf_objs[0][0])), obj)
        else:
            best_v = eval_sdf(sdf_objs[0][1], lp, nparams, p)
            sdf_obj_id = jnp.full_like(best_v, float(sdf_objs[0][0]))
            for i, oir in sdf_objs[1:]:
                v = eval_sdf(oir, lp, nparams, p)
                closer = v < best_v
                best_v = jnp.where(closer, v, best_v)
                sdf_obj_id = jnp.where(closer, F32(float(i)), sdf_obj_id)
            obj = jnp.where(obj == F32(-2.0), sdf_obj_id, obj)

    n = normals_core(static, settings, lp, nparams, p, obj, leaf, d)

    analytic, _, _ = _split(static)
    if settings.ao and (analytic or sdf_objs):
        from surfjax.kernels.render_tile import _ao_compute
        ao = _ao_compute(static, settings, lp, nparams, p, n)
    else:
        ao = jnp.ones_like(p[0])

    obj_ref[:] = obj
    nx_ref[:] = n[0]
    ny_ref[:] = n[1]
    nz_ref[:] = n[2]
    ao_ref[:] = ao


# ---------------------------------------------------------------------------
# Host-side (XLA) wavefront driver
# ---------------------------------------------------------------------------

def _call(body, static, settings, lp, nparams, ray_arrays, n_out: int):
    rows_total = ray_arrays[0].shape[0]
    R = settings.tile_rows
    ir = static.ir
    n_leaves = max(ir.n_leaves, 1)
    n_nodes = nparams.shape[0]
    b = functools.partial(body, static, settings, n_leaves, n_nodes)
    shp = jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32)
    return pl.pallas_call(
        b,
        out_shape=(shp,) * n_out,
        grid=(rows_total // R,),
        in_specs=_param_specs() + _ray_specs(len(ray_arrays), R),
        out_specs=tuple(_ray_specs(n_out, R)),
        interpret=_interpret(),
    )(lp, nparams, *ray_arrays)


def march_wavefront(static, settings: RenderSettings, lp, nparams, o2, d2):
    """Full primary intersection with wavefront compaction.

    o2/d2: (rows, 128) tiled ray arrays. Returns 2-D (rows, 128) arrays:
    (t, obj_f32 [-2 sentinel resolved downstream? no: resolved], leaf,
     hit_f, n(3), ao) — i.e. everything _render_padded needs.
    """
    rows, lanes = o2[0].shape
    N = rows * lanes

    ta, obj_a, leaf_a, t1, need = _call(
        _phase1_body, static, settings, lp, nparams,
        [o2[0], o2[1], o2[2], d2[0], d2[1], d2[2]], 5)

    _, sdf_objs, _ = _split(static)
    if not sdf_objs:
        hit_f = jnp.where(ta < BIG * F32(0.5), F32(1.0), F32(0.0))
        t = ta
        obj = obj_a
    else:
        # Compaction granularity is a (1, 128) ROW: element-level gathers
        # on TPU run ~50x below bandwidth, but permuting whole 512-byte
        # rows is near-memcpy. A row is active while ANY of its lanes is.
        t_clip = jnp.minimum(ta, F32(settings.t_max))
        st = {
            "ids": jnp.arange(rows, dtype=jnp.int32),
            "t": t1,
            "hp": jnp.zeros_like(t1),
            "sp": jnp.zeros_like(t1),
            "done": F32(1.0) - need,
            "hit": jnp.zeros_like(t1),
            "ox": o2[0], "oy": o2[1], "oz": o2[2],
            "dx": d2[0], "dy": d2[1], "dz": d2[2],
            "tc": t_clip,
        }
        n_rounds = max(settings.max_steps // ROUND_STEPS, 1)

        def cond(c):
            i, st = c
            return (i < n_rounds) & (jnp.min(st["done"]) < F32(0.5))

        def _row_order(done):
            """Stable row partition (rows with any active lane first) via
            prefix sums + scatter over the 16K row indices."""
            act = jnp.min(done, axis=1) < F32(0.5)
            act_f = act.astype(jnp.float32)
            n_act = jnp.sum(act_f)
            pos_a = jnp.cumsum(act_f) - F32(1.0)
            pos_i = (n_act - F32(1.0)) + jnp.cumsum(F32(1.0) - act_f)
            pos = jnp.where(act, pos_a, pos_i).astype(jnp.int32)
            return (jnp.zeros(done.shape[0], jnp.int32)
                    .at[pos].set(jnp.arange(done.shape[0],
                                            dtype=jnp.int32)))

        def body(c):
            i, st = c
            order = _row_order(st["done"])
            st = {k: (v[order] if v.ndim == 1 else v[order, :])
                  for k, v in st.items()}
            t, hp, sp, done, hit = _call(
                _round_body, static, settings, lp, nparams,
                [st["ox"], st["oy"], st["oz"], st["dx"], st["dy"],
                 st["dz"], st["t"], st["hp"], st["sp"], st["done"],
                 st["hit"], st["tc"]], 5)
            st = dict(st, t=t, hp=hp, sp=sp, done=done, hit=hit)
            return i + 1, st

        _, st = jax.lax.while_loop(cond, body, (0, st))
        # scatter rows back to pixel order
        t_s = jnp.zeros_like(t1).at[st["ids"], :].set(st["t"])
        hit_s = jnp.zeros_like(t1).at[st["ids"], :].set(st["hit"])

        sdf_wins = (hit_s > F32(0.5)) & (t_s < ta)
        t = jnp.where(sdf_wins, t_s, ta)
        obj = jnp.where(sdf_wins, F32(-2.0), obj_a)
        hit_f = jnp.where(t < BIG * F32(0.5), F32(1.0), F32(0.0))

    obj, nx, ny, nz, ao = _call(
        _finish_body, static, settings, lp, nparams,
        [o2[0], o2[1], o2[2], d2[0], d2[1], d2[2],
         t, obj, leaf_a, hit_f], 5)
    return t, obj, leaf_a, (nx, ny, nz), ao, hit_f
