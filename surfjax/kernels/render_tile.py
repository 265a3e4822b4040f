"""Fused Pallas TPU kernels (SURVEY.md §2 components 6 + 17, §1 L2).

BASELINE.json:5 — "pixel-tile ray generation, ray-surface intersection
(analytic quadric hits + bounded sphere-tracing for SDFs) as a masked
fixed-trip loop with lane-level early-exit, finite-difference/analytic
normal estimation ... fused into one framebuffer-resident pass. Secondary
rays (hard/soft shadows, AO probes) re-enter the same intersection kernel
batched."

Kernel architecture (per pixel tile of tile_rows x 128 rays, VMEM-resident):

  K1 `render_tile_kernel` — the fused primary pass:
      analytic objects' exact hits (closed form, statically unrolled)
      -> bounded march of the combined scene SDF, t_max clipped to the
         analytic hit (so analytic surfaces cost zero march steps), with
         PER-TILE early exit: the while_loop stops the moment every lane in
         the tile is done, not after a fixed 256 trips
      -> winner resolution (object id via per-object SDF argmin at the hit)
      -> normals: analytic (quadric/slab, with CSG orientation signs) or
         4-tap tetrahedron FD of the scene SDF
      -> AO hemisphere probes fused in (they re-enter the same SDF evals)

  K2 `shadow_tile_kernel` — secondary-ray re-entry: batched shadow rays
      against the same scene (analytic any-hit + SDF march / penumbra
      accumulator) -> visibility factor per (hit, light).

Shading itself is a handful of elementwise FLOPs and is left to XLA, which
fuses it with the kernel outputs.

Mosaic constraints honored: no bool vectors in while_loop carries (f32
masks), scene parameters read as scalars from SMEM, static scene structure
fully unrolled into straight-line vector code.

The jax.numpy twin of this exact algorithm is `scene_march_twin` below
(SURVEY.md §4.3 kernel/twin parity).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surfjax.core.math import BIG, F32
from surfjax.core.scene_compile import (
    ENGINE_ANALYTIC, ENGINE_MESH, ENGINE_SDF, SceneWithMeshes,
)
from surfjax.core.types import FrameBuffers, RenderSettings
from surfjax.engines.analytic import intersect_analytic, object_normal_analytic
from surfjax.engines.sdf import ao_probes, eval_sdf
from surfjax.shade import shade_object


LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _read_params(lp_ref, np_ref, n_leaves: int, n_nodes: int):
    """Read scene parameter scalars out of SMEM into static structures that
    engines' code can index (python lists of scalar tuples)."""
    lp = [tuple(lp_ref[i, j] for j in range(8)) for i in range(n_leaves)]
    np_list = [[np_ref[i, 0]] for i in range(n_nodes)]

    class _Rows:
        def __init__(self, rows):
            self.rows = rows

        def __getitem__(self, idx):
            if isinstance(idx, tuple):
                return self.rows[idx[0]][idx[1]]
            return self.rows[idx]

    return _Rows(lp), _Rows(np_list)


def _split(static: SceneWithMeshes):
    ir = static.ir
    analytic = [(i, o) for i, o in enumerate(ir.objects)
                if o.engine == ENGINE_ANALYTIC]
    sdf = [(i, o) for i, o in enumerate(ir.objects)
           if o.engine == ENGINE_SDF]
    mesh = [(i, o) for i, o in enumerate(ir.objects)
            if o.engine == ENGINE_MESH]
    return analytic, sdf, mesh


def _scene_sdf(sdf_objs, lp, nparams, p):
    v = eval_sdf(sdf_objs[0][1], lp, nparams, p)
    for _, oir in sdf_objs[1:]:
        v = jnp.minimum(v, eval_sdf(oir, lp, nparams, p))
    return v


def _march(sdf_fn, o, d, t_start, t_clip, max_steps: int, hit_eps: float):
    """Bounded scene march with per-tile early exit. f32 mask carries.

    Returns (t, hit_f) where hit_f is a 0/1 f32 mask. Lanes whose t_clip is
    already below t_start skip the march entirely (done at trip 0).
    """
    eps = F32(hit_eps)
    t0 = jnp.full_like(o[0], t_start)
    done0 = jnp.where(t0 >= t_clip, F32(1.0), F32(0.0))
    hit0 = jnp.zeros_like(o[0])

    def cond(s):
        i, _, done, _ = s
        return (i < max_steps) & (jnp.min(done) < F32(0.5))

    def body(s):
        i, t, done, hit = s
        px = o[0] + t * d[0]
        py = o[1] + t * d[1]
        pz = o[2] + t * d[2]
        h = sdf_fn((px, py, pz))
        hit_now = jnp.where(h < eps, F32(1.0), F32(0.0))
        over = jnp.where(t > t_clip, F32(1.0), F32(0.0))
        active = F32(1.0) - done
        hit = jnp.maximum(hit, hit_now * active)
        done_new = jnp.maximum(done, jnp.maximum(hit_now, over))
        t = jnp.where(done_new > F32(0.5), t, t + h)
        return i + 1, t, done_new, hit

    _, t, _, hit = jax.lax.while_loop(cond, body, (0, t0, done0, hit0))
    return t, hit


def _fd_normal(sdf_fn, p, eps: float):
    e = F32(eps)
    s0 = sdf_fn((p[0] + e, p[1] - e, p[2] - e))
    s1 = sdf_fn((p[0] - e, p[1] - e, p[2] + e))
    s2 = sdf_fn((p[0] - e, p[1] + e, p[2] - e))
    s3 = sdf_fn((p[0] + e, p[1] + e, p[2] + e))
    nx = ((s0 - s1) - s2) + s3
    ny = ((-s0 - s1) + s2) + s3
    nz = ((-s0 + s1) - s2) + s3
    inv = F32(1.0) / jnp.sqrt((nx * nx + ny * ny) + nz * nz)
    return (nx * inv, ny * inv, nz * inv)


# ---------------------------------------------------------------------------
# The shared trace core — used by the Pallas kernel bodies AND by the jnp
# twin, so kernel-vs-twin parity tests exercise identical algorithms.
# ---------------------------------------------------------------------------

def trace_core(static, settings: RenderSettings, lp, nparams, o, d,
               t_min: float, t_max):
    """-> (t, obj_id i32, leaf_id i32, hit_f f32)."""
    analytic, sdf_objs, mesh = _split(static)
    assert not mesh, "mesh objects use the grid engine path, not this kernel"

    t_a = jnp.full_like(o[0], BIG)
    obj = jnp.full_like(o[0], -1.0)
    leaf = jnp.zeros_like(o[0])
    for i, oir in analytic:
        t_i, leaf_i = intersect_analytic(oir, lp, o, d, t_min, t_max)
        better = t_i < t_a
        t_a = jnp.where(better, t_i, t_a)
        obj = jnp.where(better, F32(float(i)), obj)
        leaf = jnp.where(better, leaf_i.astype(jnp.float32), leaf)

    if sdf_objs:
        sdf_fn = lambda p: _scene_sdf(sdf_objs, lp, nparams, p)
        t_clip = jnp.minimum(t_a, F32(t_max))
        t_s, hit_s = _march(sdf_fn, o, d, t_min, t_clip,
                            settings.max_steps, settings.hit_eps)
        sdf_wins = (hit_s > F32(0.5)) & (t_s < t_a)
        # which SDF object won: argmin of per-object SDF at the hit point
        if len(sdf_objs) == 1:
            sdf_obj_id = F32(float(sdf_objs[0][0]))
        else:
            px = o[0] + t_s * d[0]
            py = o[1] + t_s * d[1]
            pz = o[2] + t_s * d[2]
            best_v = eval_sdf(sdf_objs[0][1], lp, nparams, (px, py, pz))
            sdf_obj_id = jnp.full_like(best_v, float(sdf_objs[0][0]))
            for i, oir in sdf_objs[1:]:
                v = eval_sdf(oir, lp, nparams, (px, py, pz))
                closer = v < best_v
                best_v = jnp.where(closer, v, best_v)
                sdf_obj_id = jnp.where(closer, F32(float(i)), sdf_obj_id)
        t = jnp.where(sdf_wins, t_s, t_a)
        obj = jnp.where(sdf_wins, sdf_obj_id, obj)
        leaf = jnp.where(sdf_wins, F32(0.0), leaf)
    else:
        t = t_a

    hit_f = jnp.where(t < BIG * F32(0.5), F32(1.0), F32(0.0))
    return t, obj, leaf, hit_f


def normals_core(static, settings: RenderSettings, lp, nparams, p, obj, leaf,
                 d):
    """Normals for trace_core hits; face-forwarded."""
    analytic, sdf_objs, _ = _split(static)
    nx = jnp.zeros_like(p[0])
    ny = jnp.zeros_like(p[0])
    nz = jnp.ones_like(p[0])
    for i, oir in analytic:
        n_i = object_normal_analytic(oir, lp, p, leaf.astype(jnp.int32))
        sel = obj == F32(float(i))
        nx = jnp.where(sel, n_i[0], nx)
        ny = jnp.where(sel, n_i[1], ny)
        nz = jnp.where(sel, n_i[2], nz)
    if sdf_objs:
        sdf_fn = lambda pp: _scene_sdf(sdf_objs, lp, nparams, pp)
        n_s = _fd_normal(sdf_fn, p, settings.normal_eps)
        is_sdf = jnp.zeros_like(p[0])
        for i, _ in sdf_objs:
            is_sdf = jnp.maximum(is_sdf,
                                 jnp.where(obj == F32(float(i)),
                                           F32(1.0), F32(0.0)))
        sel = is_sdf > F32(0.5)
        nx = jnp.where(sel, n_s[0], nx)
        ny = jnp.where(sel, n_s[1], ny)
        nz = jnp.where(sel, n_s[2], nz)
    flip = (nx * d[0] + ny * d[1]) + nz * d[2] > F32(0.0)
    s = jnp.where(flip, F32(-1.0), F32(1.0))
    return (nx * s, ny * s, nz * s)


def visibility_core(static, settings: RenderSettings, lp, nparams,
                    o, l, dist):
    """Shadow visibility for a batch of secondary rays (re-entry path)."""
    analytic, sdf_objs, _ = _split(static)
    vis = jnp.ones_like(o[0])
    eps = settings.shadow_eps
    for _, oir in analytic:
        t_i, _ = intersect_analytic(oir, lp, o, l, eps, dist)
        vis = vis * jnp.where(t_i < dist, F32(0.0), F32(1.0))
    if sdf_objs:
        sdf_fn = lambda p: _scene_sdf(sdf_objs, lp, nparams, p)
        if settings.soft_shadows:
            vis = vis * _soft_march(sdf_fn, o, l,
                                    settings.soft_shadow_tmin, dist,
                                    settings.soft_shadow_k,
                                    settings.shadow_steps)
        else:
            t_s, hit_s = _march(sdf_fn, o, l, eps, dist,
                                settings.max_steps, settings.hit_eps)
            occ = (hit_s > F32(0.5)) & (t_s < dist)
            vis = vis * jnp.where(occ, F32(0.0), F32(1.0))
    return vis


def _soft_march(sdf_fn, o, d, t_start, t_max, k: float, steps: int):
    kf = F32(k)
    t0 = jnp.full_like(o[0], t_start)
    res0 = jnp.ones_like(o[0])
    done0 = jnp.zeros_like(o[0])

    def cond(s):
        i, _, _, done = s
        return (i < steps) & (jnp.min(done) < F32(0.5))

    def body(s):
        i, t, res, done = s
        px = o[0] + t * d[0]
        py = o[1] + t * d[1]
        pz = o[2] + t * d[2]
        h = sdf_fn((px, py, pz))
        res_new = jnp.minimum(res, kf * h / t)
        step = jnp.minimum(jnp.maximum(h, F32(1e-3)), F32(0.5))
        t_new = t + step
        done_new = jnp.maximum(
            done,
            jnp.maximum(jnp.where(res_new < F32(0.0), F32(1.0), F32(0.0)),
                        jnp.where(t_new > t_max, F32(1.0), F32(0.0))))
        res = jnp.where(done > F32(0.5), res, res_new)
        t = jnp.where(done > F32(0.5), t, t_new)
        return i + 1, t, res, done_new

    _, _, res, _ = jax.lax.while_loop(cond, body, (0, t0, res0, done0))
    return jnp.minimum(jnp.maximum(res, F32(0.0)), F32(1.0))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _k1_body(static, settings, n_leaves, n_nodes,
             lp_ref, np_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             t_ref, obj_ref, nx_ref, ny_ref, nz_ref, ao_ref, hit_ref):
    lp, nparams = _read_params(lp_ref, np_ref, n_leaves, n_nodes)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    t, obj, leaf, hit_f = trace_core(static, settings, lp, nparams, o, d,
                                     settings.t_min, settings.t_max)
    t_sane = jnp.where(hit_f > F32(0.5), t, F32(0.0))
    p = (o[0] + t_sane * d[0], o[1] + t_sane * d[1], o[2] + t_sane * d[2])
    n = normals_core(static, settings, lp, nparams, p, obj, leaf, d)

    _, sdf_objs, _ = _split(static)
    if settings.ao and sdf_objs:
        sdf_fn = lambda pp: _scene_sdf(sdf_objs, lp, nparams, pp)
        eps = F32(settings.shadow_eps)
        p_off = (p[0] + n[0] * eps, p[1] + n[1] * eps, p[2] + n[2] * eps)
        ao = ao_probes(sdf_fn, p_off, n, settings.ao_samples,
                       settings.ao_radius, settings.ao_strength)
    else:
        ao = jnp.ones_like(p[0])

    t_ref[:] = t
    obj_ref[:] = obj
    nx_ref[:] = n[0]
    ny_ref[:] = n[1]
    nz_ref[:] = n[2]
    ao_ref[:] = ao
    hit_ref[:] = hit_f


def _k2_body(static, settings, n_leaves, n_nodes,
             lp_ref, np_ref,
             ox_ref, oy_ref, oz_ref, lx_ref, ly_ref, lz_ref, dist_ref,
             vis_ref):
    lp, nparams = _read_params(lp_ref, np_ref, n_leaves, n_nodes)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    l = (lx_ref[:], ly_ref[:], lz_ref[:])
    vis_ref[:] = visibility_core(static, settings, lp, nparams, o, l,
                                 dist_ref[:])


def _ray_specs(n_arrays: int, rows: int):
    return [pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(n_arrays)]


def _param_specs():
    return [pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM)]


@functools.partial(jax.jit, static_argnums=(0, 1))
def render_tile_kernel(static, settings: RenderSettings, leaf_params,
                       node_params, o, d):
    """K1 over a padded (rows_total, 128) ray grid."""
    rows_total = o[0].shape[0]
    R = settings.tile_rows
    grid = (rows_total // R,)
    ir = static.ir
    n_leaves = max(ir.n_leaves, 1)
    n_nodes = node_params.shape[0]
    body = functools.partial(_k1_body, static, settings, n_leaves, n_nodes)
    shp = jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32)
    out = pl.pallas_call(
        body,
        out_shape=(shp,) * 7,
        grid=grid,
        in_specs=_param_specs() + _ray_specs(6, R),
        out_specs=tuple(_ray_specs(7, R)),
        interpret=_interpret(),
    )(leaf_params, node_params, o[0], o[1], o[2], d[0], d[1], d[2])
    t, obj, nx, ny, nz, ao, hit_f = out
    return t, obj, (nx, ny, nz), ao, hit_f


@functools.partial(jax.jit, static_argnums=(0, 1))
def trace_rays_kernel(static, settings: RenderSettings, leaf_params,
                      node_params, o, l, dist):
    """K2: batched secondary-ray visibility (same intersection core)."""
    rows_total = o[0].shape[0]
    R = settings.tile_rows
    grid = (rows_total // R,)
    ir = static.ir
    n_leaves = max(ir.n_leaves, 1)
    n_nodes = node_params.shape[0]
    body = functools.partial(_k2_body, static, settings, n_leaves, n_nodes)
    shp = jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32)
    vis = pl.pallas_call(
        body,
        out_shape=shp,
        grid=grid,
        in_specs=_param_specs() + _ray_specs(7, R),
        out_specs=_ray_specs(1, R)[0],
        interpret=_interpret(),
    )(leaf_params, node_params, o[0], o[1], o[2], l[0], l[1], l[2], dist)
    return vis


# ---------------------------------------------------------------------------
# jnp twin of the kernel algorithm (SURVEY.md §4.3)
# ---------------------------------------------------------------------------

def scene_march_twin(static, settings: RenderSettings, leaf_params,
                     node_params, o, d):
    """Pure-jnp twin of K1 on flat rays (no tiling, no Pallas)."""
    lp = leaf_params
    nparams = node_params
    t, obj, leaf, hit_f = trace_core(static, settings, lp, nparams, o, d,
                                     settings.t_min, settings.t_max)
    t_sane = jnp.where(hit_f > F32(0.5), t, F32(0.0))
    p = (o[0] + t_sane * d[0], o[1] + t_sane * d[1], o[2] + t_sane * d[2])
    n = normals_core(static, settings, lp, nparams, p, obj, leaf, d)
    _, sdf_objs, _ = _split(static)
    if settings.ao and sdf_objs:
        sdf_fn = lambda pp: _scene_sdf(sdf_objs, lp, nparams, pp)
        eps = F32(settings.shadow_eps)
        p_off = (p[0] + n[0] * eps, p[1] + n[1] * eps, p[2] + n[2] * eps)
        ao = ao_probes(sdf_fn, p_off, n, settings.ao_samples,
                       settings.ao_radius, settings.ao_strength)
    else:
        ao = jnp.ones_like(p[0])
    return t, obj, n, ao, hit_f


# ---------------------------------------------------------------------------
# Full pallas-backend frame: K1 -> secondary batches -> K2 -> shade (XLA)
# ---------------------------------------------------------------------------

def _pad_rays(arrs, rows: int):
    """Flat (N,) ray components -> (rows_total, 128) padded by edge-repeat."""
    n = arrs[0].shape[0]
    block = rows * LANES
    n_pad = ((n + block - 1) // block) * block
    out = []
    for a in arrs:
        a = jnp.pad(a, (0, n_pad - n), mode="edge")
        out.append(a.reshape(n_pad // LANES, LANES))
    return tuple(out), n


def render_rays_pallas(static, settings: RenderSettings, params, o, d
                       ) -> FrameBuffers:
    """Pallas-backend equivalent of pipeline.frame.render_rays."""
    from surfjax.core.scene_compile import (
        LIGHT_DIRECTIONAL, LIGHT_POINT,
    )
    ir = static.ir
    _, _, mesh = _split(static)
    if mesh:
        raise NotImplementedError(
            "pallas backend: mesh objects use the grid engine (todo); "
            "use backend='jnp'")

    lp = params["leaf_params"]
    nparams = params["node_params"]
    R = settings.tile_rows

    (ox, oy, oz, dx, dy, dz), n_rays = _pad_rays(
        (o[0], o[1], o[2], d[0], d[1], d[2]), R)
    t, obj, n, ao, hit_f = render_tile_kernel(
        static, settings, lp, nparams, (ox, oy, oz), (dx, dy, dz))

    t_sane = jnp.where(hit_f > F32(0.5), t, F32(0.0))
    p = (ox + t_sane * dx, oy + t_sane * dy, oz + t_sane * dz)
    eps = F32(settings.shadow_eps)
    p_off = (p[0] + n[0] * eps, p[1] + n[1] * eps, p[2] + n[2] * eps)

    light_terms = []
    for li, kind in enumerate(ir.lights):
        lrow = params["lights"][li]
        if kind == LIGHT_POINT:
            lvx = lrow[0] - p_off[0]
            lvy = lrow[1] - p_off[1]
            lvz = lrow[2] - p_off[2]
            dist = jnp.sqrt((lvx * lvx + lvy * lvy) + lvz * lvz)
            inv = F32(1.0) / dist
            l = (lvx * inv, lvy * inv, lvz * inv)
        else:
            l = (jnp.full_like(p_off[0], -lrow[0]),
                 jnp.full_like(p_off[0], -lrow[1]),
                 jnp.full_like(p_off[0], -lrow[2]))
            dist = jnp.full_like(p_off[0], settings.t_max)
        lcol = (lrow[3], lrow[4], lrow[5])
        if settings.shadows:
            vis = trace_rays_kernel(static, settings, lp, nparams,
                                    p_off, l, dist)
        else:
            vis = jnp.ones_like(p_off[0])
        light_terms.append((l, lcol, vis))

    v = (-dx, -dy, -dz)
    ambient = (params["ambient"][0], params["ambient"][1],
               params["ambient"][2])
    bg = settings.background
    r = jnp.full_like(p[0], bg[0])
    g = jnp.full_like(p[0], bg[1])
    b = jnp.full_like(p[0], bg[2])
    hit_mask = hit_f > F32(0.5)
    for i, oir in enumerate(ir.objects):
        mat_row = params["materials"][oir.mat]
        ri, gi, bi = shade_object(mat_row, oir.shininess, ambient, ao, n, v,
                                  light_terms)
        sel = hit_mask & (obj == F32(float(i)))
        r = jnp.where(sel, ri, r)
        g = jnp.where(sel, gi, g)
        b = jnp.where(sel, bi, b)

    def unpad(a):
        return a.reshape(-1)[:n_rays]

    hitf = unpad(hit_f)
    return FrameBuffers(
        rgb=jnp.stack([unpad(r), unpad(g), unpad(b)], axis=-1),
        depth=unpad(t_sane),
        normal=jnp.stack([unpad(n[0]) * hitf, unpad(n[1]) * hitf,
                          unpad(n[2]) * hitf], axis=-1),
        hit=hitf,
        obj_id=jnp.where(hitf > F32(0.5), unpad(obj).astype(jnp.int32),
                         jnp.int32(-1)),
    )
