"""Packet (per-tile) triangle-mesh intersection for the Pallas backend.

The grid-DDA traversal (engines/mesh.py) is correct everywhere but is
element-gather bound — measured ~6.8 s/frame at 1080p on TPU (element
gathers run ~50x below HBM bandwidth). The TPU-shaped replacement:

  1. XLA side, per frame: clip every ray to the mesh AABB; each kernel
     tile's frustum is the AABB of its lanes' entry/exit segment endpoints
     (exact for line segments, hence conservative for the tile). Candidate
     triangles = tri-AABB vs tile-AABB overlap, compacted to a padded
     (tiles, K) index table by prefix-sum scatter; candidate data is one
     fast row-gather of the packed triangle table.
  2. Pallas kernel, per tile: fori over the tile's candidate count with
     dynamic scalar reads from the VMEM candidate block — branch-free
     Moller-Trumbore over the whole (tile_rows, 128) ray block, capturing
     the winning triangle's geometric normal and barycentric-interpolated
     vertex normals in-loop (no post-hoc gathers). Tiles whose candidate
     count overflows K fall back to scanning the full packed table
     (VMEM-resident) under a tile-level cond — correctness never depends
     on K.

Candidate sets are conservative, so results equal brute-force/grid-DDA
nearest hits exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surfjax.core.math import BIG, F32
from surfjax.core.types import RenderSettings
from surfjax.engines.mesh import MeshStatic, _mesh_arrays
from surfjax.kernels.render_tile import LANES, _interpret

PACKET_K = 1024  # candidate budget per tile; overflow -> full-table scan
# Above this triangle count the full packed table (96 B/tri) no longer
# fits comfortably in VMEM alongside the ray/candidate blocks, so the
# overflow fallback would blow the ~16 MB budget; callers must route
# such meshes through the grid-DDA path (engines/mesh.intersect_mesh).
MAX_PACKET_TRIS = 40_000


def mesh_candidates(ms: MeshStatic, tri_packed, o2, d2, t_min, t_max,
                    tile_rows: int, K: int = PACKET_K):
    """-> (cand_data (tiles, K, 24), counts (tiles,) i32).

    Conservative per-tile candidate sets via segment-AABB culling.
    """
    rows, lanes = o2[0].shape
    tiles = rows // tile_rows
    bmin = jnp.asarray(ms.bbox_min, jnp.float32)
    bext = jnp.asarray([ms.cell_size[0] * ms.nx, ms.cell_size[1] * ms.ny,
                        ms.cell_size[2] * ms.nz], jnp.float32)
    bmax = bmin + bext

    # per-lane ray/bbox clip (slab)
    t_lo = jnp.full_like(o2[0], t_min)
    t_hi = jnp.asarray(t_max, jnp.float32) * jnp.ones_like(o2[0])
    for ax in range(3):
        dz = d2[ax] == F32(0.0)
        inv = F32(1.0) / jnp.where(dz, F32(1.0), d2[ax])
        ta = (bmin[ax] - o2[ax]) * inv
        tb = (bmax[ax] - o2[ax]) * inv
        tn = jnp.minimum(ta, tb)
        tf = jnp.maximum(ta, tb)
        in_slab = (o2[ax] > bmin[ax]) & (o2[ax] < bmax[ax])
        tn = jnp.where(dz, jnp.where(in_slab, -BIG, BIG), tn)
        tf = jnp.where(dz, jnp.where(in_slab, BIG, -BIG), tf)
        t_lo = jnp.maximum(t_lo, tn)
        t_hi = jnp.minimum(t_hi, tf)
    valid = t_lo <= t_hi

    # segment endpoints; invalid lanes contribute empty AABBs
    def seg_aabb(ax):
        pa = o2[ax] + t_lo * d2[ax]
        pb = o2[ax] + t_hi * d2[ax]
        lo = jnp.minimum(pa, pb)
        hi = jnp.maximum(pa, pb)
        lo = jnp.where(valid, lo, BIG)
        hi = jnp.where(valid, hi, -BIG)
        lo = lo.reshape(tiles, tile_rows * lanes).min(axis=1)
        hi = hi.reshape(tiles, tile_rows * lanes).max(axis=1)
        return lo, hi

    tlo = []
    thi = []
    for ax in range(3):
        lo, hi = seg_aabb(ax)
        tlo.append(lo)
        thi.append(hi)

    # triangle AABBs (F, 3) lo/hi from packed v0/e1/e2
    v0 = tri_packed[:, 0:3]
    p1 = v0 + tri_packed[:, 3:6]
    p2 = v0 + tri_packed[:, 6:9]
    tri_lo = jnp.minimum(jnp.minimum(v0, p1), p2)
    tri_hi = jnp.maximum(jnp.maximum(v0, p1), p2)

    eps = F32(1e-4)
    overlap = jnp.ones((tiles, tri_packed.shape[0]), bool)
    for ax in range(3):
        overlap = overlap & (tri_lo[None, :, ax] <= thi[ax][:, None] + eps)
        overlap = overlap & (tri_hi[None, :, ax] >= tlo[ax][:, None] - eps)

    counts = overlap.sum(axis=1).astype(jnp.int32)
    pos = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1
    keep = overlap & (pos < K)
    tile_idx = jnp.arange(tiles, dtype=jnp.int32)[:, None]
    flat_idx = jnp.where(keep, tile_idx * K + pos, jnp.int32(2 ** 30))
    tri_ids = jnp.broadcast_to(
        jnp.arange(tri_packed.shape[0], dtype=jnp.int32)[None, :],
        overlap.shape)
    cand_ids = jnp.zeros(tiles * K, jnp.int32).at[
        flat_idx.reshape(-1)].set(tri_ids.reshape(-1), mode="drop")
    cand_data = tri_packed[cand_ids.reshape(tiles, K)]
    return cand_data, counts


def _mesh_body(settings, smooth: bool, any_hit: bool,
               counts_ref, cand_ref, full_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, nsx_ref, nsy_ref, nsz_ref, ngx_ref, ngy_ref, ngz_ref):
    i = pl.program_id(0)
    count = counts_ref[i]
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    t_maxv = tmax_ref[:]
    eps = F32(1e-7)
    t_min = F32(settings.t_min if not any_hit else settings.shadow_eps)

    def make_loop(ref, is_cand):
        def body(k, carry):
            t_best, nsx, nsy, nsz, ngx, ngy, ngz = carry
            if is_cand:
                row = lambda j: ref[0, k, j]
            else:
                row = lambda j: ref[k, j]
            v0 = (row(0), row(1), row(2))
            e1 = (row(3), row(4), row(5))
            e2 = (row(6), row(7), row(8))
            # Moller-Trumbore, branch-free on the whole tile
            pvx = d[1] * e2[2] - d[2] * e2[1]
            pvy = d[2] * e2[0] - d[0] * e2[2]
            pvz = d[0] * e2[1] - d[1] * e2[0]
            det = (e1[0] * pvx + e1[1] * pvy) + e1[2] * pvz
            ok = jnp.abs(det) > eps
            inv_det = F32(1.0) / jnp.where(ok, det, F32(1.0))
            tvx = o[0] - v0[0]
            tvy = o[1] - v0[1]
            tvz = o[2] - v0[2]
            u = ((tvx * pvx + tvy * pvy) + tvz * pvz) * inv_det
            qvx = tvy * e1[2] - tvz * e1[1]
            qvy = tvz * e1[0] - tvx * e1[2]
            qvz = tvx * e1[1] - tvy * e1[0]
            v = ((d[0] * qvx + d[1] * qvy) + d[2] * qvz) * inv_det
            t = ((e2[0] * qvx + e2[1] * qvy) + e2[2] * qvz) * inv_det
            hit = (ok & (u >= F32(0.0)) & (v >= F32(0.0))
                   & (u + v <= F32(1.0)) & (t > t_min) & (t < t_maxv)
                   & (t < t_best))
            if not any_hit:
                gn = (row(9), row(10), row(11))
                if smooth:
                    n0 = (row(12), row(13), row(14))
                    n1 = (row(15), row(16), row(17))
                    n2 = (row(18), row(19), row(20))
                    w = F32(1.0) - u - v
                    sx = (w * n0[0] + u * n1[0]) + v * n2[0]
                    sy = (w * n0[1] + u * n1[1]) + v * n2[1]
                    sz = (w * n0[2] + u * n1[2]) + v * n2[2]
                    inv = F32(1.0) / jnp.sqrt((sx * sx + sy * sy) + sz * sz)
                    sx, sy, sz = sx * inv, sy * inv, sz * inv
                else:
                    sx = gn[0] * jnp.ones_like(u)
                    sy = gn[1] * jnp.ones_like(u)
                    sz = gn[2] * jnp.ones_like(u)
                nsx = jnp.where(hit, sx, nsx)
                nsy = jnp.where(hit, sy, nsy)
                nsz = jnp.where(hit, sz, nsz)
                ngx = jnp.where(hit, gn[0], ngx)
                ngy = jnp.where(hit, gn[1], ngy)
                ngz = jnp.where(hit, gn[2], ngz)
            t_best = jnp.where(hit, t, t_best)
            return t_best, nsx, nsy, nsz, ngx, ngy, ngz
        return body

    z = jnp.zeros_like(o[0])
    init = (jnp.full_like(o[0], BIG), z, z, jnp.ones_like(o[0]),
            z, z, jnp.ones_like(o[0]))

    n_full = full_ref.shape[0]
    K = cand_ref.shape[1]

    def cand_path():
        return jax.lax.fori_loop(0, jnp.minimum(count, K),
                                 make_loop(cand_ref, True), init)

    def full_path():
        return jax.lax.fori_loop(0, n_full, make_loop(full_ref, False),
                                 init)

    out = jax.lax.cond(count > K, full_path, cand_path)
    t_best, nsx, nsy, nsz, ngx, ngy, ngz = out
    t_ref[:] = t_best
    nsx_ref[:] = nsx
    nsy_ref[:] = nsy
    nsz_ref[:] = nsz
    ngx_ref[:] = ngx
    ngy_ref[:] = ngy
    ngz_ref[:] = ngz


def mesh_tile_kernel(ms: MeshStatic, settings: RenderSettings, tri_packed,
                     o2, d2, t_max, any_hit: bool = False):
    """Packet mesh intersection over (rows, 128)-tiled rays.

    Returns (t (rows,128), n_shade(3), n_geom(3)); t == BIG on miss.
    t_max may be a per-lane array (shadow distance).
    """
    rows = o2[0].shape[0]
    R = settings.tile_rows
    tiles = rows // R
    cand, counts = mesh_candidates(ms, tri_packed, o2, d2, settings.t_min,
                                   t_max, R)
    t_maxv = jnp.asarray(t_max, jnp.float32) * jnp.ones_like(o2[0])

    body = functools.partial(_mesh_body, settings, ms.smooth, any_hit)
    shp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ray_spec = pl.BlockSpec((R, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        body,
        out_shape=(shp,) * 7,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # counts
            pl.BlockSpec((1, cand.shape[1], 24), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # candidates
            pl.BlockSpec(memory_space=pltpu.VMEM),        # full table
        ] + [ray_spec] * 7,
        out_specs=(ray_spec,) * 7,
        interpret=_interpret(),
    )(counts, cand, tri_packed, o2[0], o2[1], o2[2], d2[0], d2[1], d2[2],
      t_maxv)
    t, nsx, nsy, nsz, ngx, ngy, ngz = out
    return t, (nsx, nsy, nsz), (ngx, ngy, ngz)
