"""Ring-sharded mesh intersection (parallel/ring_mesh.py — SURVEY §5.7
"scene outgrows HBM" ring analogue).

Pins: (a) the D-device ring is BITWISE equal to the single-device
full-table pass through the same code (the lexicographic (t, id)
reduction is order-independent); (b) the ring agrees with the default
grid-DDA engine on hits; (c) rays that miss are flagged identically.
Runs on the virtual 8-device CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from surfjax.core.math import BIG


def _mesh_tables():
    from surfjax.api import TriangleMesh
    from surfjax.engines.mesh import build_grid
    from surfjax.meshgen import octasphere

    v, f = octasphere(3)
    return build_grid(TriangleMesh(vertices=v, faces=f))


def _rays(n):
    rng = np.random.default_rng(5)
    # origins on a shell at radius 3, rays toward jittered sphere points
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o /= np.linalg.norm(o, axis=1, keepdims=True)
    o *= 3.0
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # a few guaranteed misses: rays pointing away
    d[: n // 8] = -d[: n // 8]
    return (tuple(jnp.asarray(o[:, k]) for k in range(3)),
            tuple(jnp.asarray(d[:, k]) for k in range(3)))


def _ring(tables, o, d, n_devices):
    from surfjax.parallel.ring_mesh import ring_trace, shard_triangles

    devs = np.asarray(jax.devices()[:n_devices])
    mesh = Mesh(devs, ("shard",))
    shards = shard_triangles(tables, n_devices)
    t, tri = ring_trace(shards, o, d, 1e-3, 1e4, mesh)
    return np.asarray(t), np.asarray(tri)


def test_ring_bitwise_vs_single_device():
    tables = _mesh_tables()
    o, d = _rays(1024)
    t1, tri1 = _ring(tables, o, d, 1)
    t8, tri8 = _ring(tables, o, d, 8)
    np.testing.assert_array_equal(t1, t8)
    np.testing.assert_array_equal(tri1, tri8)
    n_hit = int((t8 < BIG * 0.5).sum())
    assert 0 < n_hit < 1024  # both hits and misses exercised


def test_ring_matches_grid_dda():
    from surfjax.engines.mesh import intersect_mesh

    tables = _mesh_tables()
    o, d = _rays(1024)
    t_ring, tri_ring = _ring(tables, o, d, 8)

    params = {f"mesh0_{k}": jnp.asarray(v)
              for k, v in tables.arrays.items()}
    t_dda, tri_dda = intersect_mesh(tables.static, 0, params, o, d,
                                    1e-3, 1e4)
    t_dda = np.asarray(t_dda)
    tri_dda = np.asarray(tri_dda)
    hit_ring = t_ring < BIG * 0.5
    hit_dda = t_dda < BIG * 0.5
    np.testing.assert_array_equal(hit_ring, hit_dda)
    # same winning triangle and same hit distance on every hit lane
    # (identical Möller–Trumbore arithmetic; XLA fusion may differ
    # between the ring's broadcast form and the DDA's gather form, so
    # allow <= 1 ULP of drift on t)
    np.testing.assert_array_equal(tri_ring[hit_ring], tri_dda[hit_ring])
    np.testing.assert_allclose(t_ring[hit_ring], t_dda[hit_ring],
                               rtol=2e-7, atol=0.0)


@pytest.mark.parametrize("n_devices", [2, 4])
def test_ring_other_ring_sizes(n_devices):
    tables = _mesh_tables()
    o, d = _rays(512)
    t1, tri1 = _ring(tables, o, d, 1)
    tD, triD = _ring(tables, o, d, n_devices)
    np.testing.assert_array_equal(t1, tD)
    np.testing.assert_array_equal(tri1, triD)


def test_ring_mesh_smaller_than_ring():
    # 8 triangles over an 8-device ring: one triangle per shard; also
    # exercises ceil-division padding when tris < devices after split
    from surfjax.api import TriangleMesh
    from surfjax.engines.mesh import build_grid
    from surfjax.meshgen import octasphere

    v, f = octasphere(0)  # 8 faces
    tables = build_grid(TriangleMesh(vertices=v, faces=f))
    o, d = _rays(256)
    t1, tri1 = _ring(tables, o, d, 1)
    t8, tri8 = _ring(tables, o, d, 8)
    np.testing.assert_array_equal(t1, t8)
    np.testing.assert_array_equal(tri1, tri8)
    assert (t8 < BIG * 0.5).any()


def test_ring_padding_shards():
    # Triangle count NOT divisible by the ring size or the MT chunk:
    # octasphere(3) truncated to 509 tris over 8 devices -> per-shard
    # S=64 with 3 padding rows in the last shard, and a 509-vs-512
    # chunk-of-64 pad inside _mt_shard. Padding must not invent hits
    # and must stay bitwise-equal to the single-device pass.
    from surfjax.api import TriangleMesh
    from surfjax.engines.mesh import build_grid
    from surfjax.meshgen import octasphere

    v, f = octasphere(3)
    tables = build_grid(TriangleMesh(vertices=v, faces=f[:509]))
    n = tables.arrays["tri_v0"].shape[0]
    assert n == 509 and n % 8 != 0
    o, d = _rays(256)
    t1, tri1 = _ring(tables, o, d, 1)
    t8, tri8 = _ring(tables, o, d, 8)
    np.testing.assert_array_equal(t1, t8)
    np.testing.assert_array_equal(tri1, tri8)
    # no winner may be a padding id
    hit = t8 < BIG * 0.5
    assert hit.any()
    assert (tri8[hit] < n).all()
    assert (tri8[~hit] == n).all()
