"""Unit tests for pure math (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp

from surfjax.core.math import (
    BIG, pow_int, quadratic_smallest_root, vcross, vdot, vnormalize,
)


def test_quadratic_two_roots():
    # (t-1)(t-3) = t^2 -4t +3 -> b_half=-2, c=3
    t0, t1, has = quadratic_smallest_root(jnp.float32(-2.0), jnp.float32(3.0))
    assert bool(has)
    np.testing.assert_allclose(float(t0), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(t1), 3.0, rtol=1e-6)


def test_quadratic_negative_discriminant():
    t0, t1, has = quadratic_smallest_root(jnp.float32(0.0), jnp.float32(1.0))
    assert not bool(has)
    assert float(t0) == float(BIG)
    assert float(t1) == float(-BIG)


def test_quadratic_grazing():
    # double root at t=2: t^2 -4t +4
    t0, t1, has = quadratic_smallest_root(jnp.float32(-2.0), jnp.float32(4.0))
    assert bool(has)
    np.testing.assert_allclose(float(t0), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(t1), 2.0, rtol=1e-6)


def test_quadratic_inside_origin():
    # roots -1, 3 (ray origin inside sphere): t^2 -2t -3
    t0, t1, has = quadratic_smallest_root(jnp.float32(-1.0), jnp.float32(-3.0))
    assert bool(has)
    np.testing.assert_allclose(float(t0), -1.0, rtol=1e-6)
    np.testing.assert_allclose(float(t1), 3.0, rtol=1e-6)


def test_pow_int_matches_numpy(rng):
    x = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    for n in (0, 1, 2, 3, 7, 16, 31, 64):
        got = np.asarray(pow_int(x, n))
        want = np.asarray(x, np.float64) ** n
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=2e-5)


def test_normalize_unit_length(rng):
    v = rng.normal(size=(3, 100)).astype(np.float32)
    n = vnormalize((jnp.asarray(v[0]), jnp.asarray(v[1]), jnp.asarray(v[2])))
    lens = np.asarray(vdot(n, n))
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)


def test_cross_orthogonal(rng):
    a = tuple(jnp.asarray(rng.normal(size=50).astype(np.float32))
              for _ in range(3))
    b = tuple(jnp.asarray(rng.normal(size=50).astype(np.float32))
              for _ in range(3))
    c = vcross(a, b)
    np.testing.assert_allclose(np.asarray(vdot(a, c)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vdot(b, c)), 0.0, atol=1e-4)
