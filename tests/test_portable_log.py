"""Bitwise-portable log (r5, verdict Next #6): the three mirrors —
core.math.portable_log (jnp), golden/renderer._portable_log (NumPy),
golden/cpp portable_logf (C++, exercised through a full golden render)
— must agree BITWISE, and the value must be accurate against f64 log.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from surfjax.core.math import portable_log
from surfjax.golden.renderer import _portable_log as np_portable_log


def _domain_samples(n=200000, seed=0):
    rng = np.random.default_rng(seed)
    return np.concatenate([
        rng.uniform(1e-30, 1e-20, n // 4),
        rng.uniform(1e-12, 1e-3, n // 4),
        rng.uniform(1e-3, 2.0, n // 4),
        rng.uniform(2.0, 1e6, n // 4),
    ]).astype(np.float32)


def test_jnp_and_numpy_mirrors_bitwise():
    xs = _domain_samples()
    a = np.asarray(portable_log(jnp.asarray(xs)))
    b = np_portable_log(xs)
    assert a.dtype == np.float32 and b.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_portable_log_accuracy():
    xs = _domain_samples(seed=1)
    got = np_portable_log(xs).astype(np.float64)
    ref = np.log(xs.astype(np.float64))
    err = np.abs(got - ref)
    # error measured in F32 ulps of the result's magnitude (|log| spans
    # [0, ~70]; near x=1 the result itself -> 0 and abs error ~1e-10)
    ulp = err / np.spacing(np.maximum(np.abs(ref), 1e-3).astype(np.float32)
                           ).astype(np.float64)
    assert float(ulp.max()) < 4.0, float(ulp.max())
    assert float(err.max()) < 4e-6, float(err.max())


def test_cpp_mirror_via_golden_render():
    """Full-scene check of the C++ mirror: the NumPy golden and the C++
    golden must produce the IDENTICAL frame with bulb_log='portable'
    (they already must at 'hw' — tests/test_cpp_golden.py); and the
    portable frame must differ from hw only at marched-DE-sensitive
    pixels (same hit count class)."""
    from tests.scenes import config3_sdf
    from surfjax.golden import cpp_bridge, renderer

    scene, cam, settings = config3_sdf(64)
    st = settings.with_(bulb_log="portable")
    g_np = renderer.render(scene, cam, st)
    g_cpp = cpp_bridge.render(scene, cam, st)
    for k in ("rgb", "depth", "hit"):
        np.testing.assert_array_equal(
            np.asarray(g_np[k], np.float32),
            np.asarray(g_cpp[k], np.float32), err_msg=k)
    # sanity: portable-vs-hw stays in the small-perturbation class
    g_hw = renderer.render(scene, cam, settings)
    agree = (g_np["hit"] == g_hw["hit"]).mean()
    assert agree > 0.995, agree


def test_kernel_portable_log_plumbed():
    """The pallas kernel path (interpret mode here) accepts
    bulb_log='portable' and still matches the NumPy golden to the c3
    marched tolerance class."""
    import jax
    from tests.scenes import config3_sdf
    from surfjax.golden import renderer
    from surfjax.pipeline.frame import render_frame

    scene, cam, settings = config3_sdf(64)
    st = settings.with_(backend="pallas", tile_rows=8,
                        bulb_log="portable", over_relax=1.0,
                        secondary_lod_iters=0, ao_lod_iters=0)
    fb = render_frame(scene, cam, st)
    g = renderer.render(scene, cam, st)
    hit_agree = (np.asarray(fb.hit) == g["hit"]).mean()
    assert hit_agree > 0.99, hit_agree
    d = np.abs(np.asarray(fb.rgb) - g["rgb"])
    assert np.quantile(d, 0.99) < 0.12
