"""Golden-image parity, config 1 (BASELINE.json:7): single analytic sphere,
pinhole camera, Lambert shading (SURVEY.md §4.1, the north-star test).

Two-level criterion (SURVEY.md §7 hard part 1):
  1. STRICT: the jax.numpy path executed op-by-op (jax.disable_jit) must
     match the independent NumPy golden to <=1 ULP — in practice 0 ULP,
     since both are sequences of correctly-rounded IEEE f32 ops in the same
     order. This proves the algorithms/semantics are identical.
  2. JITTED: under jit, XLA legally contracts mul+add into FMA (verified:
     jitted a*b+c == correctly-rounded fma to the bit) and rewrites
     x/sqrt(y) into x*rsqrt(y) (~2 ULP). These *raise* accuracy or move it
     by a couple ULP per op, but shift bits; near grazing rays the t
     amplification makes a fixed ULP bound meaningless. The jitted result is
     therefore checked against golden with a small absolute tolerance plus a
     high bitwise-agreement fraction.
"""

import jax
import numpy as np

from surfjax import render
from surfjax.golden import renderer as golden
from surfjax.io.image import max_ulp, ulp_diff_f32

from tests.scenes import config1_sphere


def test_config1_strict_ulp_parity_eager():
    scene, cam, settings = config1_sphere(size=128)
    with jax.disable_jit():
        fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    np.testing.assert_array_equal(np.asarray(fb.hit), gold["hit"])
    m = max_ulp(np.asarray(fb.rgb), gold["rgb"])
    assert m <= 1, f"shading differs by {m} ULP (>1)"
    md = max_ulp(np.asarray(fb.depth), gold["depth"])
    assert md <= 1, f"depth differs by {md} ULP (>1)"
    mn = max_ulp(np.asarray(fb.normal), gold["normal"])
    assert mn <= 1, f"normal differs by {mn} ULP (>1)"
    assert gold["hit"].mean() > 0.05


def test_config1_jitted_parity():
    scene, cam, settings = config1_sphere(size=256)
    fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    np.testing.assert_array_equal(np.asarray(fb.hit), gold["hit"])
    rgb = np.asarray(fb.rgb)
    d = np.abs(rgb.astype(np.float64) - gold["rgb"].astype(np.float64))
    assert d.max() <= 5e-4, f"jitted rgb deviates {d.max()} (> 5e-4)"
    u = ulp_diff_f32(rgb, gold["rgb"])
    assert (u <= 1).mean() > 0.5, "jitted path far from golden everywhere"


def test_config1_not_trivially_black():
    scene, cam, settings = config1_sphere(size=64)
    fb = render(scene, cam, settings)
    rgb = np.asarray(fb.rgb)
    assert rgb.max() > 0.1
    assert rgb.min() >= 0.0
