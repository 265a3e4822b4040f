"""Golden parity for configs 2 and 3 (BASELINE.json:8-9; SURVEY.md §4.1).

Strict (<=1 ULP, eager op-by-op) wherever the math is trig-free. Mandelbulb
pixels get the SURVEY.md §7.1 tolerance carve-out: XLA's sin/cos/acos/atan2
differ from libm by a few ULP even eagerly, and the DE iteration is chaotic.
"""

import jax
import numpy as np
import pytest

from surfjax import (
    Box, Camera, Material, Plane, PointLight, RenderSettings, Scene, Sphere,
    render, smooth_union,
)
from surfjax.golden import renderer as golden
from surfjax.io.image import max_ulp

from tests.scenes import config2_csg, config3_sdf


def test_config2_strict_ulp_parity_eager():
    scene, cam, settings = config2_csg(size=128)
    with jax.disable_jit():
        fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    np.testing.assert_array_equal(np.asarray(fb.hit), gold["hit"])
    np.testing.assert_array_equal(np.asarray(fb.obj_id), gold["obj_id"])
    m = max_ulp(np.asarray(fb.rgb), gold["rgb"])
    assert m <= 1, f"config2 shading differs by {m} ULP"
    md = max_ulp(np.asarray(fb.depth), gold["depth"])
    assert md <= 1, f"config2 depth differs by {md} ULP"
    assert 0.2 < gold["hit"].mean() <= 1.0


def _config3_no_mandelbulb(size):
    """config3 minus the Mandelbulb: trig-free SDF scene (strict parity)."""
    scene = Scene()
    blob = smooth_union(
        Sphere(center=(-0.9, -0.35, 3.2), radius=0.55),
        smooth_union(Sphere(center=(-0.35, 0.25, 3.1), radius=0.4),
                     Box(center=(-0.7, -0.05, 3.4),
                         half_extents=(0.45, 0.3, 0.3)), 0.25), 0.3)
    scene.add(blob, Material.blinn_phong(albedo=(0.3, 0.7, 0.5),
                                         shininess=32), engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.55)), engine="sdf")
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0),
                               color=(1.0, 0.98, 0.95)))
    cam = Camera.pinhole(size, size, fov_y_deg=45.0,
                         position=(0.0, 0.4, 0.0), target=(0.0, 0.0, 3.0))
    settings = RenderSettings(shadows=True, soft_shadows=True, ao=True,
                              ao_samples=5, max_steps=128)
    return scene, cam, settings


def test_config3_trigfree_strict_ulp_parity_eager():
    scene, cam, settings = _config3_no_mandelbulb(96)
    with jax.disable_jit():
        fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    np.testing.assert_array_equal(np.asarray(fb.hit), gold["hit"])
    m = max_ulp(np.asarray(fb.rgb), gold["rgb"])
    assert m <= 1, f"config3(trig-free) shading differs by {m} ULP"


def test_config3_full_tolerance_parity():
    """Full config 3 (with Mandelbulb): jitted, tolerance carve-out."""
    scene, cam, settings = config3_sdf(size=128)
    fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    hit_agree = (np.asarray(fb.hit) == gold["hit"]).mean()
    assert hit_agree > 0.995, f"hit masks agree on only {hit_agree:.4f}"
    d = np.abs(np.asarray(fb.rgb).astype(np.float64)
               - gold["rgb"].astype(np.float64))
    # chaotic DE silhouette pixels may flip; the bulk must be tight
    assert np.quantile(d, 0.995) < 1e-3
    assert d.mean() < 1e-4


def test_config5_scene_strict_parity_eager():
    """The animated/differentiable config's scene (blob + analytic floor,
    hard shadows) — strict <=1 ULP in op-by-op mode."""
    from tests.scenes import config5_anim_scene
    scene, cam, settings = config5_anim_scene(size=96)
    settings = settings.with_(max_steps=128)
    with jax.disable_jit():
        fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    np.testing.assert_array_equal(np.asarray(fb.hit), gold["hit"])
    m = max_ulp(np.asarray(fb.rgb), gold["rgb"])
    assert m <= 1, f"config5 shading differs by {m} ULP"
