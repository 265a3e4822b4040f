"""Randomized scene fuzz (SURVEY.md §4.4 property-test class, extended).

Seeded, deterministic: a fixed RNG generates small random scenes across
the trig-free scene space (analytic + SDF engines, CSG combinators,
smooth blends, mixed engines, random materials/lights/settings) and
each scene is checked three ways:

  1. C++ golden vs NumPy golden — bitwise hit masks, <=1 ULP rgb (two
     independent strict-FP scalar oracles, the test_cpp_golden contract);
  2. eager (op-by-op) jnp path vs NumPy golden — bitwise hits, <=1 ULP
     rgb (the test_parity_configs contract for trig-free scenes);
  3. jitted jnp path vs NumPy golden — the legal-fusion envelope
     (hit agreement + bulk rgb quantile), since XLA may contract
     muladds and reassociate the shade epilogue (tools/op_parity.py).

Mandelbulb is deliberately excluded: its chaotic DE has a documented
tolerance carve-out and is covered by the config tests; the fuzzer's
job is the combinatorial space where the contract is STRICT.
"""

import jax
import numpy as np
import pytest

from surfjax import (
    Box, Camera, DirectionalLight, Material, Plane, PointLight,
    RenderSettings, Scene, Sphere, intersect, render, smooth_union,
    subtract, union,
)
from surfjax.golden import renderer as golden_np
from surfjax.io.image import max_ulp

SIZE = 48
N_SCENES = 8


def _rand_material(rng):
    albedo = tuple(float(a) for a in rng.uniform(0.1, 0.9, 3))
    if rng.random() < 0.5:
        return Material.lambert(albedo=albedo)
    return Material.blinn_phong(
        albedo=albedo,
        ks=float(rng.uniform(0.1, 0.6)),
        shininess=int(rng.choice([8, 16, 32, 64])))


def _rand_center(rng):
    # keep solids well ahead of the camera (origin) so it is outside
    # every object (CLAUDE.md sharp edge)
    return (float(rng.uniform(-1.4, 1.4)), float(rng.uniform(-1.0, 1.2)),
            float(rng.uniform(2.6, 5.0)))


def _rand_leaf(rng):
    if rng.random() < 0.5:
        return Sphere(center=_rand_center(rng),
                      radius=float(rng.uniform(0.3, 0.9)))
    return Box(center=_rand_center(rng),
               half_extents=tuple(float(h)
                                  for h in rng.uniform(0.25, 0.8, 3)))


def _rand_object(rng):
    """A primitive or a 2-leaf CSG/smooth combination."""
    r = rng.random()
    a = _rand_leaf(rng)
    if r < 0.35:
        return a, None  # plain leaf, either engine
    b = _rand_leaf(rng)
    if r < 0.55:
        return union(a, b), None
    if r < 0.70:
        return subtract(a, b), None
    if r < 0.85:
        return intersect(a, b), None
    # smooth blends march, so they are SDF-engine objects
    return smooth_union(a, b, float(rng.uniform(0.15, 0.4))), "sdf"


def _rand_scene(rng):
    scene = Scene()
    for _ in range(int(rng.integers(1, 4))):
        obj, engine = _rand_object(rng)
        if engine is None and rng.random() < 0.3:
            engine = "sdf"  # exercise marched forms of analytic shapes
        scene.add(obj, _rand_material(rng),
                  **({"engine": engine} if engine else {}))
    if rng.random() < 0.6:
        scene.add(Plane(normal=(0.0, 1.0, 0.0),
                        offset=float(rng.uniform(-2.0, -1.2))),
                  _rand_material(rng))
    scene.add_light(PointLight(
        position=(float(rng.uniform(-4, 4)), float(rng.uniform(2, 5)),
                  float(rng.uniform(-3, 2))),
        color=tuple(float(c) for c in rng.uniform(0.6, 1.0, 3))))
    if rng.random() < 0.4:
        scene.add_light(DirectionalLight(
            direction=(float(rng.uniform(-1, 1)), -1.0,
                       float(rng.uniform(-1, 1))),
            color=tuple(float(c) for c in rng.uniform(0.1, 0.4, 3))))
    shadows = bool(rng.random() < 0.8)
    settings = RenderSettings(
        max_steps=96,
        shadows=shadows,
        soft_shadows=bool(shadows and rng.random() < 0.5),
        soft_shadow_k=float(rng.choice([4.0, 8.0, 16.0])),
        ao=bool(rng.random() < 0.5),
        ao_samples=int(rng.choice([3, 5])),
        normals="fd" if rng.random() < 0.3 else "auto",
        hit_eps_scale=float(rng.choice([0.0, 0.0, 1e-4])),
    )
    cam = Camera.pinhole(SIZE, SIZE, fov_y_deg=50.0,
                         position=(0.0, 0.2, 0.0), target=(0.0, 0.0, 3.5))
    return scene, cam, settings


def _cases():
    rng = np.random.default_rng(20260818)
    return [_rand_scene(rng) for _ in range(N_SCENES)]


_CASES = _cases()


@pytest.mark.parametrize("idx", range(N_SCENES))
def test_fuzz_goldens_agree(idx):
    """The two independent scalar oracles agree bitwise/<=1 ULP on every
    generated scene."""
    from surfjax.golden import cpp_bridge
    scene, cam, settings = _CASES[idx]
    a = cpp_bridge.render(scene, cam, settings)
    b = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 1, f"scene {idx}: C++ vs NumPy golden differ by {m} ULP"
    assert max_ulp(a["depth"], b["depth"]) <= 1


@pytest.mark.parametrize("idx", range(N_SCENES))
def test_fuzz_eager_jnp_matches_golden(idx):
    """Eager (op-by-op) jnp path: strict <=1 ULP vs the NumPy golden on
    the trig-free fuzz space."""
    scene, cam, settings = _CASES[idx]
    with jax.disable_jit():
        fb = render(scene, cam, settings)
    gold = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(np.asarray(fb.hit), gold["hit"])
    np.testing.assert_array_equal(np.asarray(fb.obj_id), gold["obj_id"])
    m = max_ulp(np.asarray(fb.rgb), gold["rgb"])
    assert m <= 1, f"scene {idx}: eager jnp differs from golden by {m} ULP"


@pytest.mark.parametrize("idx", range(N_SCENES))
def test_fuzz_jit_jnp_within_fusion_envelope(idx):
    """Jitted jnp path: XLA fusion may reassociate (legal-fusion class),
    so the contract is hit agreement + a tight bulk-rgb envelope."""
    scene, cam, settings = _CASES[idx]
    fb = render(scene, cam, settings)
    gold = golden_np.render(scene, cam, settings)
    agree = (np.asarray(fb.hit) == gold["hit"]).mean()
    assert agree > 0.998, f"scene {idx}: hit agreement {agree:.4f}"
    d = np.abs(np.asarray(fb.rgb).astype(np.float64)
               - gold["rgb"].astype(np.float64))
    assert np.quantile(d, 0.99) < 1e-3, f"scene {idx}: q99 {d.max():.2e}"
    assert d.mean() < 1e-4


# ---------------------------------------------------------------------------
# Crowd-path fuzz: random crowds must be BITWISE equal (geometry) to the
# unrolled path — the test_crowd contract, across a randomized scene
# space (member mix, engines, split-path extras, lights, settings).


def _rand_crowd_scene(rng):
    from surfjax import subtract as _sub

    mats = [Material.lambert(albedo=(0.7, 0.4, 0.3)),
            Material.blinn_phong(albedo=(0.3, 0.6, 0.8), shininess=16),
            Material.blinn_phong(albedo=(0.8, 0.8, 0.3), shininess=32)]
    scene = Scene()
    n_members = int(rng.integers(4, 10))
    for k in range(n_members):
        c = (float(rng.uniform(-1.5, 1.5)), float(rng.uniform(-0.6, 1.0)),
             float(rng.uniform(2.2, 4.2)))
        if rng.random() < 0.6:
            obj = Sphere(center=c, radius=float(rng.uniform(0.15, 0.35)))
        else:
            obj = Box(center=c, half_extents=tuple(
                float(x) for x in rng.uniform(0.1, 0.3, 3)))
        # SDF two-leaf pairs are crowd-eligible since r5 (all six
        # binary ops as of the all-ops extension)
        if rng.random() < 0.3:
            from surfjax import smooth_intersect, smooth_subtract
            b = Sphere(center=(c[0] + 0.2, c[1], c[2]),
                       radius=float(rng.uniform(0.1, 0.25)))
            kk = float(rng.uniform(0.08, 0.3))
            ops = [lambda: union(obj, b),
                   lambda: smooth_union(obj, b, kk),
                   lambda: intersect(obj, Sphere(
                       center=(c[0] + 0.08, c[1], c[2]), radius=0.3)),
                   lambda: subtract(obj, Sphere(
                       center=(c[0] + 0.1, c[1], c[2]), radius=0.12)),
                   lambda: smooth_intersect(obj, Sphere(
                       center=(c[0] + 0.08, c[1], c[2]), radius=0.3), kk),
                   lambda: smooth_subtract(obj, Sphere(
                       center=(c[0] + 0.1, c[1], c[2]), radius=0.12), kk)]
            obj = ops[int(rng.integers(0, 6))]()
            scene.add(obj, mats[k % 3], engine="sdf")
            continue
        # members come from BOTH engines (analytic single-leaf
        # spheres/boxes are crowd-eligible since r4)
        engine = "sdf" if rng.random() < 0.5 else None
        scene.add(obj, mats[k % 3],
                  **({"engine": engine} if engine else {}))
    if rng.random() < 0.5:
        # a non-member (CSG) forces the split crowd+unrolled path
        scene.add(_sub(Box(center=(0.0, 1.4, 3.6),
                           half_extents=(0.4, 0.3, 0.3)),
                       Sphere(center=(0.0, 1.4, 3.2), radius=0.35)),
                  mats[0])
    if rng.random() < 0.7:
        scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
                  Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(
        position=(float(rng.uniform(-3, 3)), float(rng.uniform(3, 5)),
                  float(rng.uniform(-2, 1)))))
    shadows = bool(rng.random() < 0.8)
    s = RenderSettings(
        backend="pallas", tile_rows=8, max_steps=96,
        shadows=shadows,
        soft_shadows=bool(shadows and rng.random() < 0.5),
        ao=bool(rng.random() < 0.5), ao_samples=3)
    cam = Camera.pinhole(96, 64, fov_y_deg=50.0,
                         position=(0.0, 0.6, -0.5), target=(0.0, 0.0, 3.0))
    return scene, cam, s


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_crowd_bitwise_vs_unrolled(seed):
    from surfjax import render as _render
    from surfjax.io.image import ulp_diff_f32

    rng = np.random.default_rng(1000 + seed)
    scene, cam, s = _rand_crowd_scene(rng)
    fa = _render(scene, cam, s)
    fb = _render(scene, cam, s.with_(vector_objects=True))
    for name in ("depth", "normal", "hit", "obj_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fa, name)), np.asarray(getattr(fb, name)),
            err_msg=f"seed {seed}: {name}")
    u = ulp_diff_f32(np.asarray(fa.rgb), np.asarray(fb.rgb))
    assert u.max() <= 2, f"seed {seed}: rgb ulp max {u.max()}"
    assert (u > 0).mean() < 0.05, f"seed {seed}: drift {(u > 0).mean()}"
