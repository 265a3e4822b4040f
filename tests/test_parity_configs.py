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


def test_fd_normals_mode_parity():
    """normals='fd' must switch analytic objects to FD normals on EVERY
    backend (review r3: the pallas path silently ignored it)."""
    scene = Scene()
    scene.add(Sphere(center=(0.0, 0.0, 3.0), radius=1.0),
              Material.blinn_phong(albedo=(0.6, 0.5, 0.4), shininess=16))
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    cam = Camera.pinhole(64, 64, fov_y_deg=45.0)
    s = RenderSettings(shadows=False, normals="fd", backend="pallas",
                       tile_rows=8)
    fb_p = render(scene, cam, s)
    fb_j = render(scene, cam, s.with_(backend="jnp"))
    gold = golden.render(scene, cam, s)
    hit = np.asarray(fb_p.hit) > 0.5
    # all three backends use the FD tetrahedron; hits land anywhere in
    # the eps band so curved-surface FD normals scatter by O(1e-3)
    for other in (np.asarray(fb_j.normal), gold["normal"]):
        d = np.abs(np.asarray(fb_p.normal) - other)[hit]
        assert d.max() < 5e-3, d.max()
    # and they differ from the analytic normals (fd actually engaged)
    fb_auto = render(scene, cam, s.with_(normals="auto"))
    d_auto = np.abs(np.asarray(fb_p.normal)
                    - np.asarray(fb_auto.normal))[hit]
    assert d_auto.max() > 0.0


def test_contact_seam_normals_per_object():
    """FD taps at a hit on one SDF object must evaluate that object's
    OWN tape: two objects whose surfaces touch diverge if the taps read
    the scene min (review r3)."""
    scene = Scene()
    # two separate SDF objects exactly touching at x=0
    scene.add(Sphere(center=(-0.5, 0.0, 3.0), radius=0.5),
              Material.lambert(albedo=(0.7, 0.4, 0.4)), engine="sdf")
    scene.add(Sphere(center=(0.5, 0.0, 3.0), radius=0.5),
              Material.lambert(albedo=(0.4, 0.4, 0.7)), engine="sdf")
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    cam = Camera.pinhole(96, 64, fov_y_deg=45.0)
    s = RenderSettings(shadows=False, backend="pallas", tile_rows=8)
    fb_p = render(scene, cam, s)
    fb_j = render(scene, cam, s.with_(backend="jnp"))
    hit = np.asarray(fb_p.hit) > 0.5
    assert hit.any()
    np.testing.assert_array_equal(np.asarray(fb_p.obj_id),
                                  np.asarray(fb_j.obj_id))
    d = np.abs(np.asarray(fb_p.normal) - np.asarray(fb_j.normal))[hit]
    # per-object taps: only eps-band hit scatter remains (the scene-min
    # taps this guards against blended normals at the seam by O(1))
    assert d.max() < 2e-2, d.max()


def test_hard_shadow_cone_eps_parity():
    """Hard-shadow marches must apply hit_eps_scale like the jnp twin
    and goldens (review r3: the pallas path dropped it and
    under-occluded at eps_scale > 0). SDF occluder between a floor
    receiver and the light, fat cone epsilon."""
    scene = Scene()
    scene.add(Sphere(center=(0.6, 1.2, 3.0), radius=0.5),
              Material.lambert(albedo=(0.8, 0.3, 0.3)), engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(0.6, 6.0, 3.0)))
    cam = Camera.pinhole(96, 64, fov_y_deg=45.0,
                         position=(0.0, 1.0, 0.0), target=(0.3, 0.0, 3.0))
    s = RenderSettings(shadows=True, hit_eps_scale=2e-3,
                       backend="pallas", tile_rows=8)
    fb_p = render(scene, cam, s)
    fb_j = render(scene, cam, s.with_(backend="jnp"))
    gold = golden.render(scene, cam, s)
    rgb_p = np.asarray(fb_p.rgb)
    # the floor must actually carry a shadow
    assert (rgb_p[np.asarray(fb_p.obj_id) == 1].min(axis=-1) < 0.2).any()
    for other, label in ((np.asarray(fb_j.rgb), "jnp"),
                         (gold["rgb"], "golden")):
        d = np.abs(rgb_p - other)
        assert d.max() < 2e-2, (label, d.max())


def test_bulb_cover_margin_gate():
    """The 1.3 bulb COVER is validated only for eps <= 0.045*scale;
    beyond that the cover radius must fall back to LOWER + margin
    (advisor r3: the shadow segment skip applied 1.3 unconditionally)."""
    import jax.numpy as jnp
    from surfjax import Mandelbulb
    from surfjax.kernels.render_tile import (
        BULB_BOUND_COVER, BULB_BOUND_LOWER, _leaf_bound_scalars,
    )

    scene = Scene()
    scene.add(Mandelbulb(center=(0.0, 0.0, 3.0), scale=0.9),
              Material.lambert(albedo=(0.5, 0.5, 0.5)), engine="sdf")
    static, params = scene.freeze()
    lf = static.ir.objects[0].leaves[0]
    lp = jnp.asarray(params["leaf_params"])
    # validated regime: unchanged 1.3 cover (bitwise — no fp change)
    r_small = _leaf_bound_scalars(lf, lp, cover_margin=0.9 * 0.045)[3]
    np.testing.assert_allclose(float(r_small), 0.9 * BULB_BOUND_COVER,
                               rtol=1e-6)
    # invalid regime: LOWER inflated by the margin (covers {DE < m} for
    # any m because LOWER pointwise lower-bounds the DE)
    m = 0.2
    r_big = _leaf_bound_scalars(lf, lp, cover_margin=m)[3]
    np.testing.assert_allclose(float(r_big), 0.9 * BULB_BOUND_LOWER + m,
                               rtol=1e-6)


def test_bulb_shadow_large_eps_parity():
    """Hard shadows from a Mandelbulb occluder with a fat cone epsilon
    (eps_margin >> 0.045*scale — the regime the advisor flagged): the
    pallas path with its margin-gated cover skip must agree with the
    skip-free jnp twin."""
    from surfjax import Mandelbulb
    scene = Scene()
    scene.add(Mandelbulb(center=(0.4, 1.4, 3.0), scale=0.6),
              Material.lambert(albedo=(0.8, 0.4, 0.3)), engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(0.4, 6.0, 3.0)))
    cam = Camera.pinhole(96, 64, fov_y_deg=45.0,
                         position=(0.0, 1.0, 0.0), target=(0.2, 0.2, 3.0))
    s = RenderSettings(shadows=True, hit_eps_scale=1e-3, t_max=50.0,
                       backend="pallas", tile_rows=8)
    fb_p = render(scene, cam, s)
    fb_j = render(scene, cam, s.with_(backend="jnp"))
    rgb_p = np.asarray(fb_p.rgb)
    floor = np.asarray(fb_p.obj_id) == 1
    # the floor must actually carry a shadow
    assert (rgb_p[floor].min(axis=-1) < 0.2).any()
    np.testing.assert_array_equal(np.asarray(fb_p.hit),
                                  np.asarray(fb_j.hit))
    d = np.abs(rgb_p - np.asarray(fb_j.rgb)).max(axis=-1)
    # the advisor's failure mode is under-occlusion of the RECEIVER: the
    # segment skip wrongly killing a floor shadow. Floor pixels must
    # match the skip-free twin exactly (to fp noise). Pixels ON the
    # chaotic bulb surface get the documented eps-band carve-out (the
    # bound-entry trajectory shift decorrelates borderline
    # self-shadowing: measured 7/6144 pixels differ, all obj_id==0).
    assert d[floor].max() < 1e-3, d[floor].max()
    assert (d > 1e-3).mean() < 5e-3, (d > 1e-3).mean()
    assert np.quantile(d, 0.99) < 1e-3
