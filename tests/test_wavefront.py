"""Wavefront (compacted-round) march vs the single-kernel tile march.

The tile mode now marches per object with progressive clipping while the
wavefront mode marches the scene-min SDF, so agreement is hit-exact /
t-within-eps rather than bitwise."""

import numpy as np

from surfjax import render

from tests.scenes import config2_csg, config3_sdf


def test_wavefront_equals_tile_mode():
    scene, cam, settings = config3_sdf(size=64)
    base = settings.with_(backend="pallas", tile_rows=8)
    fb_w = render(scene, cam, base.with_(march_mode="wavefront"))
    fb_t = render(scene, cam, base.with_(march_mode="tile"))
    hit_agree = (np.asarray(fb_w.hit) == np.asarray(fb_t.hit)).mean()
    assert hit_agree > 0.995, hit_agree
    both = (np.asarray(fb_w.hit) > 0) & (np.asarray(fb_t.hit) > 0)
    dt = np.abs(np.asarray(fb_w.depth) - np.asarray(fb_t.depth))[both]
    assert np.quantile(dt, 0.99) < 2e-2, np.quantile(dt, 0.99)


def test_wavefront_analytic_only_scene():
    scene, cam, settings = config2_csg(size=64)
    base = settings.with_(backend="pallas", tile_rows=8)
    fb_w = render(scene, cam, base.with_(march_mode="wavefront"))
    fb_t = render(scene, cam, base.with_(march_mode="tile"))
    # tile mode is the fused megakernel (in-kernel ray generation); the
    # wavefront path gets XLA-generated rays — same formulas, different
    # fusion order, so agreement is ~1 ulp of the dir normalize rather
    # than bitwise
    np.testing.assert_allclose(np.asarray(fb_w.rgb), np.asarray(fb_t.rgb),
                               atol=1e-5)


def test_wavefront_with_soft_shadows_and_ao():
    """Secondary rays (K2 soft shadows, fused AO) on top of a wavefront
    primary march: the full-frame outputs must match tile mode to the
    same eps-band tolerance as the primary-only test."""
    scene, cam, settings = config3_sdf(size=64)
    base = settings.with_(backend="pallas", tile_rows=8,
                          soft_shadows=True, ao=True, ao_samples=3)
    fb_w = render(scene, cam, base.with_(march_mode="wavefront"))
    fb_t = render(scene, cam, base.with_(march_mode="tile"))
    assert (np.asarray(fb_w.hit) == np.asarray(fb_t.hit)).mean() > 0.995
    d = np.abs(np.asarray(fb_w.rgb) - np.asarray(fb_t.rgb))
    assert np.quantile(d, 0.99) < 5e-2, np.quantile(d, 0.99)


def test_wavefront_multi_object_scene_with_mesh():
    """Wavefront primary + packet-kernel mesh merge + hard shadows:
    the mesh merge happens after the march mode branch, so a mesh+SDF
    scene exercises the full composition."""
    from tests.scenes import config4_mesh
    scene, cam, settings = config4_mesh(width=96, height=64)
    base = settings.with_(backend="pallas", tile_rows=8)
    fb_w = render(scene, cam, base.with_(march_mode="wavefront"))
    fb_t = render(scene, cam, base.with_(march_mode="tile"))
    assert (np.asarray(fb_w.hit) == np.asarray(fb_t.hit)).mean() > 0.995
    same_obj = np.asarray(fb_w.obj_id) == np.asarray(fb_t.obj_id)
    assert same_obj.mean() > 0.995
    d = np.abs(np.asarray(fb_w.rgb) - np.asarray(fb_t.rgb))[same_obj]
    assert np.quantile(d, 0.99) < 5e-2, np.quantile(d, 0.99)
