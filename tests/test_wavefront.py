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
    np.testing.assert_array_equal(np.asarray(fb_w.rgb), np.asarray(fb_t.rgb))
