"""Wavefront (compacted-round) march vs the single-kernel tile march.

Per-lane arithmetic is identical by construction, so results must match
bit-for-bit regardless of scheduling."""

import numpy as np

from surfjax import render

from tests.scenes import config2_csg, config3_sdf


def test_wavefront_bitwise_equals_tile_mode():
    scene, cam, settings = config3_sdf(size=64)
    base = settings.with_(backend="pallas", tile_rows=8)
    fb_w = render(scene, cam, base.with_(march_mode="wavefront"))
    fb_t = render(scene, cam, base.with_(march_mode="tile"))
    np.testing.assert_array_equal(np.asarray(fb_w.rgb), np.asarray(fb_t.rgb))
    np.testing.assert_array_equal(np.asarray(fb_w.depth),
                                  np.asarray(fb_t.depth))
    np.testing.assert_array_equal(np.asarray(fb_w.hit), np.asarray(fb_t.hit))
    np.testing.assert_array_equal(np.asarray(fb_w.obj_id),
                                  np.asarray(fb_t.obj_id))


def test_wavefront_analytic_only_scene():
    scene, cam, settings = config2_csg(size=64)
    base = settings.with_(backend="pallas", tile_rows=8)
    fb_w = render(scene, cam, base.with_(march_mode="wavefront"))
    fb_t = render(scene, cam, base.with_(march_mode="tile"))
    np.testing.assert_array_equal(np.asarray(fb_w.rgb), np.asarray(fb_t.rgb))
