"""Opt-in FULL-resolution golden comparisons (VERDICT r1 item 7).

The regular suite checks parity at reduced sizes for speed; these tests
run the SPEC resolutions (c3 1024^2, c4 1080p) against the strict-FP C++
golden oracle. They take minutes, so they are gated behind

    SURFJAX_SLOW=1 python -m pytest tests/test_fullres_golden.py -q
"""

import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    not os.environ.get("SURFJAX_SLOW"),
    reason="full-res golden tests are opt-in (set SURFJAX_SLOW=1)")


def _render_pair(config):
    from surfjax.config import load_config
    from surfjax.golden import cpp_bridge
    from surfjax.pipeline.frame import render_frame

    scene, camera, settings, _ = load_config(config)
    fb = render_frame(scene, camera, settings)
    g = cpp_bridge.render(scene, camera, settings)
    rgb = np.asarray(fb.rgb)
    return (rgb, np.asarray(fb.hit),
            g["rgb"].reshape(rgb.shape), g["hit"].reshape(rgb.shape[:-1]))


@slow
def test_c3_1024_full_res_vs_cpp_golden():
    rgb, hit, rgb_g, hit_g = _render_pair("configs/c3_sdf.yaml")
    assert rgb.shape[:2] == (1024, 1024)
    # hit masks: identical away from the chaotic Mandelbulb silhouette
    assert (hit == hit_g).mean() > 0.9995
    d = np.abs(rgb - rgb_g)
    # documented c3 tolerance carve-out: bulk tight, silhouette outliers
    assert d.mean() < 2e-3, d.mean()
    assert np.quantile(d, 0.99) < 2e-2, np.quantile(d, 0.99)


@slow
def test_c4_1080p_full_res_vs_cpp_golden():
    rgb, hit, rgb_g, hit_g = _render_pair("configs/c4_mesh.yaml")
    assert rgb.shape[:2] == (1080, 1920)
    assert (hit == hit_g).mean() > 0.9999
    d = np.abs(rgb - rgb_g)
    assert d.mean() < 1e-3, d.mean()
    assert np.quantile(d, 0.999) < 2e-2, np.quantile(d, 0.999)
