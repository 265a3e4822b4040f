"""Pinned-semantics regression tests (SURVEY.md §4.8 fixtures).

The stored micro-frames freeze the oracle's SEMANTICS: if any change to the
golden renderer (or to the shared definitions it mirrors) alters output
bits, these fail — distinguishing deliberate semantic changes (regenerate
fixtures, note it in the commit) from accidental drift.
"""

import os

import numpy as np
import pytest

from surfjax.golden import renderer as golden
from surfjax.io.image import max_ulp

from tests.scenes import config1_sphere, config2_csg, config3_sdf, \
    config4_mesh

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

CASES = [
    ("c1", config1_sphere, {"size": 64}, 0),
    ("c2", config2_csg, {"size": 64}, 0),
    ("c3", config3_sdf, {"size": 64}, 2),   # trig-free bulb: log() only
    ("c4", config4_mesh, {"width": 96, "height": 54}, 0),
]


@pytest.mark.parametrize("name,mk,kw,ulp", CASES)
def test_golden_matches_pinned_fixture(name, mk, kw, ulp):
    scene, cam, settings = mk(**kw)
    fb = golden.render(scene, cam, settings)
    with np.load(os.path.join(FIXDIR, f"golden_{name}.npz")) as z:
        np.testing.assert_array_equal(fb["hit"], z["hit"])
        m = max_ulp(fb["rgb"], z["rgb"])
        assert m <= ulp, (f"golden semantics drifted for {name}: {m} ULP "
                          f"(regenerate fixtures only if intentional)")


def test_parallel_golden_bitwise():
    """render_parallel's row-block threading must be bitwise invisible
    (global row indices -> identical per-lane arithmetic)."""
    scene, cam, settings = config3_sdf(size=96)
    a = golden.render(scene, cam, settings)
    b = golden.render_parallel(scene, cam, settings, n_workers=4)
    for k in a:
        assert (a[k] == b[k]).all(), k
