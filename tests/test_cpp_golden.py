"""C++ golden oracle vs NumPy golden (SURVEY.md §2 native-code note).

Two fully independent scalar implementations of the pinned FP semantics —
agreement must be bit-level on sqrt-only scenes (strict-FP C++ vs NumPy
both execute one correctly-rounded IEEE op per written op)."""

import numpy as np
import pytest

from surfjax.golden import renderer as golden_np
from surfjax.io.image import max_ulp

from tests.scenes import config1_sphere, config2_csg
from tests.test_parity_configs import _config3_no_mandelbulb


def _cpp():
    from surfjax.golden import cpp_bridge
    return cpp_bridge


def test_cpp_matches_numpy_config1():
    scene, cam, settings = config1_sphere(size=96)
    a = _cpp().render(scene, cam, settings)
    b = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 1, f"C++ vs NumPy golden differ by {m} ULP"
    assert max_ulp(a["depth"], b["depth"]) <= 1


def test_cpp_matches_numpy_config2():
    scene, cam, settings = config2_csg(size=96)
    a = _cpp().render(scene, cam, settings)
    b = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 1, f"C++ vs NumPy golden differ by {m} ULP"


def test_cpp_matches_numpy_sdf_scene():
    scene, cam, settings = _config3_no_mandelbulb(64)
    a = _cpp().render(scene, cam, settings)
    b = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 1, f"C++ vs NumPy golden differ by {m} ULP (SDF scene)"


def test_cpp_matches_numpy_mesh_scene():
    from tests.scenes import config4_mesh
    scene, cam, settings = config4_mesh(width=96, height=54)
    a = _cpp().render(scene, cam, settings)
    b = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 1, f"C++ vs NumPy golden differ by {m} ULP (mesh scene)"
