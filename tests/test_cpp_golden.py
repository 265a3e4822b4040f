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


def test_cpp_area_light_penumbra_matches_numpy():
    """Area lights (radius > 0) use per-ray penumbra k = dist/radius in
    BOTH goldens (review r3: the C++ oracle ignored the radius)."""
    from surfjax import (
        Camera, Material, Plane, PointLight, RenderSettings, Scene, Sphere,
    )
    scene = Scene()
    scene.add(Sphere(center=(0.0, 0.6, 3.0), radius=0.5),
              Material.lambert(albedo=(0.7, 0.4, 0.4)), engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(0.0, 5.0, 3.0), radius=0.6))
    cam = Camera.pinhole(96, 72, fov_y_deg=45.0, position=(0.0, 1.0, 0.0),
                         target=(0.0, 0.0, 3.0))
    s = RenderSettings(shadows=True, soft_shadows=True)
    a = _cpp().render(scene, cam, s)
    b = golden_np.render(scene, cam, s)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 4, f"area-light penumbra differs by {m} ULP"
    # penumbra actually varies (not the fixed-k value everywhere)
    assert a["rgb"].std() > 0.01


def test_cpp_mesh_occluder_under_soft_shadows():
    """Soft shadows: mesh occluders multiply in as hard shadows in BOTH
    goldens (review r3: the C++ oracle dropped mesh occlusion)."""
    from surfjax import (
        Camera, Material, Plane, PointLight, RenderSettings, Scene,
        Sphere, TriangleMesh,
    )
    from surfjax.meshgen import octasphere
    v, f = octasphere(2)
    v = v * 0.5
    v[:, 1] += 0.8
    v[:, 2] += 3.0
    scene = Scene()
    scene.add(TriangleMesh(vertices=v, faces=f),
              Material.lambert(albedo=(0.7, 0.7, 0.75)))
    scene.add(Sphere(center=(2.0, 0.0, 3.0), radius=0.3),
              Material.lambert(albedo=(0.4, 0.6, 0.4)), engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(0.0, 6.0, 3.0)))
    cam = Camera.pinhole(96, 72, fov_y_deg=45.0, position=(0.0, 1.0, 0.0),
                         target=(0.0, 0.0, 3.0))
    s = RenderSettings(shadows=True, soft_shadows=True)
    a = _cpp().render(scene, cam, s)
    b = golden_np.render(scene, cam, s)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 4, f"mesh-under-soft-shadow differs by {m} ULP"
    # the mesh really casts a shadow on the floor in both
    floor = b["obj_id"] == 2
    assert (b["rgb"][floor].min(axis=-1) < 0.15).any()


def test_cpp_fd_normals_mode():
    """normals='fd' switches analytic objects to FD normals in the C++
    oracle too (review r3: the mode was not serialized)."""
    from surfjax import (
        Camera, Material, PointLight, RenderSettings, Scene, Sphere,
    )
    scene = Scene()
    scene.add(Sphere(center=(0.0, 0.0, 3.0), radius=1.0),
              Material.blinn_phong(albedo=(0.6, 0.5, 0.4), shininess=16))
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    cam = Camera.pinhole(64, 64, fov_y_deg=45.0)
    s = RenderSettings(shadows=False, normals="fd")
    a = _cpp().render(scene, cam, s)
    b = golden_np.render(scene, cam, s)
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 4, f"fd-normals mode differs by {m} ULP"
    # and fd differs from auto (the mode engaged)
    a_auto = _cpp().render(scene, cam, s.with_(normals="auto"))
    assert np.abs(a["rgb"] - a_auto["rgb"]).max() > 0.0


def test_cpp_matches_numpy_crowd_scene():
    """Both oracles on a many-object sphere/box crowd scene (r4): the
    per-object loops in both are N-independent scalar code, so the
    bit-level agreement must hold at crowd scale too."""
    from tests.test_crowd import _crowd_scene
    scene, cam, settings = _crowd_scene(n_spheres=9, n_boxes=4,
                                        shadows=True, ao=True)
    a = _cpp().render(scene, cam, settings)
    b = golden_np.render(scene, cam, settings)
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = max_ulp(a["rgb"], b["rgb"])
    assert m <= 1, f"C++ vs NumPy golden differ by {m} ULP"
    assert max_ulp(a["depth"], b["depth"]) <= 1
