"""Area-light penumbra (PointLight.radius) and pose interpolation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from surfjax import (
    Camera, Material, Plane, PointLight, RenderSettings, Scene, Sphere,
    render,
)
from surfjax.core.camera import orbit_pose, pose_interp
from surfjax.golden import renderer as golden


def _shadow_scene(radius):
    scene = Scene()
    scene.add(Sphere((0.0, 0.0, 3.0), 0.5), Material.lambert(),
              engine="sdf")
    scene.add(Plane((0.0, 1.0, 0.0), -1.0), Material.lambert(),
              engine="sdf")
    scene.add_light(PointLight(position=(0.0, 5.0, 3.0), radius=radius))
    cam = Camera.pinhole(96, 96, fov_y_deg=50.0, position=(0.0, 1.0, 0.0),
                         target=(0.0, -0.5, 3.0))
    return scene, cam, RenderSettings(shadows=True, soft_shadows=True,
                                      max_steps=128)


def _penumbra_width(radius):
    """Pixels with fractional shadow visibility, isolated by dividing the
    shadowed render by an unshadowed one (removes the diffuse gradient)."""
    scene, cam, settings = _shadow_scene(radius)
    shadowed = np.asarray(render(scene, cam, settings).rgb)[..., 1]
    unshadowed = np.asarray(
        render(scene, cam, settings.with_(shadows=False)).rgb)[..., 1]
    vis = shadowed / np.maximum(unshadowed, 1e-6)
    return ((vis > 0.08) & (vis < 0.92)).sum()


def test_area_light_radius_softens_shadow():
    assert _penumbra_width(1.0) > _penumbra_width(0.05) * 1.5


def test_area_light_golden_parity():
    scene, cam, settings = _shadow_scene(0.6)
    fb = render(scene, cam, settings)
    gold = golden.render(scene, cam, settings)
    d = np.abs(np.asarray(fb.rgb).astype(np.float64)
               - gold["rgb"].astype(np.float64))
    assert d.max() < 1e-3, d.max()


def test_pose_interp_endpoints_and_orthonormal():
    p0 = orbit_pose(jnp.float32(4.0), jnp.float32(1.0), jnp.float32(0.2))
    p1 = orbit_pose(jnp.float32(4.0), jnp.float32(1.0), jnp.float32(1.1))
    R0, t0 = pose_interp(p0, p1, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(R0), np.asarray(p0[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(p0[1]), atol=1e-6)
    Rm, _ = pose_interp(p0, p1, jnp.float32(0.5))
    M = np.asarray(Rm).reshape(3, 3)
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(M), 1.0, atol=1e-5)
