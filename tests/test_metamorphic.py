"""Property / metamorphic tests (SURVEY.md §4.4).

Rendering invariances: joint scene+camera rotation leaves the image
unchanged (to tolerance); joint scaling of scene and camera distance;
hard-shadowed points receive zero direct light; AO of an isolated plane
point is the fully open hemisphere.
"""

import numpy as np

from surfjax import (
    Camera, Material, Plane, PointLight, RenderSettings, Scene, Sphere,
    render, smooth_union,
)
from surfjax.core.camera import look_at


def _rotate_y(v, ang):
    c, s = np.cos(ang), np.sin(ang)
    return (c * v[0] + s * v[2], v[1], -s * v[0] + c * v[2])


def test_joint_rotation_invariance():
    """Rotating scene AND camera by the same rotation -> same image."""
    ang = 0.7
    settings = RenderSettings(shadows=True, max_steps=64)

    def make(rot):
        f = (lambda p: _rotate_y(p, ang)) if rot else (lambda p: p)
        scene = Scene()
        scene.add(Sphere(f((0.3, 0.2, 3.0)), 0.8),
                  Material.blinn_phong(albedo=(0.7, 0.4, 0.3)))
        scene.add(Sphere(f((-0.8, -0.3, 3.5)), 0.5),
                  Material.lambert(albedo=(0.3, 0.5, 0.8)))
        scene.add_light(PointLight(position=f((3.0, 4.0, -1.0))))
        eye = f((0.0, 0.0, 0.0))
        tgt = f((0.0, 0.0, 3.0))
        R, t = look_at(eye if rot else (0, 0, 0), tgt)
        cam = Camera(Camera.pinhole(96, 96, 45.0).intrinsics, R, t)
        return np.asarray(render(scene, cam, settings).rgb)

    a, b = make(False), make(True)
    # FP rotation of inputs shifts silhouettes by <= a pixel; compare the
    # bulk: 99% of pixels must agree tightly
    d = np.abs(a - b)
    assert np.quantile(d, 0.99) < 5e-3, np.quantile(d, 0.99)
    assert np.median(d) < 1e-4


def test_joint_scale_invariance():
    """Scaling the scene and the camera geometry jointly -> same image."""
    settings = RenderSettings(shadows=False, max_steps=64)

    def make(s):
        scene = Scene()
        scene.add(Sphere((0.3 * s, 0.0, 3.0 * s), 0.8 * s),
                  Material.lambert(albedo=(0.7, 0.4, 0.3)))
        scene.add_light(PointLight(position=(3.0 * s, 4.0 * s, -1.0 * s)))
        cam = Camera.pinhole(64, 64, 45.0)
        st = settings.with_(t_max=settings.t_max * s,
                            hit_eps=settings.hit_eps * s)
        return np.asarray(render(scene, cam, st).rgb)

    a, b = make(1.0), make(2.0)
    d = np.abs(a - b)
    assert np.quantile(d, 0.99) < 5e-3
    assert np.median(d) < 1e-4


def test_hard_shadow_is_black():
    """A point fully behind an occluder gets only the ambient term."""
    scene = Scene()
    # floor and a big occluder between the light and the floor
    scene.add(Plane((0.0, 1.0, 0.0), -1.0),
              Material(albedo=(1.0, 1.0, 1.0), ka=0.0, kd=1.0, ks=0.0))
    scene.add(Sphere((0.0, 1.5, 3.0), 1.2), Material.lambert())
    scene.add_light(PointLight(position=(0.0, 6.0, 3.0)))
    cam = Camera.pinhole(64, 64, 50.0, position=(0.0, 1.0, -1.0),
                         target=(0.0, -1.0, 3.0))
    fb = render(scene, cam, RenderSettings(shadows=True))
    rgb = np.asarray(fb.rgb)
    obj = np.asarray(fb.obj_id)
    # the floor point straight under the sphere center is occluded;
    # with ka=0 its full shading must be exactly 0
    center = rgb[(obj == 0)]
    assert (center.min(axis=-1) == 0.0).any()


def test_ao_open_hemisphere_is_one():
    """AO at a point on an isolated plane = fully open hemisphere (ao=1).

    The plane is analytic; the only SDF object is far away, so the probes
    see h >= r everywhere -> zero occlusion.
    """
    scene = Scene()
    scene.add(Plane((0.0, 1.0, 0.0), -1.0), Material.lambert())
    scene.add(smooth_union(Sphere((50.0, 0.0, 50.0), 1.0),
                           Sphere((51.0, 0.0, 50.0), 1.0), 0.2),
              Material.lambert(), engine="sdf")
    scene.add_light(PointLight(position=(0.0, 5.0, 3.0)))
    cam = Camera.pinhole(32, 32, 45.0, position=(0.0, 0.5, 0.0),
                         target=(0.0, -1.0, 3.0))
    s_ao = RenderSettings(shadows=False, ao=True, max_steps=64)
    s_no = RenderSettings(shadows=False, ao=False, max_steps=64)
    a = np.asarray(render(scene, cam, s_ao).rgb)
    b = np.asarray(render(scene, cam, s_no).rgb)
    np.testing.assert_array_equal(a, b)  # ao factor must be exactly 1


def test_look_at_degenerate_up():
    """Straight-down camera with default up must not crash (fallback up)."""
    cam = Camera.pinhole(16, 16, 45.0, position=(0.0, 5.0, 0.0),
                         target=(0.0, 0.0, 0.0))
    R = np.asarray(cam.rotation)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_mandelbulb_visible_from_far_away():
    """Far-field DE clamp: the bulb must not vanish for distant cameras."""
    from surfjax import Mandelbulb
    scene = Scene()
    scene.add(Mandelbulb(center=(0.0, 0.0, 12.0)), Material.lambert())
    scene.add_light(PointLight(position=(3.0, 4.0, 0.0)))
    cam = Camera.pinhole(48, 48, 12.0)
    fb = render(scene, cam, RenderSettings(shadows=False, t_max=50.0))
    assert float(np.asarray(fb.hit).mean()) > 0.1
