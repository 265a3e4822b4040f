"""Canonical test scenes — one per SPEC config class (SURVEY.md §4.8).

These mirror the five BASELINE.json configs at full and micro resolutions.

World convention: right-handed, Y-UP. The camera is x-right / y-down /
z-forward (a proper rotation in a y-up world); identity rotation looks along
+z. Floors are solid y <= offset (normal (0,1,0), negative offset); lights
sit at positive y.
"""

import numpy as np

from surfjax import (
    Box, Camera, DirectionalLight, Material, Plane, PointLight, RenderSettings,
    Scene, Sphere, Mandelbulb, smooth_union, subtract, union, intersect,
)


def config1_sphere(size=256):
    """BASELINE.json:7 — single analytic sphere, pinhole, Lambert."""
    scene = Scene()
    scene.add(Sphere(center=(0.0, 0.0, 3.0), radius=1.0),
              Material.lambert(albedo=(0.8, 0.3, 0.2)))
    scene.add_light(PointLight(position=(3.0, 4.0, -2.0),
                               color=(1.0, 1.0, 1.0)))
    cam = Camera.pinhole(size, size, fov_y_deg=45.0)
    settings = RenderSettings(shadows=False)
    return scene, cam, settings


def config2_csg(size=512):
    """BASELINE.json:8 — spheres/planes/boxes + CSG, Blinn-Phong, hard
    shadows."""
    scene = Scene()
    # floor: solid y <= -1.5
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.5),
              Material.lambert(albedo=(0.6, 0.6, 0.6)))
    # CSG: box minus sphere
    scene.add(
        subtract(Box(center=(-1.2, -0.5, 4.0), half_extents=(0.8, 0.8, 0.8)),
                 Sphere(center=(-1.2, -0.5, 3.2), radius=0.9)),
        Material.blinn_phong(albedo=(0.2, 0.5, 0.8), shininess=64))
    # CSG: sphere ∩ sphere lens
    scene.add(
        intersect(Sphere(center=(1.1, -0.6, 3.6), radius=0.9),
                  Sphere(center=(1.7, -0.6, 3.6), radius=0.9)),
        Material.blinn_phong(albedo=(0.9, 0.7, 0.2), ks=0.5, shininess=16))
    # plain sphere
    scene.add(Sphere(center=(0.0, 0.6, 5.0), radius=0.7),
              Material.blinn_phong(albedo=(0.8, 0.2, 0.4), shininess=32))
    scene.add_light(PointLight(position=(4.0, 5.0, 0.0),
                               color=(1.0, 1.0, 1.0)))
    scene.add_light(DirectionalLight(direction=(-0.3, -1.0, 0.4),
                                     color=(0.25, 0.25, 0.3)))
    cam = Camera.pinhole(size, size, fov_y_deg=50.0,
                         position=(0.0, 0.6, 0.0), target=(0.0, -0.3, 4.0))
    settings = RenderSettings(shadows=True)
    return scene, cam, settings


def config3_sdf(size=1024):
    """BASELINE.json:9 — SDF scene (Mandelbulb / smooth-min blends), soft
    shadows + AO."""
    scene = Scene()
    blob = smooth_union(
        Sphere(center=(-0.9, -0.35, 3.2), radius=0.55),
        smooth_union(Sphere(center=(-0.35, 0.25, 3.1), radius=0.4),
                     Box(center=(-0.7, -0.05, 3.4),
                         half_extents=(0.45, 0.3, 0.3)), 0.25), 0.3)
    scene.add(blob, Material.blinn_phong(albedo=(0.3, 0.7, 0.5),
                                         shininess=32), engine="sdf")
    scene.add(Mandelbulb(center=(1.0, 0.0, 3.0), scale=0.9),
              Material.lambert(albedo=(0.85, 0.6, 0.3)))
    # floor: solid y <= -1 — analytic: exact hit, zero march steps; a
    # plane neither self-shadows nor contributes AO, so this is the same
    # image for a fraction of the cost (the hybrid engine's whole point)
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.55)))
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0),
                               color=(1.0, 0.98, 0.95)))
    cam = Camera.pinhole(size, size, fov_y_deg=45.0,
                         position=(0.0, 0.4, 0.0), target=(0.0, 0.0, 3.0))
    settings = RenderSettings(shadows=True, soft_shadows=True, ao=True,
                              ao_samples=5)
    return scene, cam, settings


def make_test_mesh():
    """A small icosphere-ish mesh (subdivided octahedron), 128 tris."""
    from surfjax.meshgen import octasphere
    return octasphere(2)


def config4_mesh(width=1920, height=1080):
    """BASELINE.json:10 — triangle mesh via uniform grid, G-buffer out."""
    from surfjax import TriangleMesh
    v, f = make_test_mesh()
    v = v * 0.9
    v[:, 2] += 3.0
    scene = Scene()
    scene.add(TriangleMesh(vertices=v, faces=f),
              Material.blinn_phong(albedo=(0.7, 0.7, 0.75), shininess=32))
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.2),
              Material.lambert(albedo=(0.45, 0.5, 0.45)))
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    cam = Camera.pinhole(width, height, fov_y_deg=40.0,
                         position=(0.0, 0.5, 0.0), target=(0.0, 0.0, 3.0))
    settings = RenderSettings(shadows=True)
    return scene, cam, settings


def config5_anim_scene(size=256):
    """BASELINE.json:11 — scene for the animated / differentiable config."""
    scene = Scene()
    scene.add(smooth_union(Sphere(center=(-0.4, -0.1, 3.0), radius=0.6),
                           Sphere(center=(0.5, 0.1, 3.0), radius=0.45),
                           0.3),
              Material.blinn_phong(albedo=(0.4, 0.6, 0.8), shininess=32),
              engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    cam = Camera.pinhole(size, size, fov_y_deg=45.0)
    settings = RenderSettings(shadows=True)
    return scene, cam, settings
