"""Inverse-rendering fits (BASELINE.json:11; SURVEY.md §4.5): perturb a
known pose / SDF parameter, fit, assert recovery."""

import jax
import numpy as np

from surfjax import (
    Camera, Material, PointLight, RenderSettings, Scene, Sphere,
    smooth_union,
)
from surfjax.diff import fit_pose, fit_sdf, rodrigues
from surfjax.pipeline.frame import render_frame


def _blob_scene():
    scene = Scene()
    scene.add(smooth_union(Sphere((-0.35, -0.1, 3.0), 0.6),
                           Sphere((0.45, 0.1, 3.0), 0.45), 0.3),
              Material.lambert(albedo=(0.4, 0.6, 0.8)), engine="sdf")
    scene.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    return scene


SETTINGS = RenderSettings(shadows=False, max_steps=64, t_max=20.0)


def test_rodrigues_identity_and_inverse():
    w = np.asarray([0.1, -0.2, 0.05], np.float32)
    R = np.asarray(rodrigues(w)).reshape(3, 3)
    Ri = np.asarray(rodrigues(-w)).reshape(3, 3)
    np.testing.assert_allclose(R @ Ri, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rodrigues(np.zeros(3,
                                                    np.float32))),
                               np.eye(3).reshape(9), atol=1e-7)


def test_fit_pose_recovers_perturbation():
    scene = _blob_scene()
    cam = Camera.pinhole(48, 48, fov_y_deg=45.0)
    target = np.asarray(render_frame(scene, cam, SETTINGS).rgb)
    # start from a perturbed pose; the fit must come back
    init = (np.asarray([0.05, -0.04, 0.03], np.float32),
            np.asarray([0.05, -0.05, 0.0], np.float32))
    R, t, losses = fit_pose(scene, cam, target, steps=120, lr=3e-2,
                            settings=SETTINGS, init=init)
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    # pose is only weakly constrained by a single smooth blob at 48x48
    # (view-axis translation ambiguity) — coarse recovery is the check
    np.testing.assert_allclose(R.reshape(3, 3), np.eye(3), atol=0.05)
    np.testing.assert_allclose(t, np.zeros(3), atol=0.08)


def test_fit_sdf_recovers_radius():
    scene = _blob_scene()
    cam = Camera.pinhole(48, 48, fov_y_deg=45.0)
    target = np.asarray(render_frame(scene, cam, SETTINGS).rgb)

    # same scene with a wrong radius on the first sphere
    wrong = Scene()
    wrong.add(smooth_union(Sphere((-0.35, -0.1, 3.0), 0.45),
                           Sphere((0.45, 0.1, 3.0), 0.45), 0.3),
              Material.lambert(albedo=(0.4, 0.6, 0.8)), engine="sdf")
    wrong.add_light(PointLight(position=(3.0, 4.0, -1.0)))

    mask = np.zeros((2, 8), np.float32)
    mask[0, 3] = 1.0  # only sphere-0 radius is free
    lp, losses = fit_sdf(wrong, cam, target, steps=120, lr=5e-3,
                         settings=SETTINGS, param_mask=mask)
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    assert abs(lp[0, 3] - 0.6) < 0.02, lp[0, 3]
