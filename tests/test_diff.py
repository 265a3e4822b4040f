"""Differentiable-rendering tests (SURVEY.md §4.5; BASELINE.json:11)."""

import jax
import jax.numpy as jnp
import numpy as np

from surfjax import Material, Scene, Sphere, smooth_union
from surfjax.engines.sdf import sphere_trace


def _sphere_obj(radius=1.0):
    s = Scene().add(Sphere((0.0, 0.0, 5.0), radius), Material.lambert(),
                    engine="sdf")
    static, params = s.freeze()
    return static.ir.objects[0], {k: jnp.asarray(v)
                                  for k, v in params.items()}


def test_ift_gradient_head_on():
    """Ray straight at the center: t = dist - r, so dt/dr must be -1."""
    oir, params = _sphere_obj()
    o = tuple(jnp.zeros(1, jnp.float32) for _ in range(3))
    d = (jnp.zeros(1, jnp.float32), jnp.zeros(1, jnp.float32),
         jnp.ones(1, jnp.float32))

    def t_of_r(r):
        lp = params["leaf_params"].at[0, 3].set(r)
        t, _ = sphere_trace(oir, lp, params["node_params"], o, d,
                            1e-3, 1e4, 256, 1e-5)
        return t[0]

    g = jax.grad(t_of_r)(jnp.float32(1.0))
    np.testing.assert_allclose(float(g), -1.0, atol=1e-3)


def test_ift_gradient_matches_finite_difference():
    """IFT adjoint vs central finite differences on oblique rays."""
    oir, params = _sphere_obj()
    n = 8
    ang = np.linspace(-0.12, 0.12, n).astype(np.float32)
    o = tuple(jnp.zeros(n, jnp.float32) for _ in range(3))
    d = (jnp.asarray(np.sin(ang)), jnp.zeros(n, jnp.float32),
         jnp.asarray(np.cos(ang)))

    def loss_of_r(r):
        lp = params["leaf_params"].at[0, 3].set(r)
        t, hit = sphere_trace(oir, lp, params["node_params"], o, d,
                              1e-3, 1e4, 256, 1e-5)
        return jnp.sum(jnp.where(hit, t, 0.0))

    g = float(jax.grad(loss_of_r)(jnp.float32(1.0)))
    eps = 1e-3
    fd = (float(loss_of_r(jnp.float32(1.0 + eps)))
          - float(loss_of_r(jnp.float32(1.0 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=0.05)


def test_grad_through_full_render():
    """End-to-end: grad of image loss w.r.t. SDF params is finite/nonzero."""
    from surfjax.pipeline.frame import render_rays
    from surfjax.core.types import RenderSettings

    s = Scene().add(
        smooth_union(Sphere((-0.4, -0.1, 3.0), 0.6),
                     Sphere((0.5, 0.1, 3.0), 0.45), 0.3),
        Material.lambert(), engine="sdf")
    from surfjax import PointLight
    s.add_light(PointLight(position=(3.0, 4.0, -1.0)))
    static, params = s.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    settings = RenderSettings(shadows=True, max_steps=64)

    n = 32 * 32
    rng = np.random.default_rng(1)
    ang = rng.uniform(-0.3, 0.3, (2, n)).astype(np.float32)
    d = (jnp.asarray(np.sin(ang[0])), jnp.asarray(np.sin(ang[1])),
         jnp.asarray(np.sqrt(1 - np.sin(ang[0])**2 - np.sin(ang[1])**2)))
    o = tuple(jnp.zeros(n, jnp.float32) for _ in range(3))

    def loss(lp):
        fb = render_rays(static, settings, dict(params, leaf_params=lp),
                         o, d)
        return jnp.mean(fb.rgb * fb.rgb)

    g = jax.jit(jax.grad(loss))(params["leaf_params"])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-6
