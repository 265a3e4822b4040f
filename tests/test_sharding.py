"""Multi-device tests on the fake 8-device CPU backend (SURVEY.md §4.6):
sharded output must be bitwise identical to single-device output."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surfjax.core.camera import camera_ray_dirs_dyn
from surfjax.pipeline.frame import render_rays

from tests.scenes import config2_csg, config5_anim_scene


def _flat_rays(cam):
    intr = cam.intrinsics
    rows = np.repeat(np.arange(intr.height, dtype=np.float32), intr.width)
    cols = np.tile(np.arange(intr.width, dtype=np.float32), intr.height)
    R = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))
    d = camera_ray_dirs_dyn(intr, R, jnp.asarray(rows), jnp.asarray(cols))
    pos = np.asarray(cam.position, np.float32)
    o = tuple(jnp.full(rows.shape, pos[i], jnp.float32) for i in range(3))
    return o, d


def test_tile_sharded_bitwise_equal():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    scene, cam, settings = config2_csg(size=64)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _flat_rays(cam)

    f = jax.jit(lambda p, o, d: render_rays(static, settings, p, o, d))
    ref = f(params, o, d)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("tile",))
    s_rays = NamedSharding(mesh, P("tile"))
    repl = NamedSharding(mesh, P())
    o_s = tuple(jax.device_put(c, s_rays) for c in o)
    d_s = tuple(jax.device_put(c, s_rays) for c in d)
    p_s = {k: jax.device_put(v, repl) for k, v in params.items()}
    out = f(p_s, o_s, d_s)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frame_and_tile_sharded_sequence():
    """2x4 ('frame','tile') mesh over a 4-frame batch: equals unsharded."""
    scene, cam, settings = config5_anim_scene(size=32)
    settings = settings.with_(max_steps=32)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _flat_rays(cam)
    F = 4
    # batch the same rays with slightly different origins per frame
    o_b = tuple(jnp.stack([c + 0.01 * i for i in range(F)]) for c in o)
    d_b = tuple(jnp.stack([c for _ in range(F)]) for c in d)

    def step(p, o, d):
        return jax.vmap(lambda oo, dd: render_rays(static, settings, p,
                                                   oo, dd).rgb)(o, d)

    f = jax.jit(step)
    ref = f(params, o_b, d_b)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("frame", "tile"))
    sh = NamedSharding(mesh, P("frame", "tile"))
    repl = NamedSharding(mesh, P())
    o_s = tuple(jax.device_put(c, sh) for c in o_b)
    d_s = tuple(jax.device_put(c, sh) for c in d_b)
    p_s = {k: jax.device_put(v, repl) for k, v in params.items()}
    out = f(p_s, o_s, d_s)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
