"""parallel/ API tests on the fake 8-device CPU mesh (SURVEY.md §4.6):
shard_map-sharded rendering must equal the single-device result bitwise."""

import jax
import jax.numpy as jnp
import numpy as np

from surfjax import render, render_sequence
from surfjax.core.camera import orbit_pose
from surfjax.parallel import (
    make_mesh, render_frame_sharded, render_sequence_sharded,
)

from tests.scenes import config2_csg, config5_anim_scene


def test_render_frame_sharded_bitwise():
    scene, cam, settings = config2_csg(size=64)
    ref = render(scene, cam, settings)
    mesh = make_mesh(n_frame=1, n_tile=8)
    out = render_frame_sharded(scene, cam, settings, mesh)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_sequence_sharded_matches_unsharded():
    scene, cam, settings = config5_anim_scene(size=32)
    settings = settings.with_(max_steps=32)
    F = 4
    thetas = jnp.linspace(0.0, 1.0, F)
    Rs, ts = jax.vmap(lambda th: orbit_pose(jnp.float32(4.0),
                                            jnp.float32(1.0), th))(thetas)
    ts = ts + jnp.asarray([0.0, 0.0, 3.0], jnp.float32)

    ref = render_sequence(scene, cam, (Rs, ts), settings)
    mesh = make_mesh(n_frame=2, n_tile=4)
    out = render_sequence_sharded(scene, cam, (Rs, ts), settings, mesh)
    assert np.asarray(out.rgb).shape == (F, 32, 32, 3)
    # the shard_map body is a different XLA program than the vmap reference,
    # so legal FMA/fusion choices differ — agreement is ULP-scale, not bitwise
    np.testing.assert_allclose(np.asarray(ref.rgb), np.asarray(out.rgb),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.depth), np.asarray(out.depth),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    # frames actually animate
    assert np.abs(np.asarray(out.rgb[0]) - np.asarray(out.rgb[-1])).max() > 0.01


def test_pallas_backend_under_shard_map():
    """Each device runs its own Pallas kernels on its ray shard — the real
    multi-chip configuration, validated on the fake 8-device mesh."""
    scene, cam, settings = config2_csg(size=64)
    settings = settings.with_(backend="pallas", tile_rows=8)
    ref = render(scene, cam, settings)
    out = render_frame_sharded(scene, cam, settings, make_mesh(1, 8))
    np.testing.assert_allclose(np.asarray(ref.rgb), np.asarray(out.rgb),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))


def test_crowd_pallas_under_shard_map():
    """The crowd (vector_objects) kernels under shard_map: each device
    runs the fori_loop crowd path on its ray shard; output must match
    the unsharded crowd render (r4)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from tests.test_crowd import _crowd_scene
    scene, cam, settings = _crowd_scene(n_spheres=6, n_boxes=2,
                                        shadows=True)
    settings = settings.with_(vector_objects=True)
    ref = render(scene, cam, settings)
    out = render_frame_sharded(scene, cam, settings, make_mesh(1, 8))
    np.testing.assert_allclose(np.asarray(ref.rgb), np.asarray(out.rgb),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.hit),
                                  np.asarray(out.hit))
    np.testing.assert_array_equal(np.asarray(ref.obj_id),
                                  np.asarray(out.obj_id))
