"""Aux subsystems (SURVEY.md §5): checkpoint/resume with fault injection,
metrics JSONL, checkify numeric taps, framebuffer validation."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfjax import render
from surfjax.utils.checkpoint import (
    SequenceCheckpointer, load_fit_state, save_fit_state,
)
from surfjax.utils.checks import checked, validate_framebuffers
from surfjax.utils.metrics import FrameMetrics

from tests.scenes import config1_sphere


def test_sequence_checkpoint_resume_and_fault(tmp_path):
    calls = []

    def render_chunk(start, count):
        calls.append(start)
        return np.full((count, 4, 4, 3), float(start), np.float32)

    cp = SequenceCheckpointer(str(tmp_path), chunk_size=4)

    # inject a fault into chunk 4 on its first attempt (§5.3 fault hook)
    fired = []

    def fault(start):
        if start == 4 and not fired:
            fired.append(True)
            raise RuntimeError("injected device failure")

    cp.render_all(10, render_chunk, fault_hook=fault)
    assert sorted(set(calls)) == [0, 4, 8]
    out = cp.load_all()
    assert out.shape == (10, 4, 4, 3)

    # resume: nothing re-rendered
    calls.clear()
    cp2 = SequenceCheckpointer(str(tmp_path), chunk_size=4)
    cp2.render_all(10, render_chunk)
    assert calls == []


def test_fit_state_roundtrip(tmp_path):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": np.float32(2.5)}
    path = str(tmp_path / "fit.npz")
    save_fit_state(path, 7, params)
    step, restored = load_fit_state(path, params)
    assert step == 7
    np.testing.assert_array_equal(restored["a"], params["a"])


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    m = FrameMetrics(path)
    rec = m.record(width=64, height=64, wall_s=0.01, hits=2000.0,
                   n_lights=2, shadows=True, ao=True, ao_samples=5)
    assert rec["rays_total"] == 64 * 64 + 2 * 2000 + 5 * 2000
    with open(path) as fh:
        line = json.loads(fh.readline())
    assert line["mrays_per_s"] > 0


def test_checkify_clean_render():
    f = checked(lambda x: jnp.log(x) / x)
    err, out = jax.jit(f)(jnp.asarray([1.0, 2.0], jnp.float32))
    err.throw()  # no error on clean input

    err, out = jax.jit(f)(jnp.asarray([0.0, 2.0], jnp.float32))
    with pytest.raises(Exception):
        err.throw()  # division/NaN reported


def test_validate_framebuffers():
    scene, cam, settings = config1_sphere(size=32)
    fb = render(scene, cam, settings)
    rep = validate_framebuffers(fb)
    assert rep["ok"], rep
    assert 0.0 < rep["hit_frac"] < 1.0


def test_obj_loader_roundtrip(tmp_path):
    from surfjax.config import load_obj
    p = tmp_path / "tri.obj"
    p.write_text("# comment\n"
                 "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                 "f 1 2 3\n"
                 "f 1/1 2/2 4/4 3/3\n")  # quad with /uv -> two tris
    v, f = load_obj(str(p))
    assert v.shape == (4, 3)
    assert f.shape == (3, 3)  # 1 tri + quad fan (2 tris)
    assert f.max() == 3 and f.min() == 0


def test_checkpoint_chunk_size_change_resets(tmp_path):
    def render_chunk(start, count):
        return np.full((count, 2, 2, 3), float(start), np.float32)

    cp = SequenceCheckpointer(str(tmp_path), chunk_size=4)
    cp.render_all(8, render_chunk)
    # resume with a different chunk size: stale chunks must not be reused
    cp2 = SequenceCheckpointer(str(tmp_path), chunk_size=8)
    cp2.render_all(8, render_chunk)
    out = cp2.load_all()
    assert out.shape == (8, 2, 2, 3)
    np.testing.assert_array_equal(out[:, 0, 0, 0],
                                  [0, 0, 0, 0, 0, 0, 0, 0])


def test_scene_freeze_memoized():
    from surfjax import Material, Scene, Sphere
    s = Scene().add(Sphere((0, 0, 3), 1.0), Material.lambert())
    a = s.freeze()
    assert s.freeze() is a
    s.add(Sphere((1, 0, 3), 0.5), Material.lambert())
    assert s.freeze() is not a
