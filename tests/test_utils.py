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


def test_exr_writer_layout_roundtrip(tmp_path):
    """save_exr emits spec-conformant uncompressed scanline EXR: parse it
    back with an independent struct-level reader and recover the pixels
    bit-exactly (component 22; no EXR library exists in this image, so
    the reader here is the verification)."""
    import struct

    import numpy as np
    from surfjax.io.image import save_exr

    rng = np.random.RandomState(3)
    rgb = rng.rand(7, 5, 3).astype(np.float32)
    path = str(tmp_path / "t.exr")
    save_exr(path, rgb)
    raw = open(path, "rb").read()
    assert struct.unpack("<I", raw[:4])[0] == 20000630  # magic
    assert struct.unpack("<I", raw[4:8])[0] == 2        # version, no flags
    # walk attributes
    pos = 8
    attrs = {}
    while raw[pos] != 0:
        e = raw.index(b"\x00", pos)
        name = raw[pos:e].decode()
        pos = e + 1
        e = raw.index(b"\x00", pos)
        typ = raw[pos:e].decode()
        pos = e + 1
        size = struct.unpack("<i", raw[pos:pos + 4])[0]
        pos += 4
        attrs[name] = (typ, raw[pos:pos + size])
        pos += size
    pos += 1  # header terminator
    assert attrs["compression"][1] == b"\x00"
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    H, W = y1 - y0 + 1, x1 - x0 + 1
    assert (H, W) == (7, 5)
    # channel list: names sorted bytewise, FLOAT type
    ch, names = attrs["channels"][1], []
    cpos = 0
    while ch[cpos] != 0:
        e = ch.index(b"\x00", cpos)
        names.append(ch[cpos:e].decode())
        ptype = struct.unpack("<i", ch[e + 1:e + 5])[0]
        assert ptype == 2  # FLOAT
        cpos = e + 1 + 16
    assert names == ["B", "G", "R"] == sorted(names)
    offsets = struct.unpack("<%dQ" % H, raw[pos:pos + 8 * H])
    pos += 8 * H
    out = np.zeros((H, W, 3), np.float32)
    order = {"B": 2, "G": 1, "R": 0}
    for y, off in enumerate(offsets):
        yy, size = struct.unpack("<ii", raw[off:off + 8])
        assert yy == y and size == 4 * W * len(names)
        for k, nch in enumerate(names):
            seg = raw[off + 8 + 4 * W * k: off + 8 + 4 * W * (k + 1)]
            out[y, :, order[nch]] = np.frombuffer(seg, np.float32)
    np.testing.assert_array_equal(out, rgb)


def test_checkpoint_rerun_with_smaller_frame_count(tmp_path):
    """Rerunning an animation in the same out_dir with a smaller
    n_frames must prune the overlapping stale chunk it re-renders and
    ignore stale chunks past the requested range (code-review r2)."""
    import numpy as np

    from surfjax.utils.checkpoint import SequenceCheckpointer

    def renderer(start, count):
        return np.full((count, 2, 2, 3), float(start), np.float32)

    cp = SequenceCheckpointer(str(tmp_path), chunk_size=16)
    cp.render_all(48, renderer)           # chunks 0:16, 16:16, 32:16
    cp2 = SequenceCheckpointer(str(tmp_path), chunk_size=16)
    cp2.render_all(20, renderer)          # re-covers 16 with 16:4
    rgb = cp2.load_all(20)
    assert rgb.shape == (20, 2, 2, 3)
    assert (rgb[:16] == 0.0).all() and (rgb[16:] == 16.0).all()
    assert "16:16" not in cp2.manifest["chunks"]
    # load_all(None) returns the contiguous prefix even when a stale
    # chunk (32:16 from the longer run) sits past the 20-frame gap
    # (advisor r2: used to raise at the gap)
    rgb_pfx = cp2.load_all()
    assert rgb_pfx.shape == (20, 2, 2, 3)
    assert (rgb_pfx == rgb).all()
