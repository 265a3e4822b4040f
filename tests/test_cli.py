"""CLI smoke tests (SURVEY §2 component 23): every subcommand runs end
to end on a tiny config via subprocess — render (+ --golden, --gbuffer),
animate (+ chunked resume), fit."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_TINY = """\
camera:
  width: 64
  height: 48
  fov: 45.0
  position: [0.0, 0.4, 0.0]
  target: [0.0, 0.0, 3.0]
settings: {shadows: true, max_steps: 64, t_max: 20.0}
objects:
  - node: {type: sphere, center: [0.0, 0.0, 3.0], radius: 0.8}
    material: {type: blinn_phong, albedo: [0.4, 0.6, 0.8], shininess: 32}
  - node: {type: plane, normal: [0.0, 1.0, 0.0], offset: -1.0}
    material: {type: lambert, albedo: [0.5, 0.5, 0.5]}
lights:
  - {type: point, position: [3.0, 4.0, -1.0]}
fit: {type: pose, steps: 8, lr: 0.02}
"""


@pytest.fixture()
def tiny_config(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(_TINY)
    return str(p)


def _run(*args):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "surfjax", *args],
                       capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))),
                       timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_cli_render(tiny_config, tmp_path):
    out = str(tmp_path / "f.png")
    _run("render", "--config", tiny_config, "--out", out)
    assert os.path.getsize(out) > 0


def test_cli_render_golden_and_gbuffer(tiny_config, tmp_path):
    out = str(tmp_path / "g.png")
    _run("render", "--config", tiny_config, "--out", out, "--golden",
         "--gbuffer")
    assert os.path.getsize(out) > 0
    # --gbuffer writes the npz G-buffer next to the image
    gb = out.replace(".png", "_gbuffer.npz")
    if not os.path.exists(gb):
        # accept either naming convention, but SOME npz must exist
        cands = [f for f in os.listdir(os.path.dirname(out))
                 if f.endswith(".npz")]
        assert cands, "no G-buffer npz written"


def test_cli_animate_chunked_resume(tiny_config, tmp_path):
    out_dir = str(tmp_path / "frames")
    _run("animate", "--config", tiny_config, "--frames", "4",
         "--chunk-size", "2", "--out-dir", out_dir)
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 4
    # rerunning resumes (skips complete chunks) and leaves 4 frames
    _run("animate", "--config", tiny_config, "--frames", "4",
         "--chunk-size", "2", "--out-dir", out_dir)
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 4


def test_cli_fit(tiny_config):
    out = _run("fit", "--config", tiny_config, "--mode", "pose",
               "--steps", "8")
    assert "fit_pose" in out
