#!/usr/bin/env python
"""Device-path fidelity matrix (VERDICT r1 item 6 / docs/COMPONENTS.md).

Renders each SPEC config at FULL resolution with the pallas backend on
the current jax backend (run on the TPU host for the real-TPU matrix)
and compares against the strict-FP C++ golden oracle on the host CPU:

    hit-mask agreement, max abs rgb diff, bitwise-equal pixel fraction.

Usage: python tools/fidelity_matrix.py [config ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = [
    "configs/c1_sphere.yaml",
    "configs/c2_csg.yaml",
    "configs/c3_sdf.yaml",
    "configs/c4_mesh.yaml",
]


def one_config(path: str):
    import jax
    from surfjax.config import load_config
    from surfjax.golden import cpp_bridge
    from surfjax.pipeline.frame import render_frame

    scene, camera, settings, _ = load_config(path)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    fb = render_frame(scene, camera, settings)
    rgb_d = np.asarray(fb.rgb)
    hit_d = np.asarray(fb.hit)

    g = cpp_bridge.render(scene, camera, settings)
    rgb_g = g["rgb"].reshape(rgb_d.shape)
    hit_g = g["hit"].reshape(hit_d.shape)

    hit_agree = float((hit_d == hit_g).mean())
    d = np.abs(rgb_d - rgb_g)
    bitwise = float((rgb_d == rgb_g).all(axis=-1).mean())
    name = os.path.basename(path)
    h, w = hit_d.shape if hit_d.ndim == 2 else (hit_d.shape[0], 1)
    print(f"| {name:16s} | {w}x{h} | hit agree {hit_agree:.6f} "
          f"| mean {d.mean():.3e} | q99 {np.quantile(d, 0.99):.3e} "
          f"| q99.9 {np.quantile(d, 0.999):.3e} "
          f"| max {d.max():.3e} | bitwise px {bitwise * 100:.1f}% |")


def main():
    import jax
    print(f"backend: {jax.default_backend()}")
    configs = sys.argv[1:] or DEFAULT_CONFIGS
    for c in configs:
        one_config(c)


if __name__ == "__main__":
    main()
