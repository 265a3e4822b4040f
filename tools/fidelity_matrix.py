#!/usr/bin/env python
"""Device-path fidelity matrix + regression gate (VERDICT r2 items 3/4).

Renders each SPEC config at FULL resolution with the pallas backend on
the current jax backend (run on the TPU host for the real-TPU matrix)
and compares against the strict-FP C++ golden oracle on the host CPU:

    hit-mask agreement, max abs rgb diff, bitwise-equal pixel fraction.

Modes:
    python tools/fidelity_matrix.py [config ...]   # print the matrix
    python tools/fidelity_matrix.py --check        # gate: exit 1 if any
        config regresses past its threshold (run on the TPU each round
        beside tools/perf_check.py)
    python tools/fidelity_matrix.py --decompose    # c3 attribution rows:
        (default) / (lod=0) / (relax=1.0) / (both) against ONE golden
        render, separating secondary-ray LoD from over-relaxation from
        chaotic-silhouette divergence in the c3 q99/bitwise numbers
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

# Regression thresholds for --check, set ~1.5-2x above the r2-measured
# real-TPU values (docs/COMPONENTS.md "Device-path fidelity"): a Mosaic
# lowering regression (layout, rsqrt semantics, DMA) shows up as orders
# of magnitude, not percent. c3's q99 carries the documented
# chaotic-silhouette + secondary-LoD carve-out.
THRESHOLDS = {
    "c1_sphere.yaml": {"hit_agree": 0.9999, "q99": 1e-4},
    "c2_csg.yaml": {"hit_agree": 0.9999, "q99": 1e-4},
    "c3_sdf.yaml": {"hit_agree": 0.9995, "q99": 0.12},
    "c4_mesh.yaml": {"hit_agree": 0.9999, "q99": 1e-4},
}


def _metrics(fb, golden):
    rgb_d = np.asarray(fb.rgb)
    hit_d = np.asarray(fb.hit)
    rgb_g = golden["rgb"].reshape(rgb_d.shape)
    hit_g = golden["hit"].reshape(hit_d.shape)
    d = np.abs(rgb_d - rgb_g)
    return {
        "hit_agree": float((hit_d == hit_g).mean()),
        "mean": float(d.mean()),
        "q99": float(np.quantile(d, 0.99)),
        "q999": float(np.quantile(d, 0.999)),
        "max": float(d.max()),
        "bitwise": float((rgb_d == rgb_g).all(axis=-1).mean()),
        "shape": hit_d.shape,
    }


def _row(name, m):
    h, w = m["shape"] if len(m["shape"]) == 2 else (m["shape"][0], 1)
    print(f"| {name:22s} | {w}x{h} | hit agree {m['hit_agree']:.6f} "
          f"| mean {m['mean']:.3e} | q99 {m['q99']:.3e} "
          f"| q99.9 {m['q999']:.3e} "
          f"| max {m['max']:.3e} | bitwise px {m['bitwise'] * 100:.1f}% |")


def one_config(path: str, check: bool = False) -> bool:
    import jax
    from surfjax.config import load_config
    from surfjax.golden import cpp_bridge
    from surfjax.pipeline.frame import render_frame

    scene, camera, settings, _ = load_config(path)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    fb = render_frame(scene, camera, settings)
    g = cpp_bridge.render(scene, camera, settings)
    m = _metrics(fb, g)
    name = os.path.basename(path)
    _row(name, m)
    if not check:
        return True
    th = THRESHOLDS.get(name)
    if th is None:
        # a config without a threshold row must FAIL the gate loudly —
        # otherwise a renamed/added config is silently never gated
        print(f"  FIDELITY GATE: no THRESHOLDS entry for {name}; add "
              f"one (tools/fidelity_matrix.py)", file=sys.stderr)
        return False
    ok = True
    if m["hit_agree"] < th["hit_agree"]:
        print(f"  FIDELITY REGRESSION {name}: hit_agree "
              f"{m['hit_agree']:.6f} < {th['hit_agree']}", file=sys.stderr)
        ok = False
    if m["q99"] > th["q99"]:
        print(f"  FIDELITY REGRESSION {name}: q99 {m['q99']:.3e} > "
              f"{th['q99']}", file=sys.stderr)
        ok = False
    return ok


def decompose(path: str = "configs/c3_sdf.yaml"):
    """c3 attribution: how much of the q99 / bitwise gap is secondary-ray
    LoD vs over-relaxation vs residual (chaotic silhouette + FMA)."""
    import jax
    from surfjax.config import load_config
    from surfjax.golden import cpp_bridge
    from surfjax.pipeline.frame import render_frame

    scene, camera, settings, _ = load_config(path)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    golden = cpp_bridge.render(scene, camera, settings)
    variants = [
        ("c3 default (LoD, relax)", settings),
        ("c3 lod=0", settings.with_(secondary_lod_iters=0,
                                    ao_lod_iters=0)),
        ("c3 relax=1.0", settings.with_(over_relax=1.0)),
        ("c3 lod=0 relax=1.0", settings.with_(secondary_lod_iters=0,
                                              ao_lod_iters=0,
                                              over_relax=1.0)),
    ]
    for name, s in variants:
        fb = render_frame(scene, camera, s)
        _row(name, _metrics(fb, golden))


def main():
    import jax
    print(f"backend: {jax.default_backend()}")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    check = "--check" in sys.argv
    if "--decompose" in sys.argv:
        for c in (args or ["configs/c3_sdf.yaml"]):
            decompose(c)
        return 0
    ok = True
    for c in args or DEFAULT_CONFIGS:
        ok = one_config(c, check=check) and ok
    if check:
        print("fidelity ok" if ok else "fidelity REGRESSION", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
