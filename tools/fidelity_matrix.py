#!/usr/bin/env python
"""Device-path fidelity matrix + regression gate (VERDICT r2 items 3/4,
r3 items 3/4).

Renders each SPEC config at FULL resolution with the pallas backend on
the current jax backend (run on the TPU host for the real-TPU matrix)
and compares against the strict-FP C++ golden oracle on the host CPU:

    hit-mask agreement, abs rgb diff quantiles, ULP-distance quantiles
    (the SPEC's fidelity unit — BASELINE.json:5 "<=1 ULP shading error"),
    bitwise-equal pixel fraction.

All five SPEC configs are gated, including c5 (BASELINE.json:11): its
row renders 3 frames of the 128-frame orbit path and additionally runs
one pose-fit loss+gradient evaluation on the device against a forced-CPU
jnp reference computed in a subprocess.

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

import json
import os
import subprocess
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

DEFAULT_CONFIGS = [
    "configs/c1_sphere.yaml",
    "configs/c2_csg.yaml",
    "configs/c3_sdf.yaml",
    "configs/c4_mesh.yaml",
    "configs/c5_anim.yaml",
]

# Regression thresholds for --check. r4 (verdict Weak #3): c1/c2/c4/c5
# q99 tightened from the r2 1e-4 to ~10x the r2/r3-measured real-TPU
# values (q99.9 measured c1 2.4e-6, c2 5.4e-6, c4 1.4e-6 — docs/
# COMPONENTS.md "Device-path fidelity"), so a silent ~20x fidelity creep
# now trips the gate instead of hiding under catastrophe-sized headroom.
# c3's q99 carries the documented chaotic-silhouette + secondary-LoD
# carve-out. ulp_q99 gates: pinned r4 at ~10x the first real-TPU ULP
# capture (benchmarks/tpu_gate_20260818_080928: c1 q99 61, c2 93,
# c4 16 ULPs — the legal-fusion class tools/op_parity.py pins to fma
# contraction). c3 stays None (marched chaotic trajectories make ULP
# distance meaningless there — q99 measured 6.4M); c5 likewise rides
# its abs-rgb gate (marched class, ULP q99 measured 2.5e4 at
# silhouettes while interior pixels are near-bitwise).
# "gross" gates the fraction of pixels whose worst channel is off by
# >1e-2 (r4, after the mesh bf16-cull find): zero-tolerance on the
# analytic/mesh classes (c1/c2 allow 0 px, c4 allows 1 px at 1080p),
# None on the marched chaotic class (c3: silhouette flips are the
# documented carve-out), ~6 px at 256^2 on c5 (marched, measured max
# 1.1e-2 touches the 1e-2 line at a handful of edge pixels).
THRESHOLDS = {
    "c1_sphere.yaml": {"hit_agree": 0.9999, "q99": 2e-5, "ulp_q99": 600,
                       "gross": 2e-6},
    "c2_csg.yaml": {"hit_agree": 0.9999, "q99": 5e-5, "ulp_q99": 1000,
                    "gross": 2e-6},
    "c3_sdf.yaml": {"hit_agree": 0.9995, "q99": 0.12, "ulp_q99": None,
                    "gross": None},
    # the std (oracle-arithmetic) iteration variant rides the same c3
    # carve-out — cheb is the default since its TPU fidelity row
    # measured IDENTICAL (benchmarks/tpu_gate_20260818_080928); NOT a
    # SPEC config — gated so the variant can't regress unnoticed
    "c3_sdf_std.yaml": {"hit_agree": 0.9995, "q99": 0.12,
                        "ulp_q99": None, "gross": None},
    # bitwise-portable DE-epilogue log variant (r5 measured dead end —
    # docs/COMPONENTS.md "Portable-log experiment"): kept runnable and
    # gated at the same c3 carve-out so the opt-in can't rot
    "c3_sdf_portlog.yaml": {"hit_agree": 0.9995, "q99": 0.12,
                            "ulp_q99": None, "gross": None},
    "c4_mesh.yaml": {"hit_agree": 0.9999, "q99": 2e-5, "ulp_q99": 200,
                     "gross": 5e-7},
    # c5 is a MARCHED smooth-union SDF (unlike analytic c1/c2 or exact-t
    # c4): device-FP trajectories land at O(eps)-different hit t, so the
    # rgb tail sits at silhouette/shadow-boundary pixels. MEASURED
    # (tools/c5_attribution.py Part A, TPU 2026-08-18): q99 2.1-3.6e-4
    # across the 3 gated orbit frames with 84-97% of delta energy in the
    # 3x3-range edge band and interior q99 <= 1.1e-4 — so the blind
    # first-capture threshold (5e-5, the analytic class) was wrong, not
    # the renderer. Gate at ~3x measured. Grad: at the measured-default
    # IFT clamp 1e-2 (engines/sdf.py), device-vs-CPU grad rel L2 is
    # 4.3e-2 (residual = 9 hit-flip px, Part D); gate at ~2.3x.
    "c5_anim.yaml": {"hit_agree": 0.9999, "q99": 1e-3, "ulp_q99": None,
                     "gross": 1e-4,
                     # pose-fit gates (r5 — replaces the r4 0.1 blanket grad-rel gate,
    # verdict Weak #3). Device side = PALLAS HYBRID forward on TPU
    # (surfjax/diff/hybrid.py). MEASURED on the real TPU 2026-08-19
    # against the forced-CPU jnp reference: loss rel 1.03e-5, grad rel
    # 2.08e-2, cos 0.99986, hit-flip px 0/65536 — the hybrid BEATS the
    # r4 jnp-on-TPU numbers (4.3e-2 grad rel, 9 flips) because its
    # forward is the deterministic kernel trace, not a second
    # backend-fused jnp program. Gates at ~3x measured: a 10%
    # systematic grad error or a direction error trips; the flip budget
    # guards the carve-out class explicitly.
                     "fit_loss_rel": 3e-4,
                     "fit_grad_cos": 0.995,
                     "fit_grad_interior_rel": 6e-2,
                     "fit_hit_flip_px": 40},
}

# c5 orbit frames checked on the device (of the config's 128)
C5_FRAMES = (0, 43, 86)


def _metrics(rgb_d, hit_d, golden):
    from surfjax.io.image import ulp_diff_f32
    rgb_d = np.asarray(rgb_d)
    hit_d = np.asarray(hit_d)
    rgb_g = golden["rgb"].reshape(rgb_d.shape)
    hit_g = golden["hit"].reshape(hit_d.shape)
    d = np.abs(rgb_d - rgb_g)
    ulp = ulp_diff_f32(rgb_d.astype(np.float32),
                       rgb_g.astype(np.float32)).astype(np.float64)
    return {
        "hit_agree": float((hit_d == hit_g).mean()),
        "mean": float(d.mean()),
        "q99": float(np.quantile(d, 0.99)),
        "q999": float(np.quantile(d, 0.999)),
        "max": float(d.max()),
        # ULP-denominated columns (BASELINE.json:5's unit): distance in
        # representable f32 steps, per channel
        "ulp_q99": float(np.quantile(ulp, 0.99)),
        "ulp_q999": float(np.quantile(ulp, 0.999)),
        "ulp_max": float(ulp.max()),
        "ulp_le1": float((ulp <= 1).mean()),   # <=1-ULP channel fraction
        "bitwise": float((rgb_d == rgb_g).all(axis=-1).mean()),
        # gross-pixel fraction: pixels whose worst channel is off by
        # >1e-2. Catches the small-count/large-error class the quantile
        # gates are blind to (r4: a non-conservative bf16 cull in
        # mesh_candidates dropped a true hit on 118 c4 pixels — max hit
        # 0.289 while q99 stayed at 4.8e-7 and the gate passed)
        "gross": float((d.max(axis=-1) > 1e-2).mean()),
        "shape": hit_d.shape,
    }


def _worst(ms):
    """Aggregate per-frame metric dicts into the worst-case row."""
    out = dict(ms[0])
    for m in ms[1:]:
        for k in ("mean", "q99", "q999", "max",
                  "ulp_q99", "ulp_q999", "ulp_max", "gross"):
            out[k] = max(out[k], m[k])
        for k in ("hit_agree", "bitwise", "ulp_le1"):
            out[k] = min(out[k], m[k])
    return out


def _row(name, m):
    h, w = m["shape"] if len(m["shape"]) == 2 else (m["shape"][0], 1)
    print(f"| {name:22s} | {w}x{h} | hit agree {m['hit_agree']:.6f} "
          f"| mean {m['mean']:.3e} | q99 {m['q99']:.3e} "
          f"| q99.9 {m['q999']:.3e} "
          f"| max {m['max']:.3e} "
          f"| ulp q99 {m['ulp_q99']:.0f} | ulp q99.9 {m['ulp_q999']:.0f} "
          f"| ulp max {m['ulp_max']:.0f} | <=1ulp {m['ulp_le1'] * 100:.1f}% "
          f"| bitwise px {m['bitwise'] * 100:.1f}% "
          f"| gross px {m['gross']:.2e} |")


def _c5_frame_cameras(path):
    """The checked orbit frames as explicit (Camera, name) pairs, poses
    computed in float32 numpy so device and oracle render the IDENTICAL
    pose (mirrors __main__.cmd_animate's orbit_pose math)."""
    import jax
    import jax.numpy as jnp
    from surfjax.api import Camera
    from surfjax.config import load_config
    from surfjax.core.camera import orbit_pose

    scene, camera, settings, extras = load_config(path)
    anim = extras.get("animation") or {}
    n = int(anim.get("frames", 128))
    center = np.asarray(anim.get("center", (0, 0, 0)), np.float32)
    cams = []
    for i in C5_FRAMES:
        th = np.float32(2.0 * np.pi * i / n)
        R, t = orbit_pose(jnp.float32(anim.get("radius", 4.0)),
                          jnp.float32(anim.get("height", -1.0)), th)
        R = np.asarray(R, np.float32).reshape(3, 3)
        t = np.asarray(t, np.float32) + center
        cams.append((Camera(camera.intrinsics, rotation=tuple(map(tuple, R)),
                            position=tuple(t)), f"frame{i}"))
    return scene, cams, settings


def _fit_reference_subprocess(path, hit_dev: np.ndarray):
    """Forced-CPU jnp reference of the pose-fit probe, via subprocess
    (the TPU host's default platform is pinned by sitecustomize).

    Takes the DEVICE hit mask at the probe pose; the child renders its
    own, builds the agreement mask (the gate's shared interior weights),
    and returns full + interior loss/grad, the flip count, and the mask
    (via a tmp npz) so the parent computes the device interior grad
    against the IDENTICAL weights."""
    import tempfile
    tmp = tempfile.mkdtemp(prefix="surfjax_fit_gate_")
    hit_path = os.path.join(tmp, "hit_dev.npz")
    mask_path = os.path.join(tmp, "mask.npz")
    np.savez(hit_path, hit=hit_dev)
    code = (
        "import json, sys\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {_ROOT!r})\n"
        "from surfjax.config import load_config\n"
        "from surfjax.diff.fit import pose_loss_and_grad, pose_probe_hit\n"
        f"scene, cam, settings, _ = load_config({path!r})\n"
        f"hit_dev = np.load({hit_path!r})['hit']\n"
        "hit_ref = pose_probe_hit(scene, cam, settings)\n"
        "mask = (hit_dev == hit_ref).astype(np.float32)\n"
        f"np.savez({mask_path!r}, mask=mask)\n"
        "loss, g = pose_loss_and_grad(scene, cam, settings)\n"
        "li, gi = pose_loss_and_grad(scene, cam, settings, "
        "pixel_weight=mask)\n"
        "print(json.dumps({'loss': loss, 'gw': g['w'].tolist(),\n"
        "                  'gdt': g['dt'].tolist(),\n"
        "                  'loss_int': li, 'gw_int': gi['w'].tolist(),\n"
        "                  'gdt_int': gi['dt'].tolist(),\n"
        "                  'flips': int((hit_dev != hit_ref).sum()),\n"
        "                  'px': int(hit_ref.size)}))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # skip the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=_ROOT,
                          capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(f"fit reference subprocess failed:\n"
                           f"{proc.stderr[-2000:]}")
    ref = json.loads(proc.stdout.strip().splitlines()[-1])
    ref["mask"] = np.load(mask_path)["mask"]
    return ref


def _rel(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def fit_check(path, th):
    """Pose-fit loss+grad on the device vs the forced-CPU jnp reference.

    On TPU the device side runs the PALLAS hybrid fit forward
    (surfjax/diff/hybrid.py) — the path fit_pose/fit_sdf actually use
    there. Four gates (r4 verdict Weak #3 — the 0.1 blanket grad gate
    is gone): loss rel; full-grad cosine; INTERIOR grad rel (both sides
    re-evaluated with cross-backend hit-agreement pixel weights, so the
    documented hit-flip carve-out can't hide a systematic grad error);
    and the hit-flip pixel count as its own explicit budget.
    -> True/False; prints a row either way."""
    import jax
    from surfjax.config import load_config
    from surfjax.diff.fit import pose_loss_and_grad, pose_probe_hit

    scene, cam, settings, _ = load_config(path)
    if jax.default_backend() == "tpu":
        settings = settings.with_(backend="pallas")
    hit_dev = pose_probe_hit(scene, cam, settings)
    ref = _fit_reference_subprocess(path, hit_dev)
    loss_d, g_d = pose_loss_and_grad(scene, cam, settings)
    loss_i, g_i = pose_loss_and_grad(scene, cam, settings,
                                     pixel_weight=ref["mask"])

    cat = lambda g: np.concatenate([np.asarray(g[0], np.float64),
                                    np.asarray(g[1], np.float64)])
    g_ref = cat((ref["gw"], ref["gdt"]))
    g_dev = cat((g_d["w"], g_d["dt"]))
    g_ref_i = cat((ref["gw_int"], ref["gdt_int"]))
    g_dev_i = cat((g_i["w"], g_i["dt"]))

    loss_rel = abs(loss_d - ref["loss"]) / max(abs(ref["loss"]), 1e-12)
    grad_rel = _rel(g_dev, g_ref)
    grad_cos = float(g_dev @ g_ref / max(
        np.linalg.norm(g_dev) * np.linalg.norm(g_ref), 1e-30))
    grad_rel_int = _rel(g_dev_i, g_ref_i)
    flips = ref["flips"]
    print(f"| c5 fit-step           | loss {loss_d:.6g} "
          f"(ref {ref['loss']:.6g}, rel {loss_rel:.2e}) "
          f"| grad rel {grad_rel:.2e} cos {grad_cos:.5f} "
          f"| interior grad rel {grad_rel_int:.2e} "
          f"| hit-flip px {flips}/{ref['px']} |")
    ok = True
    if loss_rel > th["fit_loss_rel"]:
        print(f"  FIDELITY REGRESSION c5 fit: loss rel {loss_rel:.2e} > "
              f"{th['fit_loss_rel']}", file=sys.stderr)
        ok = False
    if grad_cos < th["fit_grad_cos"]:
        print(f"  FIDELITY REGRESSION c5 fit: grad cosine {grad_cos:.5f} "
              f"< {th['fit_grad_cos']}", file=sys.stderr)
        ok = False
    if grad_rel_int > th["fit_grad_interior_rel"]:
        print(f"  FIDELITY REGRESSION c5 fit: interior grad rel "
              f"{grad_rel_int:.2e} > {th['fit_grad_interior_rel']}",
              file=sys.stderr)
        ok = False
    if flips > th["fit_hit_flip_px"]:
        print(f"  FIDELITY REGRESSION c5 fit: hit-flip pixels {flips} > "
              f"{th['fit_hit_flip_px']}", file=sys.stderr)
        ok = False
    return ok


def _gate(name, m, th) -> bool:
    ok = True
    if m["hit_agree"] < th["hit_agree"]:
        print(f"  FIDELITY REGRESSION {name}: hit_agree "
              f"{m['hit_agree']:.6f} < {th['hit_agree']}", file=sys.stderr)
        ok = False
    if m["q99"] > th["q99"]:
        print(f"  FIDELITY REGRESSION {name}: q99 {m['q99']:.3e} > "
              f"{th['q99']}", file=sys.stderr)
        ok = False
    if th.get("ulp_q99") is not None and m["ulp_q99"] > th["ulp_q99"]:
        print(f"  FIDELITY REGRESSION {name}: ulp_q99 {m['ulp_q99']:.0f} > "
              f"{th['ulp_q99']}", file=sys.stderr)
        ok = False
    if th.get("gross") is not None and m["gross"] > th["gross"]:
        print(f"  FIDELITY REGRESSION {name}: gross-pixel fraction "
              f"{m['gross']:.2e} > {th['gross']}", file=sys.stderr)
        ok = False
    return ok


def one_config(path: str, check: bool = False) -> bool:
    import jax
    from surfjax.config import load_config
    from surfjax.golden import cpp_bridge
    from surfjax.pipeline.frame import render_frame

    name = os.path.basename(path)
    on_tpu = jax.default_backend() == "tpu"

    if "c5" in name:
        scene, cams, settings = _c5_frame_cameras(path)
        if on_tpu:
            settings = settings.with_(backend="pallas")
        ms = []
        for cam, _fname in cams:
            fb = render_frame(scene, cam, settings)
            g = cpp_bridge.render(scene, cam, settings)
            ms.append(_metrics(fb.rgb, fb.hit, g))
        m = _worst(ms)
    else:
        scene, camera, settings, _ = load_config(path)
        if on_tpu:
            settings = settings.with_(backend="pallas")
        fb = render_frame(scene, camera, settings)
        g = cpp_bridge.render(scene, camera, settings)
        m = _metrics(fb.rgb, fb.hit, g)
    _row(name, m)

    if not check:
        if "c5" in name:
            # report-only: use the canonical c5 tolerances when this
            # exact filename has no THRESHOLDS row (variant sweeps)
            fit_check(path, THRESHOLDS.get(name,
                                           THRESHOLDS["c5_anim.yaml"]))
        return True
    th = THRESHOLDS.get(name)
    if th is None:
        # a config without a threshold row must FAIL the gate loudly —
        # otherwise a renamed/added config is silently never gated
        print(f"  FIDELITY GATE: no THRESHOLDS entry for {name}; add "
              f"one (tools/fidelity_matrix.py)", file=sys.stderr)
        return False
    ok = _gate(name, m, th)
    if "c5" in name:
        ok = fit_check(path, th) and ok
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
        _row(name, _metrics(fb.rgb, fb.hit, golden))


def main():
    # the per-round gate must fail FAST on a dead relay, like bench.py /
    # perf_check (review r4: this entry point was left unguarded)
    from surfjax.utils.backend_probe import (
        honor_env_platforms, probe_backend,
    )
    probe = probe_backend()
    if not probe.get("ok"):
        print(f"fidelity_matrix: backend unavailable "
              f"({probe.get('error')})", file=sys.stderr)
        return 2
    honor_env_platforms()

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
