"""The TPU fidelity gate's static configuration, pinned on CPU.

The gate itself (tools/fidelity_matrix.py --check) only runs when the
TPU is reachable; these checks catch the config-drift class — a SPEC
config renamed/removed, a THRESHOLDS row going stale, a threshold
accidentally loosened past its documented headroom — in every CPU CI
run instead of at the next relay window. [BASELINE.json:7-11: all five
configs are first-class and must stay gated.]
"""

import os

from tools.fidelity_matrix import C5_FRAMES, DEFAULT_CONFIGS, THRESHOLDS

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_spec_configs_gated():
    names = [os.path.basename(p) for p in DEFAULT_CONFIGS]
    assert names == ["c1_sphere.yaml", "c2_csg.yaml", "c3_sdf.yaml",
                     "c4_mesh.yaml", "c5_anim.yaml"]
    for p in DEFAULT_CONFIGS:
        assert os.path.exists(os.path.join(ROOT, p)), p
        assert os.path.basename(p) in THRESHOLDS, p


def test_thresholds_rows_map_to_existing_configs():
    # a stale THRESHOLDS key (e.g. a renamed variant config) silently
    # gates nothing — every row must have a matching file
    for name in THRESHOLDS:
        assert os.path.exists(os.path.join(ROOT, "configs", name)), name


def test_threshold_shapes_and_headroom():
    for name, th in THRESHOLDS.items():
        assert 0.999 <= th["hit_agree"] <= 1.0, name
        assert th["q99"] > 0, name
    # tightened r4 values (verdict Weak #3): a loosening past the
    # documented ~10x-measured headroom must be a deliberate edit here
    assert THRESHOLDS["c1_sphere.yaml"]["q99"] <= 2e-5
    assert THRESHOLDS["c2_csg.yaml"]["q99"] <= 5e-5
    assert THRESHOLDS["c4_mesh.yaml"]["q99"] <= 2e-5
    # ULP gates pinned r4 from the first real-TPU capture
    assert THRESHOLDS["c1_sphere.yaml"]["ulp_q99"] <= 600
    assert THRESHOLDS["c2_csg.yaml"]["ulp_q99"] <= 1000
    assert THRESHOLDS["c4_mesh.yaml"]["ulp_q99"] <= 200
    # c5: marched-class rgb gate + fit probe gates (measured,
    # tools/c5_attribution.py)
    c5 = THRESHOLDS["c5_anim.yaml"]
    assert c5["q99"] <= 1e-3
    # r5 fit gates (hybrid pallas forward; measured loss rel 1.03e-5,
    # grad rel 2.08e-2, cos 0.99986, 0 hit flips — the r4 0.1 blanket
    # grad-rel gate is GONE, verdict Weak #3)
    assert c5["fit_loss_rel"] <= 3e-4
    assert c5["fit_grad_cos"] >= 0.995
    assert c5["fit_grad_interior_rel"] <= 6e-2
    assert c5["fit_hit_flip_px"] <= 40
    assert "fit_grad_rel" not in c5  # the blanket gate must not return
    assert len(C5_FRAMES) >= 3
    # gross-pixel gates (r4, after the mesh bf16-cull find): the
    # quantile gates are blind to a handful of grossly-wrong pixels, so
    # the analytic/mesh classes carry a near-zero-tolerance gate
    assert THRESHOLDS["c1_sphere.yaml"]["gross"] <= 2e-6
    assert THRESHOLDS["c2_csg.yaml"]["gross"] <= 2e-6
    assert THRESHOLDS["c4_mesh.yaml"]["gross"] <= 5e-7
    assert c5["gross"] <= 1e-4


def test_std_variant_stays_gated():
    # the oracle-arithmetic bulb iteration rides a variant config so a
    # default-regression is one look at the tpu_gate logs
    assert "c3_sdf_std.yaml" in THRESHOLDS
    with open(os.path.join(ROOT, "tools", "tpu_gate.py")) as fh:
        gate = fh.read()
    assert "c3_sdf_std.yaml" in gate
    assert "bulb_iter=std" in gate
