"""Shared value types: RenderSettings, FrameBuffers, Hit.

SURVEY.md §5.6 (config system — everything hashable so it participates in
`jit` static args cleanly) and §2 component 15 (G-buffer output).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render configuration. Hashable: safe as a jit static arg."""
    # trace
    max_steps: int = 256          # bounded march trip count [BASELINE.json:2]
    t_min: float = 1e-3
    t_max: float = 1e4
    hit_eps: float = 1e-3         # SDF hit threshold
    # Kernel-path over-relaxed march step factor (1.0 = off). Swept on
    # the FULL bench harness under the cheb default (r5,
    # benchmarks/relax_sweep_r5.log): LoD-mode 1.0/1.2/1.4/1.6 ->
    # 567.0/578.9/597.3/584.9 Mrays/s — 1.4 beats the old 1.6 default
    # by +2.1% AND perturbs trajectories strictly less (relax
    # contributes ~2.7e-2 of c3's q99 at 1.6 — docs/COMPONENTS.md
    # decomposition). At full DE (both LoDs 0) relax is TIME-NEUTRAL
    # (438.8/434.3/445.1/438.3 — within run jitter of the relax-1.0
    # 438.8-439.1 band), so the exact bench mode forces 1.0 and pays
    # nothing (r4 verdict Next #2).
    over_relax: float = 1.4
    hit_eps_scale: float = 0.0    # cone eps: eps_eff = hit_eps + t*scale
    normal_eps: float = 5e-4      # FD-normal tetrahedron offset
    normals: str = "auto"         # "auto" (analytic where possible) | "fd"
    # secondary rays
    shadow_steps: int = 64        # soft-shadow march trip count
    shadows: bool = True
    soft_shadows: bool = False
    soft_shadow_k: float = 8.0    # SDF penumbra sharpness
    soft_shadow_tmin: float = 0.02
    shadow_eps: float = 1e-3      # offset along normal for secondary origins
    ao: bool = False
    ao_samples: int = 5           # taps of the fixed-direction AO probe
    ao_radius: float = 0.5
    ao_strength: float = 1.0
    # Secondary-ray level of detail (pallas path only): soft-shadow and AO
    # probes evaluate fractal DEs with at most this many iterations
    # (0 = full). The truncated prisoner set is a superset of the full
    # one, so occlusion is conservative — penumbrae get slightly darker,
    # never lighter; primary hits and hard shadows are unaffected.
    # Measured on c3 1080p at the default 4: visibility diff vs full is
    # mean 2.3e-4 / q99 3.9e-3 (sub-1/255 for 99% of pixels) for -35% K2
    # time. Set 0 for bit-faithful secondary rays.
    secondary_lod_iters: int = 4
    # AO-probe fractal LoD (pallas path only), separate from the shadow
    # LoD because AO is a far softer signal than a penumbra edge: probes
    # average ao_samples cosine-weighted taps into a single multiplier,
    # so the truncated-set over-occlusion washes out. Measured on c3
    # 1080p at the default 2: rgb diff vs full-iteration AO is mean
    # 5.7e-5 / q99 1.1e-3 / max 5.7e-3 (sub-1.5/255 everywhere) for
    # -1.3 ms vs AO at the shadow LoD, -3.8 ms vs full. 0 falls back to
    # secondary_lod_iters; occlusion remains conservative (only darkens).
    ao_lod_iters: int = 2
    # Capped-march residual scheduling (pallas tile path only; exact —
    # see kernels/render_tile.py::_block_residual): pass A bounds every
    # SDF march at march_cap steps (shadow marches at shadow_march_cap),
    # so a tile's while-loop time is bounded by the cap instead of its
    # worst lane's crawl; the (8,128) blocks holding a cut-off lane are
    # then gathered, re-run at full budget, and scattered back. Results
    # are bit-identical to the uncapped pass at any cap value. 0 (the
    # default) disables the cap: on the c3 fractal workload the
    # divergent lanes line the silhouette and spread over ~26% of
    # blocks, so the residual pass measured 3-18 ms SLOWER at 1080p —
    # enable only for scenes whose slow lanes cluster spatially.
    march_cap: int = 0
    shadow_march_cap: int = 0
    # shading
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # kernel/backend selection: "jnp" (pure jax.numpy twin) | "pallas"
    backend: str = "jnp"
    # Pallas tiling: rays per tile block = tile_rows * 128. Swept on the
    # TPU each time per-trip loop overhead changes: pre-unroll the
    # optimum was 64 (flat 64-128); with the r3 march/DE while-trip
    # unrolls (8x lower trip overhead) finer tiles won back divergence:
    # 16/32/48/64 -> 339/481/509/502 Mrays/s LoD, 267/367/381/372 exact
    # (std iteration). RE-SWEPT under the r4 cheb default (cheaper DE
    # iterations shift the divergence/overhead balance back up): full
    # bench harness 48/56/64 -> 573.1/575.2/585.1 LoD, 434.1/432.7/438.9
    # exact — 64 wins (+2.1%/+1.1%), confirmed on the short harness
    # (32/40/48/64 -> 518/552/559/572 LoD). Packet-mesh scenes with
    # large candidate sets prefer finer tiles (more candidates +
    # overflow full-scans per bigger tile): the 8192-tri c4 config
    # measured 183.0 Mrays/s at 48 vs 165.1 at 64 (its yaml pins 48),
    # while the 128-tri fixture improved 727.6 -> 748.4 at 64.
    tile_rows: int = 64
    # per-(N,128) sub-block march loops (0=off). Do NOT enable on real
    # TPU: slicing sub-blocks inside the kernel crashes Mosaic's
    # ApplyVectorLayout (vector_extract_strided_slice limits check),
    # observed 2026-08-17 on v5e.
    subtile_rows: int = 0
    # OPT-IN cone-march priming (pallas frames >= prime_min px on a
    # side): a 1/4-res pass bounds each 4x4 pixel block's safe march
    # start. Conservative (hit masks preserved), but hits land anywhere
    # in the eps tolerance band and tile time is set by the worst
    # grazing lane, which priming cannot shorten — measured ~2% at
    # 1080p, so it stays off by default.
    prime: bool = False
    prime_min: int = 256
    # Mandelbulb iteration form on the kernel path: "cheb" (Re/Im of
    # three complex squarings + factored k1 — ~18% fewer ops/iteration,
    # engines/sdf.sdf_mandelbulb_while_cheb) | "std" (the expanded
    # degree-8 polynomials, the arithmetic the oracles + the eager
    # differentiable path use). Mathematically exact identities; f32
    # reassociation decorrelates hits in the eps band at chaotic
    # silhouettes (same class as over-relaxation). MEASURED on the real
    # TPU (benchmarks/tpu_gate_20260818_080928): cheb 572.3/433.2
    # Mrays/s LoD/exact vs std 523.8/389.1 (+9%/+11%), device fidelity
    # row IDENTICAL to std on c3 (q99 7.602e-2, bitwise 26.4%, hit
    # agree 0.999969 — the same chaotic-silhouette carve-out class) —
    # so the faster form is the default; "std" remains for
    # oracle-arithmetic runs and is fidelity/perf-gated as the variant
    # (configs/c3_sdf_std.yaml row in tools/fidelity_matrix.py).
    bulb_iter: str = "cheb"
    # Mandelbulb DE epilogue log on the kernel path AND in both golden
    # oracles: "hw" (jnp.log / np.log / std::log — fastest; on Mosaic
    # jnp.log measured up to 4023 ULP off host libm, tools/op_parity.py,
    # perturbing every DE value ~5e-4 rel and feeding the eps-band hit
    # decorrelation behind the c3/c5 marched carve-out) | "portable"
    # (core.math.portable_log — a two-round mul/add polynomial that is
    # BITWISE-identical across Mosaic/XLA-CPU/NumPy/C++ by construction,
    # so the kernel and the oracles compute the same log; ~1.9e-6 max
    # abs err). The flag governs the kernel path and BOTH goldens; the
    # jnp pipeline and the differentiable (IFT) path keep hw log, so
    # "portable" is opt-in. Measured effect on the real-TPU c3 fidelity
    # row: see docs/COMPONENTS.md "Portable-log experiment (r5)".
    bulb_log: str = "hw"
    # Vectorized object loop for LARGE scenes (r3 verdict Weak #4): with
    # the flag on, single-leaf positively-signed sphere/box objects of
    # the SDF AND analytic engines, PLUS (r5) SDF two-leaf PAIRS — tape
    # exactly op(leaf0, leaf1) for ANY of the six binary CSG ops
    # (union/intersect/subtract + smooth forms) with positive
    # sphere/box leaves (the repeated-structure CSG class, whose
    # unrolled compile measured 89.8 s at 65 objects / 222.6 s at 129,
    # tools/compile_scaling.py --scene=csgpair) — form the "crowd":
    # traced/shaded by lax.fori_loops whose bodies read each member's
    # parameters dynamically (SMEM scalar reads) — SDF members march,
    # analytic members take their exact interval hits and closed-form
    # normals — instead of the per-object static unrolling that costs
    # ~0.67-1.7 s of warm compile per object. Per-lane arithmetic is IDENTICAL to the
    # unrolled path (same _bound_entry + _march + per-member normals/
    # shadows/AO/shading), so geometry outputs (depth/normal/hit/obj_id)
    # are BITWISE-equal to the unrolled path and rgb is within 2 ULP
    # (XLA fuses the gathered-material shade epilogue differently —
    # asserted in tests/test_crowd.py). One caveat: members march
    # spheres-first (then boxes, then the non-crowd objects), so a hit
    # landing at the BIT-IDENTICAL f32 t on two objects of different
    # kinds tie-breaks to a different winner than the unrolled path's
    # scene order (measure-zero; within a kind, scene order is kept).
    # Render cost stays linear in object count (per-object march
    # semantics is what the golden oracle defines). Objects outside the crowd class (planes, bulbs,
    # CSG tapes, analytic, mesh) keep the unrolled path. Cone-march
    # priming is skipped when a crowd is active. Compile/render
    # crossover vs the unrolled path: tools/compile_scaling.py; the TPU
    # table lands in docs/COMPONENTS.md "Scene-size ceiling" (pending
    # relay recovery as of r4 — CPU-backend numbers exercise the jnp
    # pipeline only).
    vector_objects: bool = False

    def with_(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)


class FrameBuffers(NamedTuple):
    """Per-frame output G-buffer (component 15). All (H, W[, C]) float32."""
    rgb: Any          # (H, W, 3)
    depth: Any        # (H, W)   hit distance t (0.0 on miss — mask sky
                      #          with `hit`, not depth)
    normal: Any       # (H, W, 3) zeroed on miss
    hit: Any          # (H, W)   1.0 where a surface was hit
    obj_id: Any       # (H, W)   int32 object index (-1 on miss)


class Hit(NamedTuple):
    """Result of scene intersection for a batch of rays (flat shapes)."""
    t: Any            # (N,) float32, BIG on miss
    obj_id: Any       # (N,) int32, -1 on miss
    leaf_id: Any      # (N,) int32 OBJECT-LOCAL leaf index (analytic
                      # normal lookup; mesh hits carry the triangle id)
    mask: Any         # (N,) bool


def tree_f32(x):
    return jax.tree.map(lambda a: a.astype("float32") if hasattr(a, "astype") else a, x)
