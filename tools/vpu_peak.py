#!/usr/bin/env python
"""Measured VPU f32 peak on the EXACT bulb-iteration op mix (r3 verdict
Weak #1 / Next #2a).

Round 3 concluded the exact-fidelity mode is "ALU-bound as scheduled"
from a SELF-calibrated roofline (iteration counters x stage times ->
~27 ps per penumbra iteration-lane). Nothing pinned what the v5e VPU can
actually sustain on this op mix in a pallas kernel. This tool measures
it: a VMEM-resident kernel runs K iterations of the power-8 Mandelbulb
DE substep (the arithmetic of engines/sdf.sdf_mandelbulb_while::substep,
including the masked selects, with a never-escaping orbit so there is
ZERO divergence and no while/cond overhead), plus two baseline kernels
(dependent FMA chain = latency bound; 8 independent FMA chains =
throughput bound).

Output: ps per iteration-lane and effective f32 Tflop/s per kernel.
Comparing the render kernel's measured ps/iteration-lane against the
no-divergence peak converts "structural, not a scheduling deficit" from
an assumption into a number (MFU = peak_ps / achieved_ps).

r5 (verdict Weak #1 / Next #1b): the synthetic kernels take --unroll N
and run N substeps per fori trip — the render kernel amortizes loop
control over DE_UNROLL=4 substeps per while trip (engines/sdf.py
_bulb_while_driver), so an unroll-1 synthetic includes per-iteration
loop overhead the render path does not pay and is NOT a ceiling
(that mismatch is how r4 read "MFU >= 1.0", a methodology error).
The default sweep runs unroll 1/4/8; compare the render kernel against
the unroll-4 row. The r4 "fma_par8" kernel is DELETED: its carry was a
tuple of 8 (rows,128) f32 arrays (1 MB at rows=256) that spilled, and
it measured 16.15 ps/iter (0.99 Tflop/s) — SLOWER per flop than the
dependent chain (1.74 ps, 1.15 Tflop/s), i.e. not a throughput ceiling
(committed log benchmarks/vpu_peak_20260819_0100_solo.log). A
dependent elementwise chain over a (256,128) block already pipelines
32 independent (8,128)-vreg chains, so the UNROLLED dependent chain is
the honest FMA throughput baseline.

Timing is DIFFERENTIAL: each kernel is timed at K and 2K iterations and
the per-iteration cost is (t_2K - t_K) / K. A single axon-relay dispatch
carries a fixed ~10-20 ms round-trip (CLAUDE.md: per-dispatch timing is
garbage), which the first capture of this tool did NOT cancel — it
reported fma_dep at 0.088 Tflop/s and the synthetic bulb mix SLOWER
(57 ps/iter-lane) than the real render kernel it was meant to ceiling
(27 ps, measured inside large multi-frame dispatches). Differencing two
dispatches with identical I/O cancels the fixed cost exactly.

FLOPs per bulb substep (hand count of substep(), engines/sdf.py:242-280,
transcendentals counted as 1): dz_new 5 + max + rsqrt = 7; squares 6;
k3/k3s 2; k37 5; k2(rsqrt) 1; k1 11; k4 2; wx_new 12; wy_new 8;
wz_new 15; selects 4; m recompute 5; active cmp 1  => 79 ops.

Usage: python tools/vpu_peak.py [--iters 512] [--rows 256] [--grid 64]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

BULB_FLOPS_PER_ITER = 79  # see docstring hand count
# cheb substep (engines/sdf._new_w_cheb) hand count: dz_new 7; squares
# x2/y2/z2/y4 4; k3 1; k3s(max) 1; k37 5; k2(rsqrt) 1; t13 2; k1 3;
# k4 2; complex squarings a1/b1/a2/b2/re8/im8 13; s8 4; wx/wz 4; wy 8;
# selects 4; m recompute 5; active cmp 1  => 65 ops.
CHEB_FLOPS_PER_ITER = 65


def _bulb_mix_kernel(px_ref, py_ref, pz_ref, out_ref, *, iters: int,
                     unroll: int = 1):
    """K no-divergence bulb substeps (sdf_mandelbulb_while arithmetic)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    F32 = jnp.float32
    px = px_ref[...]
    py = py_ref[...]
    pz = pz_ref[...]
    bailout2 = F32(64.0)  # orbit seeds are tiny: never escapes
    tiny = F32(1e-4)

    def substep(carry):
        wx, wy, wz, dz, m = carry
        active = m <= bailout2
        m2 = m * m
        m4 = m2 * m2
        dz_new = F32(8.0) * ((m4 * lax.rsqrt(
            jnp.maximum(m, F32(1e-30)))) * dz) + F32(1.0)
        x, y, z = wx, wy, wz
        x2 = x * x
        x4 = x2 * x2
        y2 = y * y
        y4 = y2 * y2
        z2 = z * z
        z4 = z2 * z2
        k3 = x2 + z2
        k3s = jnp.maximum(k3, tiny)
        k37 = ((k3s * k3s) * (k3s * k3s)) * ((k3s * k3s) * k3s)
        k2 = lax.rsqrt(k37)
        k1 = ((x4 + y4) + z4) - F32(6.0) * (y2 * z2) \
            - F32(6.0) * (x2 * y2) + F32(2.0) * (z2 * x2)
        k4 = (x2 - y2) + z2
        wx_new = px + F32(64.0) * ((((x * y) * z) * (x2 - z2)) * k4) \
            * ((x4 - F32(6.0) * (x2 * z2)) + z4) * k1 * k2
        wy_new = py + (F32(-16.0) * (y2 * k3) * (k4 * k4) + k1 * k1)
        wz_new = pz + F32(-8.0) * (y * k4) \
            * ((((x4 * x4) - F32(28.0) * ((x4 * x2) * z2))
                + F32(70.0) * (x4 * z4))
               - F32(28.0) * ((x2 * z2) * z4) + (z4 * z4)) * k1 * k2
        wx = jnp.where(active, wx_new, wx)
        wy = jnp.where(active, wy_new, wy)
        wz = jnp.where(active, wz_new, wz)
        dz = jnp.where(active, dz_new, dz)
        m = jnp.where(active, (wx * wx + wy * wy) + wz * wz, m)
        return wx, wy, wz, dz, m

    m0 = (px * px + py * py) + pz * pz
    carry = (px, py, pz, jnp.ones_like(m0), m0)
    carry = _unrolled_fori(lax, substep, carry, iters, unroll)
    wx, wy, wz, dz, m = carry
    out_ref[...] = (wx + wy) + (wz + dz) + m


def _unrolled_fori(lax, substep, carry, iters: int, unroll: int):
    """iters total substeps as iters//unroll fori trips of `unroll`
    substeps each — the render kernel's DE_UNROLL loop structure, so the
    synthetic's per-iteration loop-control overhead matches the render
    path's instead of overstating the per-iteration cost (r5)."""
    assert iters % unroll == 0, (iters, unroll)

    def body(i, c):
        for _ in range(unroll):
            c = substep(c)
        return c
    return lax.fori_loop(0, iters // unroll, body, carry)


def _cheb_mix_kernel(px_ref, py_ref, pz_ref, out_ref, *, iters: int,
                     unroll: int = 1):
    """K no-divergence cheb substeps (sdf_mandelbulb_while_cheb
    arithmetic — the r4 default bulb iteration)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    F32 = jnp.float32
    px = px_ref[...]
    py = py_ref[...]
    pz = pz_ref[...]
    bailout2 = F32(64.0)
    tiny = F32(1e-4)

    def substep(carry):
        wx, wy, wz, dz, m = carry
        active = m <= bailout2
        m2 = m * m
        m4 = m2 * m2
        dz_new = F32(8.0) * ((m4 * lax.rsqrt(
            jnp.maximum(m, F32(1e-30)))) * dz) + F32(1.0)
        x, y, z = wx, wy, wz
        x2 = x * x
        y2 = y * y
        z2 = z * z
        y4 = y2 * y2
        k3 = x2 + z2
        k3s = jnp.maximum(k3, tiny)
        k37 = ((k3s * k3s) * (k3s * k3s)) * ((k3s * k3s) * k3s)
        k2 = lax.rsqrt(k37)
        t13 = k3 - F32(3.0) * y2
        k1 = t13 * t13 - F32(8.0) * y4
        k4 = (x2 - y2) + z2
        a1 = x2 - z2
        b1 = F32(2.0) * (x * z)
        a2 = a1 * a1 - b1 * b1
        b2 = F32(2.0) * (a1 * b1)
        re8 = a2 * a2 - b2 * b2
        im8 = F32(2.0) * (a2 * b2)
        s8 = ((F32(8.0) * y) * k4) * (k1 * k2)
        wx_new = px + s8 * im8
        wy_new = py + (F32(-16.0) * (y2 * k3) * (k4 * k4) + k1 * k1)
        wz_new = pz - s8 * re8
        wx = jnp.where(active, wx_new, wx)
        wy = jnp.where(active, wy_new, wy)
        wz = jnp.where(active, wz_new, wz)
        dz = jnp.where(active, dz_new, dz)
        m = jnp.where(active, (wx * wx + wy * wy) + wz * wz, m)
        return wx, wy, wz, dz, m

    m0 = (px * px + py * py) + pz * pz
    carry = (px, py, pz, jnp.ones_like(m0), m0)
    carry = _unrolled_fori(lax, substep, carry, iters, unroll)
    wx, wy, wz, dz, m = carry
    out_ref[...] = (wx + wy) + (wz + dz) + m


def _fma_dep_kernel(a_ref, out_ref, *, iters: int, unroll: int = 1):
    """Dependent a = a*b + c chain. Over a (rows,128) block this is
    rows/8 independent (8,128)-vreg chains, so the VPU pipelines it —
    at unroll >= 4 (loop control amortized) this IS the FMA throughput
    baseline. The r4 "fma_par8" 8-carry variant is deleted (module
    docstring: its 1 MB carry tuple spilled and it measured slower per
    flop than this chain)."""
    import jax.numpy as jnp
    from jax import lax
    a = a_ref[...]
    b = a * jnp.float32(0.999)
    c = a * jnp.float32(1e-6)

    carry = _unrolled_fori(lax, lambda x: x * b + c, a, iters, unroll)
    out_ref[...] = carry


def _time_differential(make_fn, args, iters, repeats=5):
    """Per-extra-iteration time: (t(2K) - t(K)) / K dispatches with
    identical I/O, cancelling the fixed relay/dispatch cost exactly.
    K and 2K measurements are INTERLEAVED (K,2K,K,2K,...) so slow relay
    drift lands on both alike — the first capture timed them in separate
    blocks while another TPU job ran and got t(2K) < t(K).
    Returns (dt_per_extra_K_seconds, t_single_dispatch_at_K)."""
    import jax
    fns = [jax.jit(make_fn(iters)), jax.jit(make_fn(2 * iters))]
    for f in fns:
        # scalar fetch syncs through the axon relay (block_until_ready
        # lies; CLAUDE.md axon methodology)
        float(np.asarray(f(*args)).ravel()[0])
    ts = [[], []]
    for _ in range(repeats):
        for which in (0, 1):
            t0 = time.perf_counter()
            out = fns[which](*args)
            float(np.asarray(out).ravel()[0])
            ts[which].append(time.perf_counter() - t0)
    t1, t2 = float(np.min(ts[0])), float(np.min(ts[1]))
    # a non-positive difference means the measurement was polluted
    # (e.g. a concurrent TPU job): report nan, never a fake Tflop/s
    return (t2 - t1) if t2 > t1 else float("nan"), t1


def run(iters: int, rows: int, grid: int, repeats: int = 5,
        unrolls: tuple = (1, 4, 8)):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    shape = (grid * rows, 128)
    lanes = float(np.prod(shape))
    rng = np.random.default_rng(0)
    # orbit seeds with |p| ~ 0.3: m stays far below bailout forever
    px = jnp.asarray(rng.uniform(0.1, 0.3, shape).astype(np.float32))
    py = jnp.asarray(rng.uniform(0.1, 0.3, shape).astype(np.float32))
    pz = jnp.asarray(rng.uniform(0.1, 0.3, shape).astype(np.float32))

    interpret = jax.default_backend() != "tpu"  # CPU smoke path

    def make(kernel, n_in):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0))] * n_in,
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            interpret=interpret,
        )

    results = {}

    # The FMA chain is ~40x cheaper per iteration than the bulb mixes;
    # at the shared default K its differential (~1-2 ms measured r4)
    # sits inside the axon relay's per-dispatch jitter (~±1 ms on a
    # ~26 ms dispatch) and min-of-N differencing returns noise (a 3-
    # repeat run measured "9.5 Tflop/s", above the 4-ALU VPU's ~7.7
    # f32-FMA bound — impossible). Scale its K so extra-K >> jitter.
    for name, kern, n_in, flops_per_iter, k_scale in (
            ("bulb_mix", _bulb_mix_kernel, 3, float(BULB_FLOPS_PER_ITER), 1),
            ("cheb_mix", _cheb_mix_kernel, 3, float(CHEB_FLOPS_PER_ITER), 1),
            ("fma_dep", _fma_dep_kernel, 1, 2.0, 32)):
        k_iters = iters * k_scale
        it_lanes = lanes * k_iters
        for unroll in unrolls:
            if k_iters % unroll:
                continue

            def make_fn(k, kern=kern, n_in=n_in, unroll=unroll):
                call = make(functools.partial(kern, iters=k,
                                              unroll=unroll), n_in)
                return lambda *a: jnp.sum(call(*a))
            args = (px, py, pz)[:n_in]
            dt, t_disp = _time_differential(make_fn, args, k_iters, repeats)
            results[f"{name}@u{unroll}"] = {
                "ps_per_iter_lane": dt / it_lanes * 1e12,
                "tflops": flops_per_iter * it_lanes / dt / 1e12,
                "seconds_extra_K": dt,
                "seconds_dispatch_K": t_disp,
            }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--unroll", type=str, default="1,4,8",
                    help="comma list of substeps per loop trip; compare "
                         "the render kernel against the row matching "
                         "DE_UNROLL (4)")
    args = ap.parse_args()
    unrolls = tuple(int(u) for u in args.unroll.split(","))

    import jax
    print(f"backend: {jax.default_backend()}")
    res = run(args.iters, args.rows, args.grid, args.repeats, unrolls)
    for name, r in res.items():
        print(f"| {name:12s} | {r['ps_per_iter_lane']:8.2f} ps/iter-lane "
              f"| {r['tflops']:7.3f} Tflop/s "
              f"| extra-K {r['seconds_extra_K'] * 1e3:8.2f} ms "
              f"| dispatch {r['seconds_dispatch_K'] * 1e3:8.2f} ms |")
    print(json.dumps({k: {kk: round(vv, 6) for kk, vv in v.items()}
                      for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
