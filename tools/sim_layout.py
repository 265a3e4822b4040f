"""Simulate tile layouts / sorting / compaction on dumped step counts.

Input: the npz from `MARCH_STATS_DUMP=... python tools/march_stats.py`.
For each march stage it evaluates the eval-cost (in units of lane-evals)
of several scheduling strategies; 1.0x = perfect (sum of per-lane steps).

Strategies:
  tile AxB         pixels-per-tile rectangle, whole-tile early exit
  rowpatch AxB     each (1,128) lane-row is an AxB pixel patch; cost =
                   sum over rows of row-max (idealized per-row exit,
                   i.e. perfect row-level compaction)
  sortrows K       rows (AxB patches) sorted by true row max, grouped
                   into 64-row tiles (what one-shot sorted re-tiling
                   of K2/K1 phase 2 could achieve)
  rounds B         multi-round row compaction with per-round budget B
                   at 64-row tiles (wavefront-style)

Usage: python tools/sim_layout.py /tmp/steps1080.npz
"""

from __future__ import annotations

import sys

import numpy as np


def tile_cost(img, A, B):
    """Whole-tile early exit with AxB-pixel tiles."""
    H, W = img.shape
    Hp = ((H + A - 1) // A) * A
    Wp = ((W + B - 1) // B) * B
    a = np.zeros((Hp, Wp), img.dtype)
    a[:H, :W] = img
    t = a.reshape(Hp // A, A, Wp // B, B).transpose(0, 2, 1, 3)
    tmax = t.reshape(-1, A * B).max(axis=1)
    return float(tmax.sum()) * A * B


def rows_of_patches(img, A, B):
    """-> (n_rows, 128) array where each row is an AxB pixel patch."""
    assert A * B == 128
    H, W = img.shape
    Hp = ((H + A - 1) // A) * A
    Wp = ((W + B - 1) // B) * B
    a = np.zeros((Hp, Wp), img.dtype)
    a[:H, :W] = img
    r = a.reshape(Hp // A, A, Wp // B, B).transpose(0, 2, 1, 3)
    return r.reshape(-1, 128)


def sortrows_cost(rows, tile_rows=64):
    rmax = rows.max(axis=1)
    order = np.argsort(rmax)
    srt = rmax[order]
    n = len(srt)
    npad = ((n + tile_rows - 1) // tile_rows) * tile_rows
    srt = np.pad(srt, (0, npad - n))
    tmax = srt.reshape(-1, tile_rows).max(axis=1)
    return float(tmax.sum()) * tile_rows * 128


def rounds_cost(rows, budget, tile_rows=64):
    """Multi-round: each round marches active rows (compacted into dense
    64-row tiles) up to `budget` steps with whole-tile early exit."""
    remaining = rows.max(axis=1).astype(np.int64)  # per-row max steps left
    total = 0
    while (remaining > 0).any():
        act = remaining[remaining > 0]
        n = len(act)
        npad = ((n + tile_rows - 1) // tile_rows) * tile_rows
        a = np.pad(np.minimum(act, budget), (0, npad - n))
        tmax = a.reshape(-1, tile_rows).max(axis=1)
        total += tmax.sum() * tile_rows * 128
        remaining = np.maximum(remaining - budget, 0)
    return float(total)


def main():
    data = np.load(sys.argv[1])
    H, W = int(data["H"]), int(data["W"])
    for key in data.files:
        if key in ("H", "W", "H2", "W2"):
            continue
        img = data[key][:H, :W]
        lane = float(img.sum())
        if lane == 0:
            continue
        print(f"\n== {key}  (lane_sum {lane / 1e6:.1f}M) ==")
        for A, B in [(64, 128), (32, 256), (16, 512), (8, 1024),
                     (91, 90), (8, 128), (16, 64), (32, 32)]:
            c = tile_cost(img, A, B)
            print(f"  tile {A:3d}x{B:<4d}              {c / lane:6.2f}x")
        for A, B in [(1, 128), (2, 64), (4, 32), (8, 16), (16, 8)]:
            rows = rows_of_patches(img, A, B)
            rc = float(rows.max(axis=1).sum()) * 128
            sc = sortrows_cost(rows)
            print(f"  rowpatch {A:2d}x{B:<3d}  ideal-row {rc / lane:6.2f}x"
                  f"   sorted64 {sc / lane:6.2f}x")
        rows = rows_of_patches(img, 8, 16)
        for budget in [8, 16, 32]:
            c = rounds_cost(rows, budget)
            print(f"  rounds(8x16 rows, B={budget:2d})     {c / lane:6.2f}x")


if __name__ == "__main__":
    main()
