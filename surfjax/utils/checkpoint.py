"""Checkpoint / resume (SURVEY.md §5.4).

Two uses:
  (a) long animation renders — per-chunk framebuffer flush + a manifest
      JSON; resume skips complete chunks (frame-level idempotency, which is
      also the failure-recovery story §5.3: re-dispatch failed chunks);
  (b) inverse-rendering fits — params/opt-state pytree snapshots (npz).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np


class SequenceCheckpointer:
    """Chunked animation renderer with resume + retry (§5.3/§5.4)."""

    def __init__(self, out_dir: str, chunk_size: int = 16):
        self.out_dir = out_dir
        self.chunk_size = chunk_size
        self.manifest_path = os.path.join(out_dir, "manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self.manifest = {"chunks": {}, "chunk_size": chunk_size}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                loaded = json.load(fh)
            if loaded.get("chunk_size") == chunk_size:
                self.manifest = loaded
            # else: chunk size changed — start a fresh manifest so stale
            # chunks with a different stride cannot corrupt the sequence

    def _save_manifest(self):
        with open(self.manifest_path, "w") as fh:
            json.dump(self.manifest, fh)

    def render_all(self, n_frames: int,
                   render_chunk: Callable[[int, int], np.ndarray],
                   max_retries: int = 2,
                   fault_hook: Optional[Callable[[int], None]] = None
                   ) -> List[str]:
        """render_chunk(start, count) -> (count, H, W, 3) rgb array.

        Completed chunks are skipped on resume; failed chunks are retried
        (frame-level idempotency — the §5.3 recovery model). `fault_hook`
        is the fault-injection test hook (raises inside a chosen chunk).
        """
        paths = []
        for start in range(0, n_frames, self.chunk_size):
            count = min(self.chunk_size, n_frames - start)
            key = f"{start}:{count}"
            path = os.path.join(self.out_dir, f"chunk_{start:06d}.npz")
            if self.manifest["chunks"].get(key) == "done" \
                    and os.path.exists(path):
                paths.append(path)
                continue
            err = None
            for attempt in range(max_retries + 1):
                try:
                    if fault_hook is not None:
                        fault_hook(start)
                    rgb = np.asarray(render_chunk(start, count))
                    np.savez(path, rgb=rgb, start=start, count=count)
                    # a rerun with a different n_frames can re-cover this
                    # start with a different count: the chunk FILE is
                    # overwritten above, so any other manifest key at the
                    # same start now points at wrong data — prune it
                    # (otherwise load_all trips on the phantom overlap)
                    for other in list(self.manifest["chunks"]):
                        if other != key and \
                                int(other.split(":")[0]) == start:
                            del self.manifest["chunks"][other]
                    self.manifest["chunks"][key] = "done"
                    self._save_manifest()
                    paths.append(path)
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 — retry then surface
                    err = e
                    fault_hook = None  # injected faults fire once
            if err is not None:
                raise err
        return paths

    def load_all(self, n_frames: Optional[int] = None) -> np.ndarray:
        """Concatenate chunks, validating contiguous coverage of
        [0, n_frames) so stale chunks from a previous longer run in the
        same out_dir cannot silently leak into the result. n_frames
        defaults to the contiguous prefix length."""
        keys = sorted(self.manifest["chunks"],
                      key=lambda k: int(k.split(":")[0]))
        chunks = []
        expect = 0
        for key in keys:
            start, count = (int(v) for v in key.split(":"))
            # stale chunks past the requested range are fine (a previous
            # longer run) — stop BEFORE the gap check so they can't trip
            if n_frames is not None and start >= n_frames:
                break
            if start != expect:
                if n_frames is None and chunks:
                    # no explicit range: return the contiguous prefix (a
                    # stale chunk beyond a gap is a leftover, not an error)
                    break
                # an empty prefix (no chunk at frame 0) is a real error
                # either way — keep the diagnostic message
                raise ValueError(
                    f"checkpoint gap: expected chunk at frame {expect}, "
                    f"found {start} (out_dir {self.out_dir})")
            with np.load(os.path.join(self.out_dir,
                                      f"chunk_{start:06d}.npz")) as z:
                chunks.append(z["rgb"])
            expect = start + count
        if n_frames is not None and expect < n_frames:
            raise ValueError(
                f"checkpoint incomplete: chunks cover [0, {expect}) of "
                f"requested {n_frames} frames")
        if not chunks:
            raise ValueError(f"no checkpoint chunks in {self.out_dir}")
        out = np.concatenate(chunks, axis=0)
        return out[:n_frames] if n_frames is not None else out


def save_fit_state(path: str, step: int, params, opt_state=None) -> None:
    """Snapshot a fit's params (+ optimizer state) — §5.4(b)."""
    import jax
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {"__step__": np.asarray(step)}
    for i, leaf in enumerate(jax.tree.leaves(params)):
        flat[f"p{i}"] = np.asarray(leaf)
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree.leaves(opt_state)):
            flat[f"o{i}"] = np.asarray(leaf)
    np.savez(path, **flat)


def load_fit_state(path: str, params_tree, opt_state_tree=None):
    """Restore (step, params[, opt_state]) saved by save_fit_state."""
    import jax
    with np.load(path, allow_pickle=False) as z:
        step = int(z["__step__"])
        p_leaves = [z[f"p{i}"] for i in
                    range(len(jax.tree.leaves(params_tree)))]
        params = jax.tree.unflatten(jax.tree.structure(params_tree),
                                    p_leaves)
        if opt_state_tree is None:
            return step, params
        o_leaves = [z[f"o{i}"] for i in
                    range(len(jax.tree.leaves(opt_state_tree)))]
        opt = jax.tree.unflatten(jax.tree.structure(opt_state_tree),
                                 o_leaves)
        return step, params, opt
