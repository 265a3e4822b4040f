"""Numeric sanitizers (SURVEY.md §5.2).

Rendering has no threads of its own; the relevant 'race detector' is
numeric: NaN/Inf taps via jax.checkify (div-by-zero, NaN, OOB index) for
test/debug runs, plus a framebuffer validator for production sanity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn, errors=None):
    """Wrap a jittable render fn with checkify error taps.

    Usage:
        f = checked(lambda p: render_rays(...)); err, out = jax.jit(f)(p)
        err.throw()
    """
    errors = errors or (checkify.float_checks | checkify.index_checks)
    return checkify.checkify(fn, errors=errors)


def validate_framebuffers(fb) -> dict:
    """Host-side sanity report for a FrameBuffers pytree."""
    import numpy as np
    rgb = np.asarray(fb.rgb)
    depth = np.asarray(fb.depth)
    report = {
        "rgb_nan": int(np.isnan(rgb).sum()),
        "rgb_inf": int(np.isinf(rgb).sum()),
        "rgb_negative": int((rgb < 0).sum()),
        "depth_nan": int(np.isnan(depth).sum()),
        "hit_frac": float(np.asarray(fb.hit).mean()),
    }
    report["ok"] = (report["rgb_nan"] == 0 and report["rgb_inf"] == 0
                    and report["depth_nan"] == 0)
    return report
