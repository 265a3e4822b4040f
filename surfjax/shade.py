"""Shading models: Lambert and Blinn-Phong (SURVEY.md §2 component 9).

BASELINE.json:5/:7/:8 — Lambert + Blinn-Phong with per-material parameters.

Shading equation (shared definition with the golden renderer):

    rgb = ka * albedo * ambient * ao
        + sum_over_lights vis_l * light_color *
              ( kd * max(dot(n,l),0) * albedo
              + ks * pow_int(max(dot(n,h),0), shininess) * specular_color )

with h = normalize(l + v), v = -ray_dir. `shininess` is a static integer and
the power is evaluated by repeated squaring (core/math.pow_int) so golden and
device paths build the same multiplication tree.
"""

from __future__ import annotations

import jax.numpy as jnp

from surfjax.core.math import F32, pow_int, vdot, vnormalize


def shade_object(mat_row, shininess: int, ambient, ao, n, v, light_terms):
    """Shade hits of one object (one material).

    mat_row: (9,) [albedo3, ka, kd, ks, spec3] (dynamic).
    light_terms: list of (lx, ly, lz, light_color3, vis) per light, where
      (lx,ly,lz) is the unit direction toward the light and vis in [0,1].
    Returns (r, g, b) arrays.
    """
    alb = (mat_row[0], mat_row[1], mat_row[2])
    ka, kd, ks = mat_row[3], mat_row[4], mat_row[5]
    spc = (mat_row[6], mat_row[7], mat_row[8])

    r = ka * alb[0] * ambient[0] * ao
    g = ka * alb[1] * ambient[1] * ao
    b = ka * alb[2] * ambient[2] * ao

    for (l, lcol, vis) in light_terms:
        ndotl = jnp.maximum(vdot(n, l), F32(0.0))
        diff = kd * ndotl
        # guarded half-vector: l == -v (light exactly behind the view
        # ray) makes l+v zero and an unguarded normalize NaNs the pixel
        # even at ks == 0; max() is identity for every non-degenerate
        # pair, and the degenerate one gets ndoth = 0 -> spec = 0.
        # Same guard in renderer.py and golden.cpp (review r3).
        hx, hy, hz = l[0] + v[0], l[1] + v[1], l[2] + v[2]
        inv_h = F32(1.0) / jnp.sqrt(
            jnp.maximum(vdot((hx, hy, hz), (hx, hy, hz)), F32(1e-20)))
        h = (hx * inv_h, hy * inv_h, hz * inv_h)
        ndoth = jnp.maximum(vdot(n, h), F32(0.0))
        spec = ks * pow_int(ndoth, shininess)
        r = r + vis * lcol[0] * (diff * alb[0] + spec * spc[0])
        g = g + vis * lcol[1] * (diff * alb[1] + spec * spc[1])
        b = b + vis * lcol[2] * (diff * alb[2] + spec * spc[2])
    return r, g, b
