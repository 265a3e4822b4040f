"""Differentiable layer (SURVEY.md §1 L4, §2 component 19).

The hard part — gradients *through the raymarcher* — lives in
surfjax/engines/sdf.py as the implicit-function-theorem custom_vjp on
`sphere_trace` (no 256-step unrolling). This package adds the inverse-
rendering fit loops (BASELINE.json:11: inverse pose / SDF fitting).
"""

from surfjax.diff.fit import fit_pose, fit_sdf, rodrigues

__all__ = ["fit_pose", "fit_sdf", "rodrigues"]
