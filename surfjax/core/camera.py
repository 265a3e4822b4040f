"""Camera models: pinhole intrinsics + rigid pose + animated paths.

SURVEY.md §2 component 2 (BASELINE.json:5 "camera intrinsics", :7 "pinhole
camera", :11 "animated camera path").

Convention:
  * camera space: +x right, +y down, +z forward (image plane at z=1);
  * pixel (i=row, j=col) maps through intrinsics (fx, fy, cx, cy) as
        xc = (j + 0.5 - cx) / fx
        yc = (i + 0.5 - cy) / fy
        dir_cam = (xc, yc, 1)
  * pose: world_from_cam rotation R (3x3, row-major tuple-of-tuples of
    floats) and translation t (camera origin in world space);
  * rays: origin = t, dir = normalize(R @ dir_cam).

The rotation is applied with fixed association (see core/math.py) so the
golden renderer can match bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp

from surfjax.core.math import F32, vnormalize


Mat3 = Tuple[Tuple[float, float, float],
             Tuple[float, float, float],
             Tuple[float, float, float]]

IDENTITY3: Mat3 = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float

    @staticmethod
    def from_fov(width: int, height: int, fov_y_deg: float) -> "Intrinsics":
        f = 0.5 * height / math.tan(math.radians(fov_y_deg) * 0.5)
        return Intrinsics(width, height, fx=f, fy=f,
                          cx=0.5 * width, cy=0.5 * height)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> Tuple[Mat3, Tuple[float, float, float]]:
    """world_from_cam pose for a camera at `eye` looking at `target`.

    Camera convention is +z forward, +y down, +x right (right-handed with
    image-space y down), so the world 'up' maps to camera -y.
    Host-side (python floats) — not traced.
    """
    fz = [target[i] - eye[i] for i in range(3)]
    n = math.sqrt(fz[0] * fz[0] + fz[1] * fz[1] + fz[2] * fz[2])
    if n < 1e-12:
        raise ValueError("look_at: eye and target coincide")
    fz = [v / n for v in fz]
    # right = normalize(cross(fz, up_world))  (y-down convention)
    rx = [fz[1] * up[2] - fz[2] * up[1],
          fz[2] * up[0] - fz[0] * up[2],
          fz[0] * up[1] - fz[1] * up[0]]
    n = math.sqrt(rx[0] * rx[0] + rx[1] * rx[1] + rx[2] * rx[2])
    if n < 1e-8:
        # view direction parallel to up: fall back to a perpendicular up
        up = (0.0, 0.0, 1.0) if abs(fz[2]) < 0.9 else (1.0, 0.0, 0.0)
        rx = [fz[1] * up[2] - fz[2] * up[1],
              fz[2] * up[0] - fz[0] * up[2],
              fz[0] * up[1] - fz[1] * up[0]]
        n = math.sqrt(rx[0] * rx[0] + rx[1] * rx[1] + rx[2] * rx[2])
    rx = [v / n for v in rx]
    # down = cross(fz, rx)
    dy = [fz[1] * rx[2] - fz[2] * rx[1],
          fz[2] * rx[0] - fz[0] * rx[2],
          fz[0] * rx[1] - fz[1] * rx[0]]
    # columns of world_from_cam R are the camera axes in world space
    R: Mat3 = ((rx[0], dy[0], fz[0]),
               (rx[1], dy[1], fz[1]),
               (rx[2], dy[2], fz[2]))
    return R, (float(eye[0]), float(eye[1]), float(eye[2]))


def camera_ray_dirs(intr: Intrinsics, R: Mat3, rows, cols):
    """Per-pixel world-space ray directions for pixel centers.

    rows/cols: arrays (any shape) of pixel row/col indices (float32 or int).
    Returns (dx, dy, dz) normalized world-space directions.
    """
    i = jnp.asarray(rows, jnp.float32)
    j = jnp.asarray(cols, jnp.float32)
    xc = (j + F32(0.5) - F32(intr.cx)) / F32(intr.fx)
    yc = (i + F32(0.5) - F32(intr.cy)) / F32(intr.fy)
    # dir_world = R @ (xc, yc, 1); fixed association (a + b) + c
    r = R
    dx = (F32(r[0][0]) * xc + F32(r[0][1]) * yc) + F32(r[0][2])
    dy = (F32(r[1][0]) * xc + F32(r[1][1]) * yc) + F32(r[1][2])
    dz = (F32(r[2][0]) * xc + F32(r[2][1]) * yc) + F32(r[2][2])
    return vnormalize((dx, dy, dz))


def camera_ray_dirs_dyn(intr: Intrinsics, R_flat, rows, cols):
    """Like camera_ray_dirs but with a *traced* rotation.

    R_flat: (9,) float32 array, row-major world_from_cam rotation. Used by the
    animated-path / differentiable-pose code where the pose is a JAX value.
    """
    i = jnp.asarray(rows, jnp.float32)
    j = jnp.asarray(cols, jnp.float32)
    xc = (j + F32(0.5) - F32(intr.cx)) / F32(intr.fx)
    yc = (i + F32(0.5) - F32(intr.cy)) / F32(intr.fy)
    dx = (R_flat[0] * xc + R_flat[1] * yc) + R_flat[2]
    dy = (R_flat[3] * xc + R_flat[4] * yc) + R_flat[5]
    dz = (R_flat[6] * xc + R_flat[7] * yc) + R_flat[8]
    return vnormalize((dx, dy, dz))


def flat_camera_rays(intr: Intrinsics, R_flat, cam_pos, pad_to: int = 1):
    """Canonical flat (row-major) per-pixel rays for a traced pose —
    THE single definition of the pixel-index grid, shared by the fit
    loop and the sharded renderers (review r3: three hand-kept copies).
    pad_to > 1 edge-pads the ray count up to a multiple (device
    sharding). -> (o tuple, d tuple, n_real_pixels)."""
    n = intr.width * intr.height
    n_pad = ((n + pad_to - 1) // pad_to) * pad_to
    rows = jnp.repeat(jnp.arange(intr.height, dtype=jnp.float32),
                      intr.width)
    cols = jnp.tile(jnp.arange(intr.width, dtype=jnp.float32),
                    intr.height)
    rows = jnp.pad(rows, (0, n_pad - n), mode="edge")
    cols = jnp.pad(cols, (0, n_pad - n), mode="edge")
    d = camera_ray_dirs_dyn(intr, R_flat, rows, cols)
    o = (jnp.broadcast_to(cam_pos[0], rows.shape),
         jnp.broadcast_to(cam_pos[1], rows.shape),
         jnp.broadcast_to(cam_pos[2], rows.shape))
    return o, d, n


def rotation_y(theta):
    """Traced rotation about world Y axis, returned as (9,) row-major."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([c, z, s, z, o, z, -s, z, c])


def orbit_pose(radius, height, theta):
    """Camera orbiting the origin at given radius/height, looking at origin.

    Traced version of look_at for animated paths: returns (R_flat(9,), t(3,)).
    """
    eye = jnp.stack([radius * jnp.sin(theta), height, -radius * jnp.cos(theta)])
    fz = -eye
    inv = F32(1.0) / jnp.sqrt((fz[0] * fz[0] + fz[1] * fz[1]) + fz[2] * fz[2])
    fz = fz * inv
    upw = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    rx = jnp.stack([fz[1] * upw[2] - fz[2] * upw[1],
                    fz[2] * upw[0] - fz[0] * upw[2],
                    fz[0] * upw[1] - fz[1] * upw[0]])
    inv = F32(1.0) / jnp.sqrt((rx[0] * rx[0] + rx[1] * rx[1]) + rx[2] * rx[2])
    rx = rx * inv
    dy = jnp.stack([fz[1] * rx[2] - fz[2] * rx[1],
                    fz[2] * rx[0] - fz[0] * rx[2],
                    fz[0] * rx[1] - fz[1] * rx[0]])
    R_flat = jnp.stack([rx[0], dy[0], fz[0],
                        rx[1], dy[1], fz[1],
                        rx[2], dy[2], fz[2]])
    return R_flat, eye


def pose_interp(p0, p1, t):
    """Linear pose interpolation (translation lerp; rotation lerp+renorm).

    p = (R_flat(9,), trans(3,)). Adequate for smooth camera paths; a full
    slerp is not needed for the SPEC workloads.
    """
    R0, t0 = p0
    R1, t1 = p1
    R = R0 + (R1 - R0) * t
    # re-orthonormalize columns via Gram-Schmidt on the 3 column vectors
    c0 = jnp.stack([R[0], R[3], R[6]])
    c1 = jnp.stack([R[1], R[4], R[7]])
    c0 = c0 / jnp.sqrt(jnp.sum(c0 * c0))
    c1 = c1 - c0 * jnp.sum(c0 * c1)
    c1 = c1 / jnp.sqrt(jnp.sum(c1 * c1))
    c2 = jnp.cross(c0, c1)
    Rn = jnp.stack([c0[0], c1[0], c2[0],
                    c0[1], c1[1], c2[1],
                    c0[2], c1[2], c2[2]])
    return Rn, t0 + (t1 - t0) * t
