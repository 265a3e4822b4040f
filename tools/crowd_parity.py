#!/usr/bin/env python
"""On-device crowd-vs-unrolled parity check (r5).

The crowd path's bitwise-equality contract (geometry identical,
rgb <= 2 ULP — core/types.py vector_objects docstring) is CI-tested in
interpret mode only; Mosaic is the backend that matters. This tool
renders one scene containing EVERY crowd member class — single
spheres/boxes on both engines and two-leaf SDF pairs of all six binary
CSG ops — with vector_objects off and on, on whatever backend is live,
and checks the contract for real. Exit 1 on any violation.

    python tools/crowd_parity.py          # axon TPU when up
    env PYTHONPATH= JAX_PLATFORMS=cpu python tools/crowd_parity.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def build_scene():
    from surfjax import (
        Box, Camera, Material, Plane, PointLight, RenderSettings, Scene,
        Sphere, intersect, smooth_intersect, smooth_subtract,
        smooth_union, subtract, union,
    )
    rng = np.random.default_rng(23)
    scene = Scene()
    mats = [Material.lambert(albedo=(0.7, 0.4, 0.3)),
            Material.blinn_phong(albedo=(0.3, 0.6, 0.8), shininess=16)]

    def rnd_center(y_lo=-0.5, y_hi=1.2):
        return (float(rng.uniform(-1.8, 1.8)),
                float(rng.uniform(y_lo, y_hi)),
                float(rng.uniform(2.2, 4.4)))

    # two-leaf SDF pairs, all six ops x {sphere, box} second-leaf kinds
    for k in range(12):
        c = rnd_center()
        a = Sphere(center=c, radius=float(rng.uniform(0.16, 0.3)))
        if k % 2 == 0:
            b = Sphere(center=(c[0] + 0.22, c[1], c[2]),
                       radius=float(rng.uniform(0.12, 0.24)))
        else:
            b = Box(center=(c[0] + 0.18, c[1] + 0.08, c[2]),
                    half_extents=tuple(
                        float(x) for x in rng.uniform(0.08, 0.18, 3)))
        ov = Sphere(center=(c[0] + 0.1, c[1] + 0.05, c[2]),
                    radius=0.2)  # overlapping operand for int/sub
        kk = float(rng.uniform(0.08, 0.22))
        node = [lambda: union(a, b),
                lambda: intersect(a, ov),
                lambda: subtract(a, ov),
                lambda: smooth_union(a, b, kk),
                lambda: smooth_intersect(a, ov, kk),
                lambda: smooth_subtract(a, ov, kk)][k % 6]()
        scene.add(node, mats[k % 2], engine="sdf")
    # singles on both engines
    for k in range(4):
        c = rnd_center(1.0, 1.6)
        obj = (Sphere(center=c, radius=0.16) if k % 2 == 0 else
               Box(center=c, half_extents=(0.12, 0.1, 0.14)))
        scene.add(obj, mats[k % 2],
                  **({"engine": "sdf"} if k < 2 else {}))
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0)))
    cam = Camera.pinhole(256, 192, fov_y_deg=52.0,
                         position=(0.0, 0.7, -0.6),
                         target=(0.0, 0.0, 3.0))
    settings = RenderSettings(shadows=True, soft_shadows=True, ao=True,
                              max_steps=96, backend="pallas",
                              tile_rows=8)
    return scene, cam, settings


def main() -> int:
    import jax
    from surfjax import render
    from surfjax.io.image import ulp_diff_f32
    from surfjax.kernels.render_tile import split_crowd

    scene, cam, settings = build_scene()
    static, _ = scene.freeze()
    crowd, _, rest_sdf = split_crowd(
        static, settings.with_(vector_objects=True))
    assert crowd is not None and len(crowd.pair_specs) >= 6, \
        "scene must exercise every pair section class"
    print(f"backend: {jax.default_backend()}  members: "
          f"{len(crowd.members)}  pair sections: {len(crowd.pair_specs)}")

    fb_u = render(scene, cam, settings)
    fb_c = render(scene, cam, settings.with_(vector_objects=True))

    res = {"backend": jax.default_backend(),
           "members": len(crowd.members),
           "pair_sections": len(crowd.pair_specs),
           "hit_frac": round(float(np.asarray(fb_c.hit).mean()), 4)}
    ok = True
    for name in ("depth", "hit", "obj_id", "normal"):
        a = np.asarray(getattr(fb_u, name))
        b = np.asarray(getattr(fb_c, name))
        eq = bool((a == b).all())
        res[f"{name}_bitwise"] = eq
        ok &= eq
    u = ulp_diff_f32(np.asarray(fb_u.rgb), np.asarray(fb_c.rgb))
    res["rgb_max_ulp"] = int(u.max())
    ok &= u.max() <= 2
    res["ok"] = bool(ok)
    print(json.dumps(res))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
