"""CLI (SURVEY.md §1 L7 / §2 component 23).

    python -m surfjax render --config configs/c1_sphere.yaml --out frame.png
    python -m surfjax render --config ... --golden        # NumPy oracle path
    python -m surfjax animate --config configs/c5_anim.yaml --out-dir frames/
    python -m surfjax bench  --config configs/c3_sdf.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load(args):
    from surfjax.config import load_config
    return load_config(args.config)


def cmd_render(args):
    scene, camera, settings, _extras = _load(args)
    if args.backend:
        settings = settings.with_(backend=args.backend)
    from surfjax.io.image import save_png, save_golden
    if args.golden:
        from surfjax.golden import renderer as golden
        t0 = time.time()
        fb = golden.render(scene, camera, settings)
        dt = time.time() - t0
        rgb, depth, normal = fb["rgb"], fb["depth"], fb["normal"]
    else:
        import jax
        from surfjax import render
        t0 = time.time()
        fb = jax.block_until_ready(render(scene, camera, settings))
        dt = time.time() - t0
        rgb = np.asarray(fb.rgb)
        depth = np.asarray(fb.depth)
        normal = np.asarray(fb.normal)
    print(f"rendered {rgb.shape[1]}x{rgb.shape[0]} in {dt:.3f}s "
          f"({'golden' if args.golden else settings.backend})")
    save_png(args.out, rgb)
    if args.gbuffer:
        base, _ = os.path.splitext(args.out)
        save_golden(base + "_gbuffer.npz",
                    {"rgb": rgb, "depth": depth, "normal": normal})
        print(f"wrote {base}_gbuffer.npz")
    print(f"wrote {args.out}")


def cmd_animate(args):
    import jax
    import jax.numpy as jnp
    from surfjax import render_sequence
    from surfjax.core.camera import orbit_pose
    from surfjax.io.image import save_png

    scene, camera, settings, extras = _load(args)
    anim = extras.get("animation") or {
        "type": "orbit", "frames": 16, "radius": 4.0, "height": -1.0}
    n = int(args.frames or anim.get("frames", 16))
    thetas = jnp.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    Rs, ts = jax.vmap(lambda th: orbit_pose(
        jnp.float32(anim.get("radius", 4.0)),
        jnp.float32(anim.get("height", -1.0)), th))(thetas)
    center = np.asarray(anim.get("center", (0, 0, 0)), np.float32)
    ts = ts + jnp.asarray(center)
    t0 = time.time()
    frames = jax.block_until_ready(
        render_sequence(scene, camera, (Rs, ts), settings))
    dt = time.time() - t0
    print(f"rendered {n} frames on-device in {dt:.3f}s "
          f"({n / dt:.2f} frames/s)")
    os.makedirs(args.out_dir, exist_ok=True)
    rgb = np.asarray(frames.rgb)
    for i in range(n):
        save_png(os.path.join(args.out_dir, f"frame_{i:04d}.png"), rgb[i])
    print(f"wrote {n} PNGs to {args.out_dir}")


def cmd_bench(args):
    from bench import run_bench
    result = run_bench(config=args.config, repeats=args.repeats)
    print(json.dumps(result))


def main(argv=None):
    p = argparse.ArgumentParser(prog="surfjax")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render one frame from a config")
    pr.add_argument("--config", required=True)
    pr.add_argument("--out", default="frame.png")
    pr.add_argument("--golden", action="store_true",
                    help="use the NumPy golden oracle")
    pr.add_argument("--backend", choices=("jnp", "pallas"), default=None)
    pr.add_argument("--gbuffer", action="store_true",
                    help="also dump depth/normal G-buffer npz")
    pr.set_defaults(fn=cmd_render)

    pa = sub.add_parser("animate", help="render an animated camera path")
    pa.add_argument("--config", required=True)
    pa.add_argument("--out-dir", default="frames")
    pa.add_argument("--frames", type=int, default=None)
    pa.set_defaults(fn=cmd_animate)

    pb = sub.add_parser("bench", help="run the benchmark harness")
    pb.add_argument("--config", default=None)
    pb.add_argument("--repeats", type=int, default=5)
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
