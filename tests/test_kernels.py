"""Pallas kernel vs jnp-twin parity (SURVEY.md §4.3).

On the CPU test backend the kernels run in interpret mode, which executes
the same jnp ops as the twin — agreement here localizes any TPU-side
difference to Mosaic lowering rather than the algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np

from surfjax.core.camera import camera_ray_dirs_dyn
from surfjax.kernels.render_tile import (
    render_rays_pallas, render_tile_kernel, scene_march_twin, _pad_rays,
)
from surfjax.pipeline.frame import render_rays

from tests.scenes import config2_csg, config3_sdf


def _rays(cam):
    intr = cam.intrinsics
    rows = np.repeat(np.arange(intr.height, dtype=np.float32), intr.width)
    cols = np.tile(np.arange(intr.width, dtype=np.float32), intr.height)
    R = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))
    d = camera_ray_dirs_dyn(intr, R, jnp.asarray(rows), jnp.asarray(cols))
    pos = np.asarray(cam.position, np.float32)
    o = tuple(jnp.full(rows.shape, pos[i], jnp.float32) for i in range(3))
    return o, d


def test_kernel_matches_twin_config3():
    scene, cam, settings = config3_sdf(size=64)
    settings = settings.with_(tile_rows=8, max_steps=128)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _rays(cam)

    (ox, oy, oz, dx, dy, dz), n = _pad_rays(
        (o[0], o[1], o[2], d[0], d[1], d[2]), settings.tile_rows)
    t_k, obj_k, n_k, ao_k, hit_k, _ = render_tile_kernel(
        static, settings, 0, params["leaf_params"], params["node_params"],
        (ox, oy, oz), (dx, dy, dz))
    t_t, obj_t, n_t, ao_t, hit_t = scene_march_twin(
        static, settings, params["leaf_params"], params["node_params"],
        (ox, oy, oz), (dx, dy, dz))

    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_t))
    np.testing.assert_array_equal(np.asarray(obj_k), np.asarray(obj_t))
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_t), atol=1e-5)
    # per-tile vs whole-batch early exit converges t to slightly different
    # bits (<=1e-5); AO/normals amplify that — tolerance accordingly
    # isolated lanes at max(0,.) AO-tap boundaries flip with FMA/fusion
    np.testing.assert_allclose(np.asarray(ao_k), np.asarray(ao_t), atol=1e-2)
    # FD normals divide the t shift by normal_eps on a high-curvature
    # fractal: isolated eps-band lanes land at ~8e-3 (measured 1 lane /
    # 4096 at over_relax=1.4, r5) — budget those instead of loosening
    # the whole-frame tolerance (a systematic error hits every lane)
    for a, b in zip(n_k, n_t):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 5e-2, d.max()
        assert (d > 1e-3).sum() <= 8, (d > 1e-3).sum()


def test_pallas_backend_matches_jnp_backend_config2():
    """Analytic scene: identical semantics, tight agreement end-to-end."""
    scene, cam, settings = config2_csg(size=64)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _rays(cam)
    fb_j = render_rays(static, settings, params, o, d)
    fb_p = render_rays_pallas(static, settings.with_(tile_rows=8), params,
                              o, d)
    np.testing.assert_array_equal(np.asarray(fb_j.hit), np.asarray(fb_p.hit))
    np.testing.assert_array_equal(np.asarray(fb_j.obj_id),
                                  np.asarray(fb_p.obj_id))
    np.testing.assert_allclose(np.asarray(fb_j.rgb), np.asarray(fb_p.rgb),
                               atol=2e-5)


def test_pallas_backend_config3_tolerance():
    """SDF scene: scene-min march vs per-object march; hits must agree and
    non-chaotic pixels must be tight (Mandelbulb carve-out)."""
    scene, cam, settings = config3_sdf(size=64)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _rays(cam)
    fb_j = render_rays(static, settings, params, o, d)
    fb_p = render_rays_pallas(static,
                              settings.with_(tile_rows=8, over_relax=1.0),
                              params, o, d)
    assert (np.asarray(fb_j.hit) == np.asarray(fb_p.hit)).mean() > 0.995
    d_rgb = np.abs(np.asarray(fb_j.rgb) - np.asarray(fb_p.rgb))
    assert np.quantile(d_rgb, 0.99) < 5e-2

def test_cone_prime_conservative():
    """Opt-in cone-march priming: the 1/4-res pass must never tunnel —
    hit masks match the unprimed render exactly; hit positions may move
    within the eps tolerance band (fractal pixels decorrelate there)."""
    from tests.scenes import config3_sdf
    from surfjax import render
    scene, cam, settings = config3_sdf(size=96)
    st = settings.with_(backend="pallas", tile_rows=8,
                        prime=True, prime_min=64)
    fb_p = render(scene, cam, st)
    fb_u = render(scene, cam, st.with_(prime=False))
    hp = np.asarray(fb_p.hit)
    np.testing.assert_array_equal(hp, np.asarray(fb_u.hit))
    assert 0.2 < hp.mean() < 1.0
    d = np.abs(np.asarray(fb_p.rgb) - np.asarray(fb_u.rgb))
    assert d.mean() < 5e-3
    # the test-size 4x4 block cone is ~10x wider than at 1080p, so only
    # the bulk is asserted tight; outliers are the documented eps class
    assert np.quantile(d, 0.99) < 0.1


def test_capped_residual_bitwise_equal():
    """march_cap/shadow_march_cap + residual pass == uncapped, bitwise
    (kernels/render_tile.py::_block_residual). Caps chosen so the
    residual fast path actually engages (cap 24/12) AND so the
    over-capacity fallback branch is exercised (cap 2: nearly every
    block is cut off, count > capacity -> full-frame fallback)."""
    scene, cam, settings = config3_sdf(size=64)
    settings = settings.with_(backend="pallas", tile_rows=8,
                              soft_shadows=True, ao=True)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _rays(cam)
    fb0 = render_rays_pallas(static, settings, params, o, d)
    for mc, sc in ((24, 12), (2, 2)):
        fb1 = render_rays_pallas(
            static, settings.with_(march_cap=mc, shadow_march_cap=sc),
            params, o, d)
        np.testing.assert_array_equal(np.asarray(fb0.rgb),
                                      np.asarray(fb1.rgb))
        np.testing.assert_array_equal(np.asarray(fb0.depth),
                                      np.asarray(fb1.depth))
        np.testing.assert_array_equal(np.asarray(fb0.hit),
                                      np.asarray(fb1.hit))


def test_many_objects_scene_scale():
    """Scene-scale guard: ~32 objects through the pallas path (the
    _read_params SMEM unpacking and per-object march unrolling scale
    linearly with object count — this pins compile+run viability and
    jnp parity at that size)."""
    import itertools
    from surfjax.api import Camera, Material, Plane, Scene, Sphere
    from surfjax.core.types import RenderSettings

    scene = Scene()
    rng = np.random.RandomState(7)
    for i, (x, y) in enumerate(itertools.product(range(6), range(5))):
        c = (float(x - 2.5), float(y - 2.0), 4.0 + float(rng.rand()))
        scene.add(Sphere(center=c, radius=0.3),
                  Material.lambert((0.2 + 0.02 * i, 0.5, 0.8)),
                  engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-2.5),
              Material.lambert((0.5, 0.5, 0.5)))
    from surfjax.api import PointLight
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0),
                               color=(1.0, 1.0, 1.0)))
    cam = Camera.pinhole(64, 64, 45.0, position=(0.0, 0.0, -2.0),
                         target=(0.0, 0.0, 4.0))
    settings = RenderSettings(shadows=True, max_steps=96)
    static, params = scene.freeze()
    assert len(static.ir.objects) == 31
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _rays(cam)
    fb_j = render_rays(static, settings, params, o, d)
    fb_p = render_rays_pallas(static, settings.with_(tile_rows=8),
                              params, o, d)
    hit = np.asarray(fb_j.hit)
    assert hit.mean() > 0.3  # spheres + floor actually cover the frame
    np.testing.assert_array_equal(hit, np.asarray(fb_p.hit))
    np.testing.assert_array_equal(np.asarray(fb_j.obj_id),
                                  np.asarray(fb_p.obj_id))
    # jnp pipeline marches the scene-min; pallas marches per object with
    # progressive clipping — hits land at different spots inside the eps
    # band, so shading agrees to ~1e-3, not bitwise (same class as the
    # config3 tolerance test)
    np.testing.assert_allclose(np.asarray(fb_j.rgb),
                               np.asarray(fb_p.rgb), atol=1e-2)


def test_sequence_fused_matches_per_frame():
    """The F-frame fused sequence kernel (one pallas call, F x tiles
    grid, SMEM camera rows) vs per-frame rendering: hit masks identical,
    shading within the vmap fusion-order class."""
    import dataclasses
    from surfjax.core.camera import Intrinsics
    from surfjax.pipeline.frame import render_frame, render_sequence
    from tests.scenes import config3_sdf

    scene, cam, settings = config3_sdf(size=64)
    cam = dataclasses.replace(cam,
                              intrinsics=Intrinsics.from_fov(80, 48, 45.0))
    st = settings.with_(backend="pallas", tile_rows=8, soft_shadows=True,
                        ao=True, ao_samples=3)
    R = np.asarray(cam.rotation, np.float32).reshape(9)
    pos = np.asarray(cam.position, np.float32)
    F = 3
    R_flats = np.stack([R] * F)
    positions = pos[None, :] + np.float32(2e-3) * np.arange(
        F, dtype=np.float32)[:, None]
    fb_seq = render_sequence(scene, cam, (R_flats, positions), st)
    assert np.asarray(fb_seq.rgb).shape == (F, 48, 80, 3)
    for f in range(F):
        cam_f = dataclasses.replace(cam, position=tuple(positions[f]))
        fb_f = render_frame(scene, cam_f, st)
        np.testing.assert_array_equal(np.asarray(fb_seq.hit[f]),
                                      np.asarray(fb_f.hit))
        np.testing.assert_allclose(np.asarray(fb_seq.rgb[f]),
                                   np.asarray(fb_f.rgb), atol=1e-3)


def test_bound_entry_eps_fat_hits():
    """Regression for _bound_entry soundness: when eps_eff exceeds
    _PROXY_SWITCH (fat hit epsilon), grazing rays that pass OUTSIDE the
    thin proxy shell but inside the epsilon band must still register
    hits at the same first-crossing t as the jnp pipeline march."""
    from surfjax.api import Camera, Material, PointLight, Scene, Sphere
    from surfjax.core.types import RenderSettings

    scene = Scene()
    scene.add(Sphere(center=(0.0, 0.0, 4.0), radius=1.0),
              Material.lambert((0.8, 0.4, 0.2)), engine="sdf")
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0),
                               color=(1.0, 1.0, 1.0)))
    cam = Camera.pinhole(64, 64, 45.0, position=(0.0, 0.0, 0.0),
                         target=(0.0, 0.0, 4.0))
    st = RenderSettings(shadows=False, hit_eps=0.2, over_relax=1.0,
                        max_steps=128)
    static, params = scene.freeze()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    o, d = _rays(cam)
    fb_j = render_rays(static, st, params, o, d)
    fb_p = render_rays_pallas(static, st.with_(tile_rows=8), params, o, d)
    hj, hp = np.asarray(fb_j.hit), np.asarray(fb_p.hit)
    np.testing.assert_array_equal(hj, hp)
    assert hj.mean() > 0.05
    # The true invariant (what the old two-radius _bound_entry broke):
    # every reported pallas hit point must actually lie inside the fat
    # epsilon band — sdf(hit) < hit_eps. Sampled marches land at
    # different t inside the band per path, so depths are only
    # band-comparable, not equal.
    both = hp > 0
    dp = np.asarray(fb_p.depth)
    ox, oy, oz = (np.asarray(c) for c in o)
    dx, dy, dz = (np.asarray(c) for c in d)
    px = ox + dp * dx - 0.0
    py = oy + dp * dy - 0.0
    pz = oz + dp * dz - 4.0
    h_at_hit = np.sqrt(px * px + py * py + pz * pz) - 1.0
    assert (h_at_hit[both] < st.hit_eps + 1e-4).all(), h_at_hit[both].max()


def test_fused_frame_path_configs_and_lights():
    """Explicitly pin the KF fused frame path (render_frame with
    backend=pallas routes mesh-free scenes through frame_fused_kernel):
    multi-light scenes incl. a DIRECTIONAL light (config2) and an AREA
    light (radius > 0 -> per-ray penumbra sharpness) against the jnp
    backend."""
    import dataclasses
    from surfjax.api import PointLight
    from surfjax.core.camera import Intrinsics
    from surfjax.pipeline.frame import render_frame

    # config2: point + directional, hard shadows, CSG
    scene, cam, settings = config2_csg(size=64)
    cam = dataclasses.replace(cam,
                              intrinsics=Intrinsics.from_fov(96, 64, 50.0))
    fb_j = render_frame(scene, cam, settings.with_(backend="jnp"))
    fb_p = render_frame(scene, cam,
                        settings.with_(backend="pallas", tile_rows=8))
    np.testing.assert_array_equal(np.asarray(fb_j.hit),
                                  np.asarray(fb_p.hit))
    np.testing.assert_allclose(np.asarray(fb_j.rgb), np.asarray(fb_p.rgb),
                               atol=2e-5)

    # area light: penumbra sharpness k = dist/radius per ray
    scene2, cam2, settings2 = config3_sdf(size=64)
    scene2.lights = [PointLight(position=(3.0, 4.0, -1.0),
                                color=(1.0, 1.0, 1.0), radius=0.5)]
    st2 = settings2.with_(soft_shadows=True)
    fb_j2 = render_frame(scene2, cam2, st2.with_(backend="jnp"))
    fb_p2 = render_frame(scene2, cam2,
                         st2.with_(backend="pallas", tile_rows=8))
    assert (np.asarray(fb_j2.hit) == np.asarray(fb_p2.hit)).mean() > 0.995
    d = np.abs(np.asarray(fb_j2.rgb) - np.asarray(fb_p2.rgb))
    # wide-radius penumbrae amplify the pallas-vs-jnp penumbra-sampling
    # divergence (closed forms + influence windows vs plain march —
    # measured independent of the secondary LoD); bulk must stay tight
    assert d.mean() < 1e-2, d.mean()
    assert np.quantile(d, 0.99) < 0.12, np.quantile(d, 0.99)
    # the area-light penumbra must actually differ from the default-k
    # soft shadow (the radius plumbed through, not ignored)
    scene3, _, _ = config3_sdf(size=64)
    scene3.lights = [PointLight(position=(3.0, 4.0, -1.0),
                                color=(1.0, 1.0, 1.0))]
    fb_nok = render_frame(scene3, cam2,
                          st2.with_(backend="pallas", tile_rows=8))
    assert np.abs(np.asarray(fb_p2.rgb) - np.asarray(fb_nok.rgb)).max() \
        > 1e-3


def test_park_point_value_exact():
    """Parking DONE lanes at a far point (render_tile._march `park`) must
    be bitwise invisible in every march output: a done lane's h flows
    into nothing, so park vs no-park outputs are identical, while the
    parked lane stops pinning the while-DE at full iterations."""
    from surfjax.core.math import F32
    from surfjax.kernels.render_tile import (
        _bound_entry, _march, _object_bound, _park_point, _soft_march,
        _split,
    )

    scene, cam, settings = config3_sdf(size=32)
    static, params = scene.freeze()
    lp = jnp.asarray(params["leaf_params"])
    nparams = jnp.asarray(params["node_params"])
    _, sdf_objs, _ = _split(static)
    # the Mandelbulb object (single fractal leaf)
    bulb = next(oir for _, oir in sdf_objs
                if any(lf.kind == 3 for lf in oir.leaves))
    from surfjax.engines.sdf import eval_sdf, leaf_sdf_fast
    sdf_i = lambda p: eval_sdf(bulb, lp, nparams, p,
                               leaf_fn=leaf_sdf_fast)
    park = _park_point(bulb, lp)
    assert park is not None
    # mixed hit/miss/grazing rays toward the bulb (center (1,0,3), s=.9)
    rng = np.random.default_rng(7)
    n = 256
    o = tuple(jnp.asarray(np.full(n, v, np.float32))
              for v in (0.0, 0.4, 0.0))
    tx = rng.uniform(0.0, 2.0, n).astype(np.float32)
    ty = rng.uniform(-1.2, 1.2, n).astype(np.float32)
    tz = np.full(n, 3.0, np.float32)
    dn = np.stack([tx - 0.0, ty - 0.4, tz - 0.0])
    dn /= np.sqrt((dn * dn).sum(0))
    d = tuple(jnp.asarray(dn[i]) for i in range(3))

    b = _object_bound(bulb, lp, nparams)
    t_start = jnp.zeros(n, jnp.float32)
    clip = jnp.full(n, np.float32(settings.t_max))
    t1, clip2 = _bound_entry(b, o, d, t_start, clip, 1e-3)
    ref = _march(sdf_i, o, d, F32(0.0), clip2, 128, settings.hit_eps,
                 t_init=t1, relax=settings.over_relax, park=None)
    got = _march(sdf_i, o, d, F32(0.0), clip2, 128, settings.hit_eps,
                 t_init=t1, relax=settings.over_relax, park=park)
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert float(ref[1].sum()) > 0  # some rays hit (done lanes existed)

    # soft march: shadow-style rays from floor points toward the light
    ox = rng.uniform(0.0, 2.0, n).astype(np.float32)
    oz = rng.uniform(2.0, 4.0, n).astype(np.float32)
    o2 = (jnp.asarray(ox), jnp.asarray(np.full(n, -1.0, np.float32)),
          jnp.asarray(oz))
    ln = np.stack([3.0 - ox, np.full(n, 5.0, np.float32), -1.0 - oz])
    dist = np.sqrt((ln * ln).sum(0)).astype(np.float32)
    ln /= dist
    l = tuple(jnp.asarray(ln[i]) for i in range(3))
    ref_s = _soft_march(sdf_i, o2, l, 0.02, jnp.asarray(dist), F32(8.0),
                        64, relax=settings.over_relax, park=None)
    got_s = _soft_march(sdf_i, o2, l, 0.02, jnp.asarray(dist), F32(8.0),
                        64, relax=settings.over_relax, park=park)
    for a, b_ in zip(ref_s, got_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert float(np.asarray(ref_s[0]).min()) < 0.9  # darkening occurred


def test_unroll_value_exact():
    """March/DE while-trip unrolling (MARCH_UNROLL / SOFT_MARCH_UNROLL /
    DE_UNROLL) must be bitwise invisible: unrolled substeps are identity
    for done/escaped lanes and the divisor selection keeps every step
    budget exact — including budgets the unroll does not divide."""
    import surfjax.engines.sdf as sdf_mod
    import surfjax.kernels.render_tile as rt
    from surfjax.core.math import F32
    from surfjax.engines.sdf import eval_sdf, leaf_sdf_fast

    scene, cam, settings = config3_sdf(size=32)
    static, params = scene.freeze()
    lp = jnp.asarray(params["leaf_params"])
    nparams = jnp.asarray(params["node_params"])
    _, sdf_objs, _ = rt._split(static)
    bulb = next(oir for _, oir in sdf_objs
                if any(lf.kind == 3 for lf in oir.leaves))
    sdf_i = lambda p: eval_sdf(bulb, lp, nparams, p, leaf_fn=leaf_sdf_fast)
    park = rt._park_point(bulb, lp)

    rng = np.random.default_rng(11)
    n = 192
    o = tuple(jnp.asarray(np.full(n, v, np.float32))
              for v in (0.0, 0.4, 0.0))
    tx = rng.uniform(0.0, 2.0, n).astype(np.float32)
    ty = rng.uniform(-1.2, 1.2, n).astype(np.float32)
    tz = np.full(n, 3.0, np.float32)
    dn = np.stack([tx, ty - 0.4, tz])
    dn /= np.sqrt((dn * dn).sum(0))
    d = tuple(jnp.asarray(dn[i]) for i in range(3))
    b = rt._object_bound(bulb, lp, nparams)
    t_start = jnp.zeros(n, jnp.float32)
    clip = jnp.full(n, np.float32(settings.t_max))
    t1, clip2 = rt._bound_entry(b, o, d, t_start, clip, 1e-3)

    saved = (rt.MARCH_UNROLL, rt.SOFT_MARCH_UNROLL, rt.PRIME_UNROLL,
             sdf_mod.DE_UNROLL)
    try:
        results = []
        # budgets: 120 (divisible by 8), 126 (falls to 7), 127 (prime -> 1)
        for unroll in (1, 5, 8):
            rt.MARCH_UNROLL = rt.SOFT_MARCH_UNROLL = unroll
            rt.PRIME_UNROLL = unroll
            sdf_mod.DE_UNROLL = unroll
            per_budget = []
            for steps in (120, 126, 127):
                m = rt._march(sdf_i, o, d, F32(0.0), clip2, steps,
                              settings.hit_eps, t_init=t1,
                              relax=settings.over_relax, park=park)
                s = rt._soft_march(sdf_i, o, d, 0.02, clip2, F32(8.0),
                                   steps, relax=settings.over_relax,
                                   park=park)
                # cone-prime: park=None vs park must also be bitwise
                # equal (a done lane's h flows into nothing)
                pr0 = rt._prime_march(None, sdf_i, o, d, 1e-3, 8.0,
                                      1e-3, steps, park=None)
                pr1 = rt._prime_march(None, sdf_i, o, d, 1e-3, 8.0,
                                      1e-3, steps, park=park)
                np.testing.assert_array_equal(np.asarray(pr0),
                                              np.asarray(pr1))
                per_budget.append([np.asarray(a)
                                   for a in (*m, *s, pr0)])
            results.append(per_budget)
        for other in results[1:]:
            for ref_b, got_b in zip(results[0], other):
                for a, c in zip(ref_b, got_b):
                    np.testing.assert_array_equal(a, c)
    finally:
        (rt.MARCH_UNROLL, rt.SOFT_MARCH_UNROLL, rt.PRIME_UNROLL,
         sdf_mod.DE_UNROLL) = saved
    # the workload exercised real marches (hits and penumbra darkening)
    assert float(results[0][0][1].sum()) > 0
