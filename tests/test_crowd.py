"""Vectorized object loop ("crowd") tests — r4, verdict Weak #4.

RenderSettings.vector_objects switches single-leaf sphere/box SDF
objects from per-object static unrolling (compile cost ~0.67 s/object on
TPU) to ONE fori_loop with dynamic SMEM parameter reads. The per-lane
arithmetic is identical, so the crowd path must be BITWISE equal to the
unrolled path; these tests pin that, plus membership rules and golden
agreement.
"""

from __future__ import annotations

import numpy as np
import pytest

from surfjax import (
    Box, Camera, Material, Plane, PointLight, RenderSettings, Scene,
    Sphere, render,
)
from surfjax.golden import renderer as golden


def _crowd_scene(n_spheres=9, n_boxes=4, with_plane=True, shadows=True,
                 soft=False, ao=False):
    """Deterministic pseudo-random crowd of small spheres/boxes above a
    floor, mixed materials (2 shininess groups + lambert)."""
    rng = np.random.default_rng(7)
    scene = Scene()
    mats = [Material.lambert(albedo=(0.7, 0.4, 0.3)),
            Material.blinn_phong(albedo=(0.3, 0.6, 0.8), shininess=16),
            Material.blinn_phong(albedo=(0.8, 0.8, 0.3), shininess=32)]
    for k in range(n_spheres):
        c = (float(rng.uniform(-1.6, 1.6)), float(rng.uniform(-0.6, 1.0)),
             float(rng.uniform(2.2, 4.2)))
        scene.add(Sphere(center=c, radius=float(rng.uniform(0.15, 0.35))),
                  mats[k % 3], engine="sdf")
    for k in range(n_boxes):
        c = (float(rng.uniform(-1.6, 1.6)), float(rng.uniform(-0.6, 1.0)),
             float(rng.uniform(2.2, 4.2)))
        h = tuple(float(x) for x in rng.uniform(0.1, 0.3, 3))
        scene.add(Box(center=c, half_extents=h), mats[(k + 1) % 3],
                  engine="sdf")
    if with_plane:
        scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
                  Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0)))
    cam = Camera.pinhole(128, 96, fov_y_deg=50.0,
                         position=(0.0, 0.6, -0.5), target=(0.0, 0.0, 3.0))
    s = RenderSettings(shadows=shadows, soft_shadows=soft, ao=ao,
                       backend="pallas", tile_rows=8, max_steps=96)
    return scene, cam, s


def _fb_tuple(fb):
    return (np.asarray(fb.rgb), np.asarray(fb.depth),
            np.asarray(fb.normal), np.asarray(fb.hit),
            np.asarray(fb.obj_id))


def _assert_bitwise(fa, fb_):
    """Geometry outputs (march, normals, attribution) must be BITWISE
    equal; rgb gets a <=1-ULP envelope — the crowd shade evaluates the
    same per-lane arithmetic but with gathered (array) material params,
    and XLA fuses that epilogue differently (the documented legal-fusion
    class, docs/ROUND3.md side-finding: <=2 ULP rgb drift; measured here
    1-2 ULP on <2% of channels)."""
    from surfjax.io.image import ulp_diff_f32
    names = ("depth", "normal", "hit", "obj_id")
    for name, a, b in zip(names, _fb_tuple(fa)[1:], _fb_tuple(fb_)[1:]):
        np.testing.assert_array_equal(a, b, err_msg=name)
    u = ulp_diff_f32(np.asarray(fa.rgb), np.asarray(fb_.rgb))
    assert u.max() <= 2, f"rgb ulp max {u.max()}"
    assert (u > 0).mean() < 0.02, f"rgb drift fraction {(u > 0).mean()}"


class TestCrowdBitwise:
    def test_hard_shadows_ao(self):
        scene, cam, s = _crowd_scene(shadows=True, ao=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        # sanity: the crowd actually hit things and shadows exist
        assert np.asarray(fb_crowd.hit).mean() > 0.2
        assert len(np.unique(np.asarray(fb_crowd.obj_id))) > 4
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_soft_shadows(self):
        scene, cam, s = _crowd_scene(shadows=True, soft=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_no_plane_crowd_only(self):
        scene, cam, s = _crowd_scene(with_plane=False, shadows=True,
                                     ao=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_twin_matches_crowd_kernel(self):
        """K1 kernel vs jnp twin on the SAME padded rays, both with the
        crowd active — same pairing/tolerances as the existing
        test_kernel_matches_twin_* (per-tile vs whole-batch early exit
        converges t to slightly different bits)."""
        import jax.numpy as jnp
        from surfjax.core.camera import camera_ray_dirs_dyn
        from surfjax.kernels.render_tile import (
            _pad_rays, render_tile_kernel, scene_march_twin,
        )
        scene, cam, s = _crowd_scene(shadows=False, ao=True)
        s = s.with_(vector_objects=True)
        static, params = scene.freeze()
        params = {k: jnp.asarray(v) for k, v in params.items()}
        intr = cam.intrinsics
        rows = np.repeat(np.arange(intr.height, dtype=np.float32),
                         intr.width)
        cols = np.tile(np.arange(intr.width, dtype=np.float32),
                       intr.height)
        R = jnp.asarray(np.asarray(cam.rotation, np.float32).reshape(9))
        d = camera_ray_dirs_dyn(intr, R, jnp.asarray(rows),
                                jnp.asarray(cols))
        pos = np.asarray(cam.position, np.float32)
        o = tuple(jnp.full(rows.shape, pos[i], jnp.float32)
                  for i in range(3))
        (ox, oy, oz, dx, dy, dz), _n = _pad_rays(
            (o[0], o[1], o[2], d[0], d[1], d[2]), s.tile_rows)
        t_k, obj_k, n_k, ao_k, hit_k, _ = render_tile_kernel(
            static, s, 0, params["leaf_params"], params["node_params"],
            (ox, oy, oz), (dx, dy, dz))
        t_t, obj_t, n_t, ao_t, hit_t = scene_march_twin(
            static, s, params["leaf_params"], params["node_params"],
            (ox, oy, oz), (dx, dy, dz))
        np.testing.assert_array_equal(np.asarray(hit_k),
                                      np.asarray(hit_t))
        np.testing.assert_array_equal(np.asarray(obj_k),
                                      np.asarray(obj_t))
        np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_t),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ao_k), np.asarray(ao_t),
                                   atol=1e-2)
        for a, b in zip(n_k, n_t):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)


def test_crowd_vs_golden():
    scene, cam, s = _crowd_scene(shadows=True, ao=True)
    fb = render(scene, cam, s.with_(vector_objects=True))
    g = golden.render(scene, cam, s)
    d = np.abs(np.asarray(fb.rgb) - g["rgb"])
    assert np.asarray(fb.hit).mean() > 0.2
    assert (np.asarray(fb.hit) == g["hit"].reshape(96, 128)).mean() \
        > 0.9995
    assert np.quantile(d, 0.99) < 1e-3, np.quantile(d, 0.99)


def test_split_crowd_membership():
    from surfjax import Mandelbulb, smooth_union, union
    from surfjax.kernels.render_tile import split_crowd
    scene = Scene()
    scene.add(Sphere(center=(0, 0, 3), radius=0.4),
              Material.lambert(), engine="sdf")
    scene.add(Box(center=(1, 0, 3), half_extents=(0.2, 0.2, 0.2)),
              Material.lambert(), engine="sdf")
    scene.add(Mandelbulb(center=(-1, 0, 3), scale=0.5),
              Material.lambert(), engine="sdf")  # excluded: iterated DE
    scene.add(smooth_union(Sphere(center=(0, 1, 3), radius=0.3),
                           Sphere(center=(0.4, 1, 3), radius=0.3), 0.2),
              Material.lambert(), engine="sdf")  # eligible SDF PAIR (r5)
    scene.add(Plane(normal=(0, 1, 0), offset=-1.0),
              Material.lambert())  # excluded: plane leaf (unboundable)
    scene.add(Sphere(center=(2, 0, 3), radius=0.3),
              Material.lambert())  # analytic sphere: eligible (r4)
    scene.add(union(Sphere(center=(0, 2, 3), radius=0.3),
                    Box(center=(0.4, 2, 3), half_extents=(0.2,) * 3)),
              Material.lambert())  # excluded: ANALYTIC pairs stay unrolled
    static, _ = scene.freeze()
    s_on = RenderSettings(vector_objects=True)
    crowd, rest_ana, rest_sdf = split_crowd(static, s_on)
    assert crowd is not None
    assert len(crowd.members) == 4
    assert (crowd.n_sph_sdf, crowd.n_box_sdf,
            crowd.n_sph_ana, crowd.n_box_ana) == (1, 1, 1, 0)
    # the smooth_union(sphere, sphere) object is one (ss, smooth) pair
    # section; the pair member follows the singles in `members`
    assert len(crowd.pair_specs) == 1
    is_s0, is_s1, _op, cnt = crowd.pair_specs[0]
    assert (is_s0, is_s1, cnt) == (True, True, 1)
    assert crowd.members[-1][0] == 3
    assert {i for i, _ in rest_sdf} == {2}
    assert {i for i, _ in rest_ana} == {4, 6}
    # flag off -> no crowd ever
    crowd_off, ana_off, sdf_off = split_crowd(static, RenderSettings())
    assert crowd_off is None
    assert len(sdf_off) == 4 and len(ana_off) == 3

    # below the 2-member threshold -> unrolled
    s2 = Scene()
    s2.add(Sphere(center=(0, 0, 3), radius=0.4), Material.lambert(),
           engine="sdf")
    static2, _ = s2.freeze()
    assert split_crowd(static2, s_on)[0] is None


def test_crowd_analytic_members_bitwise():
    """Analytic single-leaf spheres/boxes join the crowd (r4): exact
    interval hits, closed-form normals under "auto", exact shadow
    any-hits — same bitwise-geometry contract vs the unrolled path."""
    rng = np.random.default_rng(13)
    scene = Scene()
    mats = [Material.lambert(albedo=(0.7, 0.4, 0.3)),
            Material.blinn_phong(albedo=(0.3, 0.6, 0.8), shininess=16)]
    for k in range(6):
        c = (float(rng.uniform(-1.6, 1.6)), float(rng.uniform(-0.6, 1.0)),
             float(rng.uniform(2.2, 4.2)))
        scene.add(Sphere(center=c, radius=float(rng.uniform(0.15, 0.3))),
                  mats[k % 2])  # ANALYTIC engine (default)
    for k in range(3):
        c = (float(rng.uniform(-1.6, 1.6)), float(rng.uniform(-0.6, 1.0)),
             float(rng.uniform(2.2, 4.2)))
        scene.add(Box(center=c,
                      half_extents=tuple(
                          float(x) for x in rng.uniform(0.1, 0.25, 3))),
                  mats[(k + 1) % 2])
    # plus a couple of SDF members so both engines ride the same crowd
    for k in range(3):
        c = (float(rng.uniform(-1.6, 1.6)), float(rng.uniform(-0.6, 1.0)),
             float(rng.uniform(2.2, 4.2)))
        scene.add(Sphere(center=c, radius=0.2), mats[k % 2], engine="sdf")
    scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
              Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0)))
    cam = Camera.pinhole(128, 96, fov_y_deg=50.0,
                         position=(0.0, 0.6, -0.5), target=(0.0, 0.0, 3.0))
    s = RenderSettings(shadows=True, ao=True, backend="pallas",
                       tile_rows=8, max_steps=96)
    fb_u = render(scene, cam, s)
    fb_c = render(scene, cam, s.with_(vector_objects=True))
    assert len(np.unique(np.asarray(fb_c.obj_id))) > 6
    _assert_bitwise(fb_u, fb_c)
    # and under soft shadows (closed-form sphere penumbrae for both
    # engines; analytic boxes marched via their SDF form)
    fb_us = render(scene, cam, s.with_(soft_shadows=True))
    fb_cs = render(scene, cam, s.with_(soft_shadows=True,
                                       vector_objects=True))
    _assert_bitwise(fb_us, fb_cs)


def test_crowd_with_mesh_split_path():
    """A mesh in the scene routes the frame through the split K1->K2
    pipeline (fused_frame_ok is False), exercising the crowd hooks in
    _render_padded (incl. the XLA-side gathered-material shading) —
    same bitwise-geometry / <=2-ULP-rgb contract as the KF path."""
    from tests.scenes import make_test_mesh
    from surfjax import TriangleMesh
    scene, cam, s = _crowd_scene(n_spheres=5, n_boxes=2, shadows=True)
    v, f = make_test_mesh()
    v = v * 0.5
    v[:, 2] += 3.4
    v[:, 0] += 1.2
    scene.add(TriangleMesh(vertices=v, faces=f),
              Material.blinn_phong(albedo=(0.7, 0.7, 0.75), shininess=32))
    fb_unrolled = render(scene, cam, s)
    fb_crowd = render(scene, cam, s.with_(vector_objects=True))
    # the mesh must actually appear
    assert (np.asarray(fb_crowd.obj_id) ==
            len(scene.objects) - 1).sum() > 10
    _assert_bitwise(fb_unrolled, fb_crowd)


def test_crowd_scales_to_many_objects():
    """Functional check well past the unrolled path's practical compile
    ceiling: 64 single-leaf objects through the crowd fori_loop (trace
    time is O(1) in member count; interpret-mode run here, Mosaic
    crossover measured on TPU by tools/compile_scaling.py)."""
    rng = np.random.default_rng(11)
    scene = Scene()
    for i in range(64):
        c = (float(rng.uniform(-3, 3)), float(rng.uniform(-1.5, 2)),
             float(rng.uniform(3, 8)))
        scene.add(Sphere(center=c, radius=0.25),
                  Material.lambert((0.3 + 0.4 * (i % 2), 0.5, 0.7)),
                  engine="sdf")
    scene.add(Plane(normal=(0, 1, 0), offset=-2.0),
              Material.lambert((0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3, 6, -1)))
    cam = Camera.pinhole(64, 48, fov_y_deg=50.0,
                         position=(0, 0.5, -1), target=(0, 0, 4))
    s = RenderSettings(shadows=True, backend="pallas", tile_rows=8,
                       max_steps=48, vector_objects=True)
    fb = render(scene, cam, s)
    assert float(np.asarray(fb.hit).mean()) > 0.3
    assert len(np.unique(np.asarray(fb.obj_id))) > 40


def test_crowd_sequence_matches_frames():
    """The fused F-frame sequence kernel (KF sequence form) with a crowd
    active must match per-frame renders — and the crowd flag must not
    change sequence geometry vs the unrolled sequence."""
    import jax
    import jax.numpy as jnp
    from surfjax import render_sequence
    from surfjax.core.camera import orbit_pose

    scene, cam, s = _crowd_scene(n_spheres=5, n_boxes=2, shadows=True)
    # a pair member too: the sequence (KF sequence form) must run the
    # r5 pair sections identically to the per-frame kernel
    from surfjax import smooth_union
    scene.add(smooth_union(Sphere(center=(0.6, 0.9, 3.4), radius=0.22),
                           Sphere(center=(0.85, 0.9, 3.4), radius=0.18),
                           0.12),
              Material.lambert(albedo=(0.4, 0.7, 0.4)), engine="sdf")
    thetas = jnp.linspace(0.0, 0.5, 3)
    Rs, ts = jax.vmap(lambda th: orbit_pose(jnp.float32(3.5),
                                            jnp.float32(0.8), th))(thetas)
    ts = ts + jnp.asarray([0.0, 0.0, 3.0], jnp.float32)
    seq_u = render_sequence(scene, cam, (Rs, ts), s)
    seq_c = render_sequence(scene, cam, (Rs, ts),
                            s.with_(vector_objects=True))
    np.testing.assert_array_equal(np.asarray(seq_u.depth),
                                  np.asarray(seq_c.depth))
    np.testing.assert_array_equal(np.asarray(seq_u.obj_id),
                                  np.asarray(seq_c.obj_id))
    from surfjax.io.image import ulp_diff_f32
    u = ulp_diff_f32(np.asarray(seq_u.rgb), np.asarray(seq_c.rgb))
    assert u.max() <= 2, u.max()


# ---------------------------------------------------------------------------
# Two-leaf pair crowd (r5, verdict Next #4)
# ---------------------------------------------------------------------------

def _pair_scene(n_pairs=6, n_singles=3, soft=False, ao=False,
                with_union=True, with_plane=True, all_ops=False):
    """Mixed crowd: smooth-union pairs (varying k) — or, with all_ops,
    a rotation through ALL six binary CSG ops (r5) — one hard-union
    pair, single spheres, a bulb (stays unrolled), a floor plane."""
    from surfjax import (Mandelbulb, intersect, smooth_intersect,
                         smooth_subtract, smooth_union, subtract, union)
    rng = np.random.default_rng(11)
    scene = Scene()
    mats = [Material.lambert(albedo=(0.7, 0.4, 0.3)),
            Material.blinn_phong(albedo=(0.3, 0.6, 0.8), shininess=16)]
    for k in range(n_pairs):
        c = (float(rng.uniform(-1.6, 1.6)), float(rng.uniform(-0.5, 1.0)),
             float(rng.uniform(2.4, 4.2)))
        a = Sphere(center=c, radius=float(rng.uniform(0.15, 0.3)))
        if k % 2 == 0:
            b = Sphere(center=(c[0] + 0.25, c[1], c[2]),
                       radius=float(rng.uniform(0.12, 0.25)))
        else:
            b = Box(center=(c[0] + 0.2, c[1] + 0.1, c[2]),
                    half_extents=tuple(
                        float(x) for x in rng.uniform(0.08, 0.2, 3)))
        kk = float(rng.uniform(0.08, 0.25))
        if all_ops:
            # intersect/subtract need overlap to leave a surface: keep
            # b's center inside a for those ops
            ops = [lambda a, b: union(a, b),
                   lambda a, b: intersect(a, Sphere(
                       center=(c[0] + 0.1, c[1], c[2]), radius=0.22)),
                   lambda a, b: subtract(a, Sphere(
                       center=(c[0] + 0.12, c[1] + 0.08, c[2]),
                       radius=0.15)),
                   lambda a, b: smooth_union(a, b, kk),
                   lambda a, b: smooth_intersect(a, Sphere(
                       center=(c[0] + 0.1, c[1], c[2]), radius=0.22), kk),
                   lambda a, b: smooth_subtract(a, Sphere(
                       center=(c[0] + 0.12, c[1] + 0.08, c[2]),
                       radius=0.15), kk)]
            node = ops[k % 6](a, b)
        else:
            node = smooth_union(a, b, kk)
        scene.add(node, mats[k % 2], engine="sdf")
    if with_union:
        scene.add(union(Sphere(center=(1.3, 1.2, 3.0), radius=0.2),
                        Sphere(center=(1.55, 1.2, 3.0), radius=0.18)),
                  mats[0], engine="sdf")
    for k in range(n_singles):
        scene.add(Sphere(center=(-1.5 + 0.5 * k, 1.3, 3.2), radius=0.18),
                  mats[(k + 1) % 2], engine="sdf")
    scene.add(Mandelbulb(center=(0.0, -0.6, 4.6), scale=0.5),
              Material.lambert(albedo=(0.85, 0.6, 0.3)))  # stays unrolled
    if with_plane:
        scene.add(Plane(normal=(0.0, 1.0, 0.0), offset=-1.0),
                  Material.lambert(albedo=(0.5, 0.5, 0.5)))
    scene.add_light(PointLight(position=(3.0, 5.0, -1.0)))
    cam = Camera.pinhole(128, 96, fov_y_deg=50.0,
                         position=(0.0, 0.6, -0.5), target=(0.0, 0.0, 3.0))
    s = RenderSettings(shadows=True, soft_shadows=soft, ao=ao,
                       backend="pallas", tile_rows=8, max_steps=96)
    return scene, cam, s


class TestPairCrowdBitwise:
    def test_pairs_hard_shadows_ao(self):
        scene, cam, s = _pair_scene(ao=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        assert np.asarray(fb_crowd.hit).mean() > 0.2
        assert len(np.unique(np.asarray(fb_crowd.obj_id))) > 5
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_pairs_soft_shadows(self):
        scene, cam, s = _pair_scene(soft=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_pairs_only_no_singles(self):
        scene, cam, s = _pair_scene(n_pairs=5, n_singles=0,
                                    with_union=False, ao=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        _assert_bitwise(fb_unrolled, fb_crowd)


def test_pair_crowd_vs_golden():
    """Crowd pair path against the independent NumPy oracle — the same
    tolerance class as the ordinary pallas-vs-golden comparisons."""
    scene, cam, s = _pair_scene(n_pairs=4, n_singles=2, ao=False)
    fb = render(scene, cam, s.with_(vector_objects=True))
    g = golden.render_parallel(scene, cam, s)
    assert (np.asarray(fb.hit) == g["hit"]).mean() > 0.999
    d = np.abs(np.asarray(fb.rgb) - g["rgb"])
    assert np.quantile(d, 0.99) < 5e-3, np.quantile(d, 0.99)


class TestPairCrowdAllOps:
    def test_all_six_ops_join_the_crowd(self):
        # non-vacuity guard: all six ops must actually be CROWD members
        # (a rejected spec silently falls back to unrolled-vs-unrolled,
        # which would pass the bitwise checks without testing anything)
        from surfjax.kernels.render_tile import split_crowd
        scene, cam, s = _pair_scene(n_pairs=6, ao=False, all_ops=True)
        static, _ = scene.freeze()
        crowd, _, rest_sdf = split_crowd(
            static, s.with_(vector_objects=True))
        assert crowd is not None
        ops = {spec[2] for spec in crowd.pair_specs}
        assert len(ops) == 6, crowd.pair_specs
        # only the bulb stays unrolled
        assert len(rest_sdf) == 1

    def test_all_six_ops_bitwise(self):
        scene, cam, s = _pair_scene(n_pairs=6, ao=True, all_ops=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        assert np.asarray(fb_crowd.hit).mean() > 0.2
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_all_six_ops_soft_shadows(self):
        scene, cam, s = _pair_scene(n_pairs=6, soft=True, all_ops=True)
        fb_unrolled = render(scene, cam, s)
        fb_crowd = render(scene, cam, s.with_(vector_objects=True))
        _assert_bitwise(fb_unrolled, fb_crowd)

    def test_all_ops_vs_golden(self):
        scene, cam, s = _pair_scene(n_pairs=6, n_singles=1, ao=False,
                                    all_ops=True)
        fb = render(scene, cam, s.with_(vector_objects=True))
        g = golden.render_parallel(scene, cam, s)
        assert (np.asarray(fb.hit) == g["hit"]).mean() > 0.999
        d = np.abs(np.asarray(fb.rgb) - g["rgb"])
        assert np.quantile(d, 0.99) < 5e-3, np.quantile(d, 0.99)

    def test_subtract_carves(self):
        # the subtracted region must actually be carved (the crowd pair
        # SDF uses -leaf1): a ray at the carve center hits DEEPER than
        # the plain leaf0 sphere would
        from surfjax import subtract
        scene = Scene()
        scene.add(subtract(Sphere(center=(0.0, 0.0, 3.0), radius=0.5),
                           Sphere(center=(0.0, 0.0, 2.6), radius=0.3)),
                  Material.lambert(), engine="sdf")
        scene.add(Sphere(center=(2.0, 0.0, 3.0), radius=0.3),
                  Material.lambert(), engine="sdf")
        cam = Camera.pinhole(64, 64, fov_y_deg=40.0,
                             position=(0.0, 0.0, 0.0),
                             target=(0.0, 0.0, 3.0))
        s = RenderSettings(backend="pallas", tile_rows=8, max_steps=96,
                           vector_objects=True)
        fb = render(scene, cam, s)
        center_depth = float(np.asarray(fb.depth)[32, 32])
        assert center_depth > 2.6, center_depth  # sphere face was 2.5


def test_pair_ineligible_shapes_stay_unrolled():
    """Deeper tapes, reversed operand order, and analytic pairs stay
    unrolled (subtract PAIRS are eligible since the r5 all-ops
    extension)."""
    from surfjax import subtract, union
    from surfjax.kernels.render_tile import split_crowd
    scene = Scene()
    scene.add(union(subtract(Sphere(center=(0, 0, 3), radius=0.4),
                             Sphere(center=(0.2, 0, 3), radius=0.3)),
                    Sphere(center=(0.5, 0, 3), radius=0.2)),
              Material.lambert(), engine="sdf")  # 3-leaf tape: unrolled
    scene.add(subtract(Sphere(center=(1, 0, 3), radius=0.3),
                       Sphere(center=(1.1, 0, 3), radius=0.2)),
              Material.lambert(), engine="sdf")  # pair: eligible (r5)
    scene.add(union(Sphere(center=(-1, 0, 3), radius=0.3),
                    Sphere(center=(-0.8, 0, 3), radius=0.2)),
              Material.lambert())  # ANALYTIC pair: unrolled
    scene.add(Sphere(center=(0, 1, 3), radius=0.3), Material.lambert(),
              engine="sdf")
    static, _ = scene.freeze()
    crowd, rest_ana, rest_sdf = split_crowd(
        static, RenderSettings(vector_objects=True))
    assert crowd is not None
    assert len(crowd.pair_specs) == 1
    assert {i for i, _ in rest_sdf} == {0}
    assert {i for i, _ in rest_ana} == {2}
