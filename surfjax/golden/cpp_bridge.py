"""ctypes bridge to the C++ golden renderer (component 21 native path).

Builds surfjax/golden/cpp/golden.cpp on demand with strict FP flags
(-fno-fast-math -ffp-contract=off) and exposes `render(scene, camera,
settings)` with the same output dict as golden.renderer.render. Scene data
is packed into the flat SoA tables the compiler already produces; the C++
math itself is a third independent implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "golden.cpp")
_LIB = os.path.join(_HERE, "cpp", "libgolden.so")

_lib = None


def _build() -> str:
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        # build to a temp file + atomic rename (concurrent importers must
        # never dlopen a half-written .so)
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        cmd = ["g++", "-O2", "-fno-fast-math", "-ffp-contract=off", "-pthread",
               "-shared", "-fPIC", "-o", tmp, _SRC]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB)
    return _LIB


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.sj_golden_render.argtypes = [
            f32p, i32p, i32p, ctypes.c_int, i32p, i32p, f32p, f32p, f32p,
            f32p, i32p, ctypes.c_int, f32p, f32p, i32p, i32p,
            f32p, f32p, f32p, f32p,
        ]
        lib.sj_golden_render.restype = None
        _lib = lib
    return _lib


def render(scene, camera, settings) -> Dict[str, np.ndarray]:
    from surfjax.core.scene_compile import ENGINE_MESH, compile_scene

    static, params = compile_scene(scene)
    ir = static.ir

    # mesh pools (vertex indices offset per mesh)
    mesh_verts = []
    mesh_vnorm = []
    mesh_faces = []
    mesh_obj_rows = []
    v_off = 0
    f_off = 0
    mesh_face_ranges = {}
    for mi in range(ir.n_meshes):
        verts = params[f"mesh{mi}_verts"]
        vnorm = params[f"mesh{mi}_vert_n"]
        faces = params[f"mesh{mi}_faces"]
        mesh_verts.append(np.asarray(verts, np.float32))
        mesh_vnorm.append(np.asarray(vnorm, np.float32))
        mesh_faces.append(np.asarray(faces, np.int32) + v_off)
        mesh_face_ranges[mi] = (f_off, faces.shape[0])
        v_off += verts.shape[0]
        f_off += faces.shape[0]

    objs = []
    nodes = []
    leaf_meta = []
    leaf_rows = []
    node_off = 0
    for o in ir.objects:
        leaf_off = len(leaf_meta)
        objs.append([o.engine, node_off, len(o.nodes), leaf_off,
                     len(o.leaves), o.mat, o.shininess])
        if o.engine == ENGINE_MESH:
            off, cnt = mesh_face_ranges[o.mesh]
            smooth = int(static.mesh_static[o.mesh].smooth)
            mesh_obj_rows.append([off, cnt, smooth])
        else:
            mesh_obj_rows.append([0, 0, 0])
        for nd in o.nodes:
            nodes.append([nd.op, nd.a, nd.b, nd.leaf, max(nd.pslot, 0)])
        for lf in o.leaves:
            leaf_meta.append([lf.kind, lf.sign, lf.p0, lf.p1])
            leaf_rows.append(params["leaf_params"][lf.slot])
        node_off += len(o.nodes)

    intr = camera.intrinsics
    R = np.asarray(camera.rotation, np.float32).reshape(9)
    pos = np.asarray(camera.position, np.float32)
    headerf = np.asarray(
        [intr.fx, intr.fy, intr.cx, intr.cy, *R, *pos,
         settings.t_min, settings.t_max, settings.hit_eps,
         settings.hit_eps_scale,
         settings.normal_eps, settings.shadow_eps,
         settings.soft_shadow_k, settings.soft_shadow_tmin,
         settings.ao_radius, settings.ao_strength,
         *settings.background, *scene.ambient], np.float32)
    headeri = np.asarray(
        [intr.width, intr.height, settings.max_steps, settings.shadow_steps,
         settings.ao_samples, int(settings.shadows),
         int(settings.soft_shadows), int(settings.ao),
         int(settings.normals == "fd"),
         int(getattr(settings, "bulb_log", "hw") == "portable")], np.int32)

    n = intr.width * intr.height
    out_rgb = np.zeros(3 * n, np.float32)
    out_depth = np.zeros(n, np.float32)
    out_normal = np.zeros(3 * n, np.float32)
    out_hit = np.zeros(n, np.float32)

    light_kinds = np.asarray(list(ir.lights) or [0], np.int32)
    _load().sj_golden_render(
        headerf, headeri,
        np.asarray(objs, np.int32).reshape(-1),
        len(objs),
        np.asarray(nodes, np.int32).reshape(-1),
        np.asarray(leaf_meta, np.int32).reshape(-1),
        (np.stack(leaf_rows).astype(np.float32).reshape(-1)
         if leaf_rows else np.zeros(8, np.float32)),
        params["node_params"].astype(np.float32).reshape(-1),
        params["materials"].astype(np.float32).reshape(-1),
        params["lights"].astype(np.float32).reshape(-1),
        light_kinds, len(ir.lights),
        (np.concatenate(mesh_verts).reshape(-1) if mesh_verts
         else np.zeros(3, np.float32)),
        (np.concatenate(mesh_vnorm).reshape(-1) if mesh_vnorm
         else np.zeros(3, np.float32)),
        (np.concatenate(mesh_faces).reshape(-1).astype(np.int32)
         if mesh_faces else np.zeros(3, np.int32)),
        np.asarray(mesh_obj_rows, np.int32).reshape(-1),
        out_rgb, out_depth, out_normal, out_hit)

    H, W = intr.height, intr.width
    return {
        "rgb": out_rgb.reshape(H, W, 3),
        "depth": out_depth.reshape(H, W),
        "normal": out_normal.reshape(H, W, 3),
        "hit": out_hit.reshape(H, W),
    }
