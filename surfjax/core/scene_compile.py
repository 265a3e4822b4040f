"""Scene compiler: Python scene graph -> flat SoA ScenePack (component 16).

BASELINE.json:5 — "Scene description (primitive list, CSG ops, lights, camera
intrinsics) compiles to a flat SoA layout broadcast to all cores."

Output is split into:
  * SceneIR  — the *static* structure (tuples of ints, hashable). It is a jit
    static argument: each scene structure specializes its own XLA program /
    Pallas kernel, so scene traversal is fully unrolled and branch-free on
    device. CSG trees are stored as post-order node tapes (SURVEY.md §3.4).
  * params   — the *dynamic* pytree of float32 SoA arrays (leaf parameter
    blocks, smooth-k table, material table, light table). Differentiable:
    inverse-SDF fitting takes grads w.r.t. entries of this dict.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

from surfjax import api
from surfjax.api import (
    Box, CSG, Mandelbulb, Plane, Scene, SceneNode, Sphere, TriangleMesh,
    DirectionalLight, PointLight,
    OP_LEAF, OP_UNION, OP_INTERSECT, OP_SUBTRACT,
    OP_SMOOTH_UNION, OP_SMOOTH_INTERSECT, OP_SMOOTH_SUBTRACT,
)

# Leaf kinds
LEAF_SPHERE = 0
LEAF_PLANE = 1
LEAF_BOX = 2
LEAF_MANDELBULB = 3

# Engines
ENGINE_ANALYTIC = 0
ENGINE_SDF = 1
ENGINE_MESH = 2

# Light kinds
LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1

LEAF_PARAM_W = 8     # leaf_params row width
MAT_PARAM_W = 9      # albedo3, ka, kd, ks, spec3
LIGHT_PARAM_W = 7    # pos/dir3, color3, radius


class LeafIR(NamedTuple):
    kind: int
    slot: int          # global row in params["leaf_params"]
    sign: int          # +1 / -1: normal orientation parity under SUBTRACT
    p0: int            # static int param (mandelbulb power)
    p1: int            # static int param (mandelbulb iterations)


class NodeIR(NamedTuple):
    op: int
    a: int             # child node index (object-local post-order, < self)
    b: int
    leaf: int          # object-local leaf index when op == OP_LEAF, else -1
    pslot: int         # global row in params["node_params"] (smooth k), -1


class ObjectIR(NamedTuple):
    engine: int
    nodes: Tuple[NodeIR, ...]    # post-order; root is last
    leaves: Tuple[LeafIR, ...]
    mat: int                     # row in params["materials"]
    shininess: int               # static (pow_int exponent)
    mesh: int                    # index into mesh tables, -1 if not a mesh


class SceneIR(NamedTuple):
    objects: Tuple[ObjectIR, ...]
    lights: Tuple[int, ...]      # light kinds
    n_leaves: int
    n_meshes: int


_SMOOTH = (OP_SMOOTH_UNION, OP_SMOOTH_INTERSECT, OP_SMOOTH_SUBTRACT)


def _node_needs_sdf(node: SceneNode) -> bool:
    if isinstance(node, Mandelbulb):
        return True
    if isinstance(node, CSG):
        if node.op in _SMOOTH:
            return True
        return _node_needs_sdf(node.a) or _node_needs_sdf(node.b)
    return False


def _node_has_mesh(node: SceneNode) -> bool:
    if isinstance(node, TriangleMesh):
        return True
    if isinstance(node, CSG):
        return _node_has_mesh(node.a) or _node_has_mesh(node.b)
    return False


def _leaf_row(node: SceneNode) -> Tuple[int, np.ndarray, int, int]:
    """-> (kind, params row (LEAF_PARAM_W,), p0, p1)."""
    row = np.zeros(LEAF_PARAM_W, np.float32)
    if isinstance(node, Sphere):
        row[0:3] = node.center
        row[3] = node.radius
        return LEAF_SPHERE, row, 0, 0
    if isinstance(node, Plane):
        n = np.asarray(node.normal, np.float64)
        ln = np.sqrt(np.dot(n, n))
        n = n / ln
        row[0:3] = n.astype(np.float32)
        # the surface is dot(normal, p) == offset; normalizing the normal
        # rescales the equation, so the offset divides by |normal| too
        # (review r3: a non-unit normal silently shifted the plane)
        row[3] = np.float32(float(node.offset) / ln)
        return LEAF_PLANE, row, 0, 0
    if isinstance(node, Box):
        row[0:3] = node.center
        row[3:6] = node.half_extents
        return LEAF_BOX, row, 0, 0
    if isinstance(node, Mandelbulb):
        row[0:3] = node.center
        row[3] = node.scale
        row[4] = node.bailout
        return LEAF_MANDELBULB, row, int(node.power), int(node.iterations)
    raise TypeError(f"unknown primitive: {type(node).__name__}")


def compile_scene(scene: Scene):
    """Scene -> (SceneIR, params dict of np.float32 arrays)."""
    objects = []
    leaf_rows = []
    node_k = []
    mesh_tables = []

    for obj in scene.objects:
        node = obj.node
        if obj.engine == "mesh" or _node_has_mesh(node):
            if not isinstance(node, TriangleMesh):
                raise ValueError("TriangleMesh must be a bare scene object "
                                 "(no CSG over meshes)")
            engine = ENGINE_MESH
        elif obj.engine == "sdf":
            engine = ENGINE_SDF
        elif obj.engine == "analytic":
            if _node_needs_sdf(node):
                raise ValueError("smooth ops / Mandelbulb require the SDF "
                                 "engine")
            engine = ENGINE_ANALYTIC
        else:
            engine = ENGINE_SDF if _node_needs_sdf(node) else (
                ENGINE_MESH if isinstance(node, TriangleMesh)
                else ENGINE_ANALYTIC)

        mesh_idx = -1
        leaves: list = []
        nodes: list = []

        if engine == ENGINE_MESH:
            from surfjax.engines.mesh import build_grid
            mesh_idx = len(mesh_tables)
            mesh_tables.append(build_grid(node))
        else:
            def walk(n: SceneNode, sign: int) -> int:
                """post-order; returns node index; appends to nodes/leaves."""
                if isinstance(n, CSG):
                    ia = walk(n.a, sign)
                    flip = -sign if n.op in (OP_SUBTRACT, OP_SMOOTH_SUBTRACT) \
                        else sign
                    ib = walk(n.b, flip)
                    pslot = -1
                    if n.op in _SMOOTH:
                        pslot = len(node_k)
                        node_k.append(np.float32(n.k))
                    nodes.append(NodeIR(n.op, ia, ib, -1, pslot))
                    return len(nodes) - 1
                kind, row, p0, p1 = _leaf_row(n)
                slot = len(leaf_rows)
                leaf_rows.append(row)
                leaves.append(LeafIR(kind, slot, sign, p0, p1))
                nodes.append(NodeIR(OP_LEAF, -1, -1, len(leaves) - 1, -1))
                return len(nodes) - 1

            walk(node, +1)

        m = obj.material
        objects.append((ObjectIR(engine, tuple(nodes), tuple(leaves),
                                 mat=-1, shininess=int(m.shininess),
                                 mesh=mesh_idx), m))

    # material table: dedupe identical materials
    mat_list: list = []
    mat_index: Dict[api.Material, int] = {}
    final_objects = []
    for oir, m in objects:
        if m not in mat_index:
            mat_index[m] = len(mat_list)
            mat_list.append(m)
        final_objects.append(oir._replace(mat=mat_index[m]))

    materials = np.zeros((max(len(mat_list), 1), MAT_PARAM_W), np.float32)
    for i, m in enumerate(mat_list):
        materials[i, 0:3] = m.albedo
        materials[i, 3] = m.ka
        materials[i, 4] = m.kd
        materials[i, 5] = m.ks
        materials[i, 6:9] = m.specular_color

    light_kinds = []
    lights = np.zeros((max(len(scene.lights), 1), LIGHT_PARAM_W), np.float32)
    for i, l in enumerate(scene.lights):
        if isinstance(l, PointLight):
            light_kinds.append(LIGHT_POINT)
            lights[i, 0:3] = l.position
            lights[i, 3:6] = l.color
            lights[i, 6] = l.radius
        elif isinstance(l, DirectionalLight):
            light_kinds.append(LIGHT_DIRECTIONAL)
            d = np.asarray(l.direction, np.float64)
            d = d / np.sqrt(np.dot(d, d))
            lights[i, 0:3] = d.astype(np.float32)
            lights[i, 3:6] = l.color
        else:
            raise TypeError(f"unknown light: {type(l).__name__}")

    params = {
        "leaf_params": (np.stack(leaf_rows) if leaf_rows
                        else np.zeros((1, LEAF_PARAM_W), np.float32)),
        "node_params": (np.asarray(node_k, np.float32).reshape(-1, 1)
                        if node_k else np.zeros((1, 1), np.float32)),
        "materials": materials,
        "lights": lights,
        "ambient": np.asarray(scene.ambient, np.float32),
    }
    for i, tbl in enumerate(mesh_tables):
        for key, arr in tbl.arrays.items():
            params[f"mesh{i}_{key}"] = arr

    ir = SceneIR(tuple(final_objects), tuple(light_kinds),
                 n_leaves=len(leaf_rows), n_meshes=len(mesh_tables))
    if mesh_tables:
        ir = (ir, tuple(t.static for t in mesh_tables))
        # keep SceneIR hashable: mesh statics travel alongside
        return SceneWithMeshes(ir[0], ir[1]), params
    return SceneWithMeshes(ir, ()), params


class SceneWithMeshes(NamedTuple):
    """Hashable static scene: SceneIR + per-mesh static grid descriptors."""
    ir: SceneIR
    mesh_static: Tuple
