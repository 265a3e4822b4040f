import numpy as np, jax, jax.numpy as jnp
from surfjax.config import load_config
from surfjax.core.camera import Intrinsics, camera_ray_dirs_dyn
from surfjax.api import Camera
from surfjax.kernels.render_tile import LANES, _split, render_tile_kernel, _mesh_params
from surfjax.kernels.mesh_tile import mesh_candidates, PACKET_K
from surfjax.core.math import F32

scene, camera, settings, _ = load_config("configs/c4_mesh.yaml")
settings = settings.with_(backend="pallas", tile_rows=64)
intr = camera.intrinsics
fov = 2.0*float(np.degrees(np.arctan(0.5*intr.height/intr.fy)))
camera = Camera(Intrinsics.from_fov(1920,1080,fov), rotation=camera.rotation, position=camera.position)
intr = camera.intrinsics
static, params = scene.freeze()
params = {k: jnp.asarray(v) for k,v in params.items()}
Rf = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
pos0 = np.asarray(camera.position, np.float32)

H, W = 1080, 1920
R = settings.tile_rows
H2 = ((H + R - 1)//R)*R; W2 = ((W + LANES - 1)//LANES)*LANES
ty, tx = H2//R, W2//LANES
rows = jnp.minimum(jnp.arange(H2, dtype=jnp.float32), F32(H-1))
cols = jnp.minimum(jnp.arange(W2, dtype=jnp.float32), F32(W-1))
rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
def tl(a): return a.reshape(ty, R, tx, LANES).transpose(0,2,1,3).reshape(ty*tx*R, LANES)
rr_t, cc_t = tl(rr), tl(cc)
d = camera_ray_dirs_dyn(intr, Rf, rr_t, cc_t)
o = tuple(jnp.broadcast_to(pos0[i], rr_t.shape) for i in range(3))

mesh = _split(static)[2]
i, oir = mesh[0]
ms = static.mesh_static[oir.mesh]
tp = jnp.asarray(_mesh_params(params, oir.mesh)["tri_packed"])

# PRIMARY candidates
cand, counts = mesh_candidates(ms, tp, o, d, settings.t_min, settings.t_max, R)
c = np.asarray(counts)
print("PRIMARY tiles:", c.size, "counts: max", c.max(), "mean", c.mean().round(1), "over K:", (c>PACKET_K).sum())

# primary trace to get hit points (use kernel)
lp = params["leaf_params"]; npar = params["node_params"]
t, obj, n, ao, hit_f = render_tile_kernel(static, settings, lp, npar, o, d)
t_s = jnp.where(hit_f > 0.5, t, 0.0)
p = tuple(o[k] + t_s*d[k] for k in range(3))
eps = F32(settings.shadow_eps)
p_off = tuple(p[k] + n[k]*eps for k in range(3))
lrow = np.asarray(params["lights"])[0]
lv = tuple(lrow[k] - p_off[k] for k in range(3))
dist = jnp.sqrt(lv[0]**2 + lv[1]**2 + lv[2]**2)
l = tuple(lv[k]/dist for k in range(3))
dist_eff = jnp.where(hit_f > 0.5, dist, 0.0)
cand2, counts2 = mesh_candidates(ms, tp, p_off, l, settings.shadow_eps, dist_eff, R)
c2 = np.asarray(counts2)
print("SHADOW tiles:", c2.size, "counts: max", c2.max(), "mean", c2.mean().round(1), "over K:", (c2>PACKET_K).sum(), "zero:", (c2==0).sum())
print("hit frac:", float(hit_f.mean()))

import time, functools
from surfjax.kernels.mesh_tile import mesh_tile_kernel
from surfjax.kernels.render_tile import trace_rays_kernel

triv = jax.jit(lambda x: (x*2).sum()); xx = jnp.ones((8,128)); float(triv(xx))
rts=[]
for _ in range(9):
    t0=time.perf_counter(); float(triv(xx)); rts.append(time.perf_counter()-t0)
rt=float(np.min(rts)); print("rt", round(rt*1e3,2))

def timeit(fn, label, reps=5):
    fn()
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    print(f"{label:30s} {(min(ts)-rt)*1e3:8.2f} ms")

soft_k = jnp.full_like(dist_eff, settings.soft_shadow_k)

@jax.jit
def f_cand():
    c, n = mesh_candidates(ms, tp, p_off, l, settings.shadow_eps, dist_eff, R)
    return c.sum(), n.sum()
@jax.jit
def f_meshany():
    t_m, _, _ = mesh_tile_kernel(ms, settings, tp, p_off, l, dist_eff, any_hit=True)
    return t_m.sum()
@jax.jit
def f_k2():
    vis = trace_rays_kernel(static, settings, lp, npar, p_off, l, dist_eff, soft_k)
    return vis.sum()
@jax.jit
def f_primary():
    t_m, ns, ng = mesh_tile_kernel(ms, settings, tp, o, d, settings.t_max)
    return t_m.sum()
@jax.jit
def f_k1():
    t,obj,n2,ao,h = render_tile_kernel(static, settings, lp, npar, o, d)
    return t.sum()

#timeit(lambda: float(f_cand()[0]), "mesh_candidates (shadow)")
timeit(lambda: float(f_meshany()), "mesh any-hit kernel (incl cand)")
timeit(lambda: float(f_k2()), "K2 analytic vis")
timeit(lambda: float(f_primary()), "mesh primary kernel (incl cand)")
timeit(lambda: float(f_k1()), "K1 march")

from surfjax.kernels.mesh_tile import PACKET_K as K
import surfjax.kernels.mesh_tile as mt

def cand_pieces(o2, d2, t_min, t_max, R):
    # replicate mesh_candidates, returning intermediates
    import jax.numpy as jnp
    rows, lanes = o2[0].shape
    tiles = rows // R
    bmin = jnp.asarray(ms.bbox_min, jnp.float32)
    bext = jnp.asarray([ms.cell_size[0]*ms.nx, ms.cell_size[1]*ms.ny, ms.cell_size[2]*ms.nz], jnp.float32)
    bmax = bmin + bext
    t_lo = jnp.full_like(o2[0], t_min)
    t_hi = jnp.asarray(t_max, jnp.float32) * jnp.ones_like(o2[0])
    from surfjax.core.math import BIG, F32
    for ax in range(3):
        dz = d2[ax] == F32(0.0)
        inv = F32(1.0)/jnp.where(dz, F32(1.0), d2[ax])
        ta = (bmin[ax]-o2[ax])*inv; tb = (bmax[ax]-o2[ax])*inv
        tn = jnp.minimum(ta,tb); tf = jnp.maximum(ta,tb)
        in_slab = (o2[ax]>bmin[ax])&(o2[ax]<bmax[ax])
        tn = jnp.where(dz, jnp.where(in_slab,-BIG,BIG), tn)
        tf = jnp.where(dz, jnp.where(in_slab,BIG,-BIG), tf)
        t_lo = jnp.maximum(t_lo,tn); t_hi = jnp.minimum(t_hi,tf)
    return t_lo, t_hi

@jax.jit
def f_counts_only():
    c, n = mesh_candidates(ms, tp, p_off, l, settings.shadow_eps, dist_eff, R)
    return n.sum()   # same graph; XLA may DCE the gather

@jax.jit
def f_scatter_nogather():
    # hack: recompute counts + cand ids but skip the row gather
    cand, counts = mesh_candidates(ms, tp, p_off, l, settings.shadow_eps, dist_eff, R)
    return counts.sum()

timeit(lambda: float(f_counts_only()), "cand: counts only (DCE gather)")
