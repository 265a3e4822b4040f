import time
import numpy as np, jax, jax.numpy as jnp
from surfjax.config import load_config
from surfjax.core.camera import Intrinsics, camera_ray_dirs_dyn
from surfjax.api import Camera
from surfjax.kernels.render_tile import LANES, _split, _mesh_params
from surfjax.kernels.mesh_tile import mesh_candidates
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
H2 = ((H+R-1)//R)*R; W2 = ((W+LANES-1)//LANES)*LANES
ty, tx = H2//R, W2//LANES
rows = jnp.minimum(jnp.arange(H2, dtype=jnp.float32), F32(H-1))
cols = jnp.minimum(jnp.arange(W2, dtype=jnp.float32), F32(W-1))
rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
def tl(a): return a.reshape(ty,R,tx,LANES).transpose(0,2,1,3).reshape(ty*tx*R,LANES)
d = camera_ray_dirs_dyn(intr, Rf, tl(rr), tl(cc))
o = tuple(jnp.broadcast_to(pos0[i], d[0].shape) for i in range(3))
mesh = _split(static)[2]
i, oir = mesh[0]
ms = static.mesh_static[oir.mesh]
tp = jnp.asarray(_mesh_params(params, oir.mesh)["tri_packed"])

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

@jax.jit
def counts_only(o, d):
    cand, counts = mesh_candidates(ms, tp, o, d, settings.t_min, settings.t_max, R)
    return counts.sum()
@jax.jit
def with_gather(o, d):
    cand, counts = mesh_candidates(ms, tp, o, d, settings.t_min, settings.t_max, R)
    return cand.sum(), counts.sum()
timeit(lambda: float(counts_only(o, d)), "counts only (gather DCEd)")
timeit(lambda: float(with_gather(o, d)[0]), "counts + scatter + gather")

from surfjax.core.math import BIG

def cand_ids_variants(o2, d2, t_min, t_max, R, K=1024):
    rows, lanes = o2[0].shape
    tiles = rows // R
    # reuse library code for overlap by calling internals quickly:
    import surfjax.kernels.mesh_tile as mt
    # recompute overlap exactly as mesh_candidates does (copy of logic via
    # monkey capture): easiest is to call mesh_candidates and ignore; here
    # build overlap via its counts? Instead just re-derive overlap cheaply:
    return None

@jax.jit
def v_searchsorted(o, d):
    cand, counts = mesh_candidates(ms, tp, o, d, settings.t_min, settings.t_max, R)
    return counts  # placeholder
