import time
import numpy as np, jax, jax.numpy as jnp
from surfjax.config import load_config
from surfjax.pipeline.frame import frame_step
from surfjax.core.camera import Intrinsics
from surfjax.api import Camera

scene, camera, settings, _ = load_config("configs/c4_mesh.yaml")
settings = settings.with_(backend="pallas")
intr = camera.intrinsics
fov = 2.0*float(np.degrees(np.arctan(0.5*intr.height/intr.fy)))
camera = Camera(Intrinsics.from_fov(1920,1080,fov), rotation=camera.rotation, position=camera.position)
intr = camera.intrinsics
static, params = scene.freeze()
params = {k: jnp.asarray(v) for k,v in params.items()}
R = jnp.asarray(np.asarray(camera.rotation, np.float32).reshape(9))
pos0 = np.asarray(camera.position, np.float32)
triv = jax.jit(lambda x: (x*2).sum()); x = jnp.ones((8,128)); float(triv(x))
rts=[]
for _ in range(9):
    t0=time.perf_counter(); float(triv(x)); rts.append(time.perf_counter()-t0)
rt=float(np.min(rts)); print("roundtrip", round(rt*1e3,2), "ms")
def timeit(st, label, reps=5):
    @jax.jit
    def step(params, pos):
        fb = frame_step(static, intr, st, params, R, pos)
        return (fb.rgb.mean(), fb.depth.mean(), fb.hit.sum())
    float(step(params, jnp.asarray(pos0))[0])
    ts=[]
    for i in range(reps):
        pos = jnp.asarray(pos0 + np.float32(1e-4)*(i+1))
        t0=time.perf_counter(); float(step(params,pos)[0]); ts.append(time.perf_counter()-t0)
    dt = max(float(np.min(ts))-rt, 1e-9)
    print(f"{label:28s} {dt*1e3:8.2f} ms")
timeit(settings.with_(tile_rows=64), "tile_rows=64 (sub 32)")
timeit(settings.with_(tile_rows=128), "tile_rows=128 (sub 32)")
timeit(settings.with_(tile_rows=64, shadows=False), "64 no shadows")
timeit(settings.with_(tile_rows=128, shadows=False), "128 no shadows")
