"""TPU smoke test: compile + run the fused Pallas forward on the real chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render.tiled import render_image_tiled

print("backend:", jax.default_backend(), flush=True)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256

model = g3.random_gaussians(jax.random.key(0), N, extent=0.8)
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(RES, RES, 60.0, np.eye(4))
cfg = g3.DEFAULT_CONFIG

t0 = time.time()
out = render_image_tiled(model, cam, cfg, impl="pallas")
jax.block_until_ready(out["rgb"])
t1 = time.time()
print(f"pallas compile+run: {t1-t0:.1f}s, pairs={int(out['num_pairs'])}, overflow={int(out['overflow'])}", flush=True)

# steady-state timing
for _ in range(2):
    out = render_image_tiled(model, cam, cfg, impl="pallas")
    jax.block_until_ready(out["rgb"])
t2 = time.time()
reps = 5
for _ in range(reps):
    out = render_image_tiled(model, cam, cfg, impl="pallas")
    jax.block_until_ready(out["rgb"])
t3 = time.time()
dt = (t3 - t2) / reps
rays = RES * RES
print(f"steady: {dt*1e3:.1f} ms/frame -> {rays/dt/1e6:.2f} Mrays/s", flush=True)

# compare against scan reference on-chip
out_ref = render_image_tiled(model, cam, cfg, impl="scan")
jax.block_until_ready(out_ref["rgb"])
a, b = np.asarray(out["rgb"]), np.asarray(out_ref["rgb"])
print("max |pallas - scan| rgb:", float(np.abs(a - b).max()),
      " T:", float(np.abs(np.asarray(out["transmittance"]) - np.asarray(out_ref["transmittance"])).max()),
      flush=True)
print("mean hits:", float(np.asarray(out["hit_count"]).mean()))
g3.io.save_png("/tmp/tpu_smoke.png", a)
print("OK")
