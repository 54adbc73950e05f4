"""TPU smoke: compile + time the custom-VJP backward on the real chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render.tiled import TiledRenderer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256

model = g3.random_gaussians(jax.random.key(0), N, extent=0.8)
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(RES, RES, 60.0, np.eye(4))
cfg = g3.DEFAULT_CONFIG

renderer = TiledRenderer(RES, RES, cfg, impl="pallas")
renderer.plan(model, [cam])
target = jnp.zeros((RES, RES, 3)) + 0.3

@jax.jit
def loss_and_grad(m):
    def loss(m):
        out = renderer.render(m, cam)
        return jnp.mean((out["rgb"] - target) ** 2)
    return jax.value_and_grad(loss)(m)

t0 = time.time()
val, grads = loss_and_grad(model)
jax.block_until_ready(grads.means)
t1 = time.time()
print(f"fwd+bwd compile+run: {t1-t0:.1f}s loss={float(val):.5f}", flush=True)
print("grad norms: means", float(jnp.linalg.norm(grads.means)),
      "sh_dc", float(jnp.linalg.norm(grads.sh_dc)),
      "quats", float(jnp.linalg.norm(grads.quats)), flush=True)

for _ in range(2):
    val, grads = loss_and_grad(model); jax.block_until_ready(grads.means)
t2 = time.time()
reps = 5
for _ in range(reps):
    val, grads = loss_and_grad(model)
jax.block_until_ready(grads.means)
dt = (time.time() - t2) / reps
print(f"steady fwd+bwd: {dt*1e3:.1f} ms -> {RES*RES/dt/1e6:.2f} Mrays/s", flush=True)
assert np.isfinite(np.asarray(grads.means)).all()
print("OK")
