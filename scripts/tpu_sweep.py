"""Sweep (tile_size, chunk_size) for full fwd+bwd time on the real chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render.tiled import TiledRenderer

N, W, H = 300_000, 1920, 1088
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
target = jnp.zeros((H, W, 3)) + 0.3


def sync(x):
    _ = np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])
    return x


import ast, os
SWEEP = ast.literal_eval(os.environ.get('GVRT_SWEEP', '[(16, 256), (16, 128), (16, 64)]'))
for ts, g in SWEEP:
    cfg = g3.DEFAULT_CONFIG.replace(tile_size=ts, chunk_size=g)
    r = TiledRenderer(W, H, cfg, impl="pallas")
    r.plan(model, [cam])

    @jax.jit
    def fwd_bwd(m):
        def loss(m):
            return jnp.mean((r.render(m, cam)["rgb"] - target) ** 2)
        return jax.value_and_grad(loss)(m)

    @jax.jit
    def fwd(m):
        return r.render(m, cam)["rgb"]

    try:
        val, grads = fwd_bwd(model)
        sync(grads.means)
        assert np.isfinite(float(val)), val
        t0 = time.time(); reps = 5
        for _ in range(reps):
            sync(fwd_bwd(model)[1].means)
        dt = (time.time() - t0) / reps
        sync(fwd(model))
        t0 = time.time()
        for _ in range(reps):
            sync(fwd(model))
        dtf = (time.time() - t0) / reps
        print(f"ts={ts:3d} g={g:4d} cap={r.capacity}  "
              f"fwd {dtf*1e3:7.1f} ms ({W*H/dtf/1e6:5.1f}M rays/s)  "
              f"fwd+bwd {dt*1e3:7.1f} ms ({W*H/dt/1e6:5.1f}M rays/s)",
              flush=True)
    except Exception as e:
        print(f"ts={ts:3d} g={g:4d} FAILED: {type(e).__name__}: {e}",
              flush=True)
