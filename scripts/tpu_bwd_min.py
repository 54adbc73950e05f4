"""Minimal TPU repro: residual forward then backward kernel, tiny scene."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_vjp import _forward_call, render_tiles_ad
from gvrt_tpu.render.tiled import _camera_mats

cfg = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)
model = g3.random_gaussians(jax.random.key(0), 256, extent=0.7)
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, 16, 16, cfg)
b = binning.bin_gaussians(act, w2c, proj, 16, 16, cfg, cap, cap_pad)
rays = binning.tile_rays(cam, cfg)
print("chunks:", b.geom.shape[0], "tiles:", rays.shape[0], flush=True)

print("step 1: plain forward", flush=True)
acc = render_tiles_ad(cfg, False, b.geom, b.sh_r, b.sh_g, b.sh_b, rays,
                      b.chunk_tile, b.chunk_first)
jax.block_until_ready(acc); print("  ok", float(acc[:rays.shape[0]].sum()), flush=True)

print("step 2: forward with residuals", flush=True)
acc2, tin = jax.jit(lambda *a: _forward_call(cfg, False, True, *a))(
    b.geom, b.sh_r, b.sh_g, b.sh_b, rays, b.chunk_tile, b.chunk_first)
jax.block_until_ready(tin); print("  ok, tin mean", float(tin.mean()), flush=True)
np.testing.assert_allclose(np.asarray(acc2), np.asarray(acc), atol=1e-6)
print("  resid fwd matches plain fwd", flush=True)

print("step 3: backward", flush=True)
def f(geom, shr, shg, shb):
    acc = render_tiles_ad(cfg, False, geom, shr, shg, shb, rays,
                          b.chunk_tile, b.chunk_first)
    return jnp.sum(acc[:rays.shape[0]] ** 2)
g = jax.jit(jax.grad(f, argnums=(0, 1)))(b.geom, b.sh_r, b.sh_g, b.sh_b)
jax.block_until_ready(g)
print("  ok, grad norms", float(jnp.linalg.norm(g[0])),
      float(jnp.linalg.norm(g[1])), flush=True)
print("DONE")
