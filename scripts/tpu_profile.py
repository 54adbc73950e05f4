"""Profile binning vs kernel vs full pipeline on the real chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_forward import forward_tiles
from gvrt_tpu.render.tiled import _camera_mats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256

model = g3.random_gaussians(jax.random.key(0), N, extent=0.8)
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(RES, RES, 60.0, np.eye(4))
cfg = g3.DEFAULT_CONFIG

act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, RES, RES, cfg)
print(f"capacity {cap} padded {cap_pad} chunks {cap_pad//cfg.chunk_size}", flush=True)
rays = binning.tile_rays(cam, cfg)
rays = jax.device_put(rays)

def timeit(name, fn, reps=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return out, dt

binned, dt_bin = timeit("bin_gaussians", lambda: binning.bin_gaussians(
    act, w2c, proj, RES, RES, cfg, cap, cap_pad))
_, dt_fwd = timeit("forward_tiles", lambda: forward_tiles(binned, rays, cfg))

@jax.jit
def full(act, rays):
    b = binning.bin_gaussians(act, w2c, proj, RES, RES, cfg, cap, cap_pad)
    return forward_tiles(b, rays, cfg)

_, dt_full = timeit("full jit (bin+fwd)", lambda: full(act, rays))
r = RES * RES
print(f"rays/s: kernel-only {r/dt_fwd/1e6:.2f}M  full {r/dt_full/1e6:.2f}M", flush=True)
print("real chunks:", int(np.asarray(binned.chunk_tile < (RES//cfg.tile_size)**2).sum()))
