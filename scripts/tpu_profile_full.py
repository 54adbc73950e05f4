"""Segmented timing of the bench-scale pipeline on the real chip.

Times each stage in isolation: binning, forward kernel, full forward,
backward-only (via precomputed cotangent), and full fwd+bwd, plus the
gradient reduction transpose.  Run: python scripts/tpu_profile_full.py [N] [W H]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_forward import forward_tiles
from gvrt_tpu.render.pallas_vjp import _forward_call, _render_bwd
from gvrt_tpu.render.tiled import TiledRenderer, _camera_mats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
H = int(sys.argv[3]) if len(sys.argv) > 3 else 1088

cfg = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, W, H, cfg)
nt = (W // cfg.tile_size) * (H // cfg.tile_size)
print(f"pairs cap {cap}  padded {cap_pad}  chunks {cap_pad // cfg.chunk_size} "
      f"tiles {nt}", flush=True)
rays = jax.device_put(binning.tile_rays(cam, cfg))


def _sync(out):
    # axon's block_until_ready is unreliable; a D2H read forces completion
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(jax.numpy.ravel(leaf)[0])
    return out


def timeit(name, fn, reps=5):
    out = _sync(fn())
    t0 = time.time()
    for _ in range(reps):
        out = _sync(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:28s}: {dt * 1e3:8.2f} ms", flush=True)
    return out, dt


bin_jit = jax.jit(lambda a: binning.bin_gaussians(a, w2c, proj, W, H, cfg,
                                                  cap, cap_pad))
binned, dt_bin = timeit("bin", lambda: bin_jit(act))

fwd_jit = jax.jit(lambda b: forward_tiles(b, rays, cfg))
_, dt_fwd = timeit("fwd kernel (no resid)", lambda: fwd_jit(binned), reps=5)

fwdres_jit = jax.jit(lambda b: _forward_call(
    cfg, False, True, b.chunks, rays, b.chunk_tile))
(acc, tin), dt_fr = timeit("fwd kernel (resid)", lambda: fwdres_jit(binned))

bar_acc = jnp.ones_like(acc)
bwd_jit = jax.jit(lambda b, tin, bar: _render_bwd(
    cfg, False, (b.chunks, rays, b.chunk_tile, tin), bar))
_, dt_bwd = timeit("bwd kernel", lambda: bwd_jit(binned, tin, bar_acc))

# full value_and_grad (includes binning fwd+bwd, grad reduction, untile, loss)
target = jnp.zeros((H, W, 3)) + 0.3
r = TiledRenderer(W, H, cfg, capacity=(cap, cap_pad), impl="pallas")

@jax.jit
def fwd_bwd(m):
    def loss(m):
        out = r.render(m, cam)
        return jnp.mean((out["rgb"] - target) ** 2)
    return jax.value_and_grad(loss)(m)

(_, grads), dt_full = timeit("full fwd+bwd", lambda: fwd_bwd(model))

@jax.jit
def fwd_only(m):
    return r.render(m, cam)["rgb"]

_, dt_fo = timeit("full fwd only", lambda: fwd_only(model))

rays_n = W * H
print(f"\nrays/s: fwd-kernel {rays_n/dt_fwd/1e6:.1f}M  full-fwd "
      f"{rays_n/dt_fo/1e6:.1f}M  fwd+bwd {rays_n/dt_full/1e6:.1f}M",
      flush=True)
print(f"unaccounted in full fwd+bwd: "
      f"{(dt_full - dt_bin - dt_fr - dt_bwd) * 1e3:.2f} ms "
      f"(bin bwd + grad reduce + loss)", flush=True)
real_chunks = int(np.asarray(binned.chunk_tile < nt).sum())
print(f"real chunks {real_chunks} / {cap_pad // cfg.chunk_size}", flush=True)
