"""A/B the fused forward kernel variants on the real chip (amortized).

Variants: prefix cumsum (Hillis-Steele concat) vs prefix matmul (strict
lower triangular).  Chained K frames inside one jit.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_forward import forward_tiles
from gvrt_tpu.render.tiled import _camera_mats

N = 300_000
W, H = 1920, 1088
K = 8
base = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, W, H, base)
rays = jax.device_put(binning.tile_rays(cam, base))
binned = jax.jit(lambda a: binning.bin_gaussians(
    a, w2c, proj, W, H, base, cap, cap_pad))(act)
binned = jax.tree.map(lambda x: jax.device_put(np.asarray(x)), binned)


def sync(x):
    _ = np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])
    return x


def bench(cfg, label):
    @jax.jit
    def run(chunks):
        def body(i, carry):
            chunks, s = carry
            b2 = binned._replace(chunks=chunks)
            acc = forward_tiles(b2, rays, cfg)
            out = acc[:, 0, :].sum()
            chunks = chunks + 0.0 * out
            return (chunks, s + out)
        return jax.lax.fori_loop(0, K, body, (chunks, jnp.float32(0.0)))
    t0 = time.time()
    sync(run(binned.chunks))
    tc = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(run(binned.chunks))
        best = min(best, time.time() - t0)
    per = (best - 0.033) / K * 1e3
    print(f"{label:28s}: compile {tc:6.1f}s  {per:7.2f} ms/frame "
          f"({W*H/per*1e3/1e6:.1f} Mrays/s)", flush=True)


bench(base, "fwd prefix=cumsum")
bench(base.replace(prefix_matmul=True), "fwd prefix=matmul")
print("done", flush=True)
