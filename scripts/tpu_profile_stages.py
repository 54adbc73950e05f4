"""Stage-by-stage compile + run timing on the real chip, incremental output.

Each stage prints compile seconds and per-iteration milliseconds as soon as
it is measured (unbuffered), so a slow/hung stage still leaves the earlier
numbers on disk.  Select stages via argv to bound wall-clock:

    python scripts/tpu_profile_stages.py [bin fwd fwdres bwd reduce full fwdonly] [-- N W H]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("GVRT_JAX_CACHE", "0") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_forward import forward_tiles
from gvrt_tpu.render.pallas_vjp import _forward_call, _render_bwd
from gvrt_tpu.render.tiled import TiledRenderer, _camera_mats

args = [a for a in sys.argv[1:]]
if "--" in args:
    i = args.index("--")
    nums = args[i + 1:]
    args = args[:i]
else:
    nums = []
stages = set(args) or {"bin", "fwd", "fwdres", "bwd", "reduce", "full",
                       "fwdonly"}
N = int(nums[0]) if len(nums) > 0 else 300_000
W = int(nums[1]) if len(nums) > 1 else 1920
H = int(nums[2]) if len(nums) > 2 else 1088

cfg = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, W, H, cfg)
nt = (W // cfg.tile_size) * (H // cfg.tile_size)
print(f"pairs cap {cap}  padded {cap_pad}  chunks {cap_pad // cfg.chunk_size}"
      f"  tiles {nt}", flush=True)
rays = jax.device_put(binning.tile_rays(cam, cfg))


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    return out


def timeit(name, fn, reps=5):
    t0 = time.time()
    out = _sync(fn())
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = _sync(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:26s}: compile {tc:7.1f}s   run {dt * 1e3:8.2f} ms",
          flush=True)
    return out, dt


binned = None
if stages & {"bin", "fwd", "fwdres", "bwd", "reduce"}:
    bin_jit = jax.jit(lambda a: binning.bin_gaussians(
        a, w2c, proj, W, H, cfg, cap, cap_pad))
    binned, dt_bin = timeit("bin", lambda: bin_jit(act))

if "fwd" in stages:
    fwd_jit = jax.jit(lambda b: forward_tiles(b, rays, cfg))
    _, dt_fwd = timeit("fwd kernel (no resid)", lambda: fwd_jit(binned))
    print(f"  -> fwd-kernel rays/s {W * H / dt_fwd / 1e6:.1f}M", flush=True)

acc = tin = None
if stages & {"fwdres", "bwd"}:
    fwdres_jit = jax.jit(lambda b: _forward_call(
        cfg, False, True, b.chunks, rays, b.chunk_tile))
    (acc, tin), dt_fr = timeit("fwd kernel (resid)",
                               lambda: fwdres_jit(binned))

if "bwd" in stages:
    bar_acc = jnp.ones_like(acc)
    bwd_jit = jax.jit(lambda b, tin, bar: _render_bwd(
        cfg, False, (b.chunks, rays, b.chunk_tile, tin), bar))
    _, dt_bwd = timeit("bwd kernel", lambda: bwd_jit(binned, tin, bar_acc))

if "reduce" in stages:
    from gvrt_tpu.render.param_grads import _gather_bwd
    bar = jnp.ones_like(binned.chunks)
    res = (N + 1, binned.pair_gauss, binned.pair_pos,
           binned.gauss_offsets, binned.gauss_counts)
    red_jit = jax.jit(lambda bar: _gather_bwd(cfg.chunk_size, res, bar))
    _, dt_red = timeit("param-grad reduce", lambda: red_jit(bar))

if stages & {"full", "fwdonly"}:
    target = jnp.zeros((H, W, 3)) + 0.3
    r = TiledRenderer(W, H, cfg, capacity=(cap, cap_pad), impl="pallas")
    if "full" in stages:
        @jax.jit
        def fwd_bwd(m):
            def loss(m):
                out = r.render(m, cam)
                return jnp.mean((out["rgb"] - target) ** 2)
            return jax.value_and_grad(loss)(m)
        _, dt_full = timeit("full fwd+bwd", lambda: fwd_bwd(model))
        print(f"  -> fwd+bwd rays/s {W * H / dt_full / 1e6:.1f}M", flush=True)
    if "fwdonly" in stages:
        @jax.jit
        def fwd_only(m):
            return r.render(m, cam)["rgb"]
        _, dt_fo = timeit("full fwd only", lambda: fwd_only(model))
        print(f"  -> full-fwd rays/s {W * H / dt_fo / 1e6:.1f}M", flush=True)
print("done", flush=True)
