"""Time individual binning sub-stages of the CURRENT pipeline on the chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.binning import (_pair_sphere_cull, _scatter_cummax_fill,
                                     _tile_ranges)
from gvrt_tpu.render.param_grads import chunked_gather
from gvrt_tpu.render.tiled import _camera_mats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
W, H = 1920, 1088
cfg = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, W, H, cfg)
g = cfg.chunk_size
print(f"cap {cap} cap_pad {cap_pad}", flush=True)


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    return out


def timeit(name, f, *args, reps=5):
    f = jax.jit(f)
    sync(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = sync(f(*args))
    print(f"{name:26s}: {(time.time() - t0) / reps * 1e3:8.2f} ms", flush=True)
    return out


tr = timeit("tile_ranges", lambda a: _tile_ranges(a, w2c, proj, W, H, cfg),
            act)
(tx0, ty0, tx1, ty1), valid, depth, (nx, ny), cs, r_s = tr
num_tiles = int(nx) * int(ny)
n = N

rect_w = tx1 - tx0 + 1
counts = jnp.where(valid, rect_w * (ty1 - ty0 + 1), 0)
offsets = jnp.cumsum(counts) - counts

pair_g = timeit("cummax_fill", lambda o, v: _scatter_cummax_fill(
    cap, o, jnp.arange(n, dtype=jnp.int32), v), offsets,
    valid & (counts > 0))


def expand(pair_g, tx0, ty0, rect_w, offsets, depth, cs, r_s):
    f32 = jnp.float32
    off_hi = (offsets >> 12).astype(f32)
    off_lo = (offsets & 0xFFF).astype(f32)
    exp_tab = jnp.stack(
        [tx0.astype(f32), ty0.astype(f32), rect_w.astype(f32),
         off_hi, off_lo, depth,
         cs[:, 0], cs[:, 1], cs[:, 2], r_s], axis=1)
    exp = exp_tab[pair_g]
    e_tx0 = exp[:, 0].astype(jnp.int32)
    e_ty0 = exp[:, 1].astype(jnp.int32)
    e_rw = exp[:, 2].astype(jnp.int32)
    e_off = (exp[:, 3].astype(jnp.int32) << 12) | exp[:, 4].astype(jnp.int32)
    p_idx = jnp.arange(cap, dtype=jnp.int32)
    j = p_idx - e_off
    tile_x = e_tx0 + j % e_rw
    tile_y = e_ty0 + j // e_rw
    fine = _pair_sphere_cull(tile_x, tile_y, exp[:, 6], exp[:, 7],
                             exp[:, 8], exp[:, 9], proj[0, 0], proj[1, 1],
                             W, H, cfg.tile_size)
    return tile_x, tile_y, fine


timeit("expand+cull", expand, pair_g, tx0, ty0, rect_w, offsets, depth, cs,
       r_s)

# the big sort
key = jax.random.randint(jax.random.key(1), (cap,), 0, 2 ** 30,
                         dtype=jnp.int32)
pg = jax.random.randint(jax.random.key(2), (cap,), 0, n, dtype=jnp.int32)
p_idx = jnp.arange(cap, dtype=jnp.int32)
timeit("sort3 (key+2 payload)", lambda k, a, b: jax.lax.sort(
    (k, a, b), num_keys=1), key, pg, p_idx)
timeit("sort2 (key+1 payload)", lambda k, a: jax.lax.sort(
    (k, a), num_keys=1), key, pg)
timeit("sort1 (key only)", lambda k: jax.lax.sort((k,), num_keys=1), key)

ts = jnp.sort(key) >> 13
timeit("searchsorted", lambda t: jnp.searchsorted(
    t, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
    method="scan_unrolled"), ts)

# chunked gather at scale
rows64 = jnp.concatenate([jnp.zeros((n + 1, 16)), jnp.zeros((n + 1, 48))], 1)
pair_gauss = jax.random.randint(jax.random.key(3), (cap_pad,), 0, n,
                                dtype=jnp.int32)
dest = jnp.arange(cap, dtype=jnp.int32)
timeit("chunked_gather fwd", lambda r, pgs: chunked_gather(
    g, r, pgs, p_idx, dest, offsets, counts), rows64, pair_gauss)


def gather_vjp(r, pgs, bar):
    _, vjp = jax.vjp(
        lambda rr: chunked_gather(g, rr, pgs, p_idx, dest, offsets, counts),
        r)
    return vjp(bar)


bar = jnp.ones((cap_pad // g, g, 64), jnp.float32)
timeit("chunked_gather vjp", gather_vjp, rows64, pair_gauss, bar)

# full bin for reference
timeit("bin_gaussians (full)", lambda a: binning.bin_gaussians(
    a, w2c, proj, W, H, cfg, cap, cap_pad), act, reps=5)
