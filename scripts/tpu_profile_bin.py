"""Time individual binning stages on the real chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.binning import _tile_ranges, _scatter_cummax_fill
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
n = N


def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:26s}: {(time.time() - t0) / reps * 1e3:8.2f} ms", flush=True)
    return out


(tx0, ty0, tx1, ty1), valid, depth, (nx, ny) = timeit(
    "tile_ranges", lambda a: _tile_ranges(a, w2c, proj, W, H, cfg), act)
nx, ny = int(nx), int(ny)
num_tiles = nx * ny

rect_w = tx1 - tx0 + 1
counts = jnp.where(valid, rect_w * (ty1 - ty0 + 1), 0)
offsets = jnp.cumsum(counts) - counts

pair_g = timeit("cummax_fill", lambda o, v: _scatter_cummax_fill(
    cap, o, jnp.arange(n, dtype=jnp.int32), v), offsets,
    valid & (counts > 0))

p_idx = jnp.arange(cap, dtype=jnp.int32)
total = offsets[-1] + counts[-1]
in_range = p_idx < total
j = p_idx - offsets[pair_g]
tile_x = tx0[pair_g] + j % rect_w[pair_g]
tile_y = ty0[pair_g] + j // rect_w[pair_g]
tile_id = jnp.where(in_range, tile_y * nx + tile_x, num_tiles)

tile_bits = max(1, (num_tiles + 1).bit_length())
depth_bits = min(31 - tile_bits, 24)
key = (tile_id << depth_bits) | jnp.where(in_range, 0, 0)

key_sorted, g_sorted, p_sorted = timeit(
    "sort 3-operand", lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1),
    key, pair_g, p_idx)

timeit("sort key_val (invert)", lambda a, b: jax.lax.sort_key_val(a, b),
       p_sorted, p_idx)

tile_sorted = key_sorted >> depth_bits
tc = timeit("tile_counts scatter-add", lambda ts: jnp.zeros(
    (num_tiles + 1,), jnp.int32).at[ts].add(
    jnp.where(ts < num_tiles, 1, 0)), tile_sorted)

pair_gauss = jnp.where(jnp.arange(cap_pad) < cap,
                       jnp.concatenate([g_sorted, jnp.zeros(
                           (cap_pad - cap,), jnp.int32)]), n)
pair_sorted = jnp.arange(cap, dtype=jnp.int32)
pair_dest = jnp.clip(jnp.arange(cap, dtype=jnp.int32), 0, cap_pad)

rows64 = jnp.ones((n + 1, 64), jnp.float32)
timeit("chunked_gather fwd", lambda r, pg: chunked_gather(
    g, r, pg, pair_sorted, pair_dest, offsets, counts), rows64, pair_gauss)

bar = jnp.ones((cap_pad // g, 64, g), jnp.float32)
timeit("chunked_gather bwd", lambda b: jax.vjp(
    lambda r: chunked_gather(g, r, pair_gauss, pair_sorted, pair_dest, offsets, counts),
    rows64)[1](b), bar, reps=5)

full = timeit("bin_gaussians total", lambda a: binning.bin_gaussians(
    a, w2c, proj, W, H, cfg, cap, cap_pad), act, reps=5)
