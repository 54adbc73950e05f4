"""Amortized (chained-on-device) truncation profile of bin_gaussians.

Times bin_gaussians truncated after each pipeline stage, with K iterations
chained inside one jit to amortize the ~33 ms axon dispatch latency.  The
stage bodies MIRROR binning.bin_gaussians (same helpers where importable);
if binning.py evolves, re-sync this script before trusting deltas.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.binning import (_tile_ranges, _scatter_cummax_fill,
                                     _pair_ellipsoid_cull)
from gvrt_tpu.render.param_grads import chunked_gather
from gvrt_tpu.render.tiled import _camera_mats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
W, H = 1920, 1088
K = 8
cfg = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
capacity, capacity_padded = binning.plan_capacity(act, w2c, proj, W, H, cfg)
print(f"cap {capacity} cap_pad {capacity_padded}", flush=True)


def staged_bin(act, stage):
    """bin_gaussians truncated after `stage`; returns a scalar probe."""
    g = cfg.chunk_size
    n = act.means.shape[0]
    width, height = W, H
    (tx0, ty0, tx1, ty1), valid, depth, (nx, ny), cs, vmat = _tile_ranges(
        act, w2c, proj, width, height, cfg)
    num_tiles = nx * ny
    if stage == "ranges":
        return tx0.sum() + ty1.sum() + valid.sum()

    rect_w = tx1 - tx0 + 1
    counts = jnp.where(valid, rect_w * (ty1 - ty0 + 1), 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    tile_bits = max(1, (num_tiles + 1).bit_length())
    depth_bits = min(31 - tile_bits, 24)
    valid_depth = jnp.where(valid, depth, jnp.nan)
    dmin = jnp.nanmin(valid_depth)
    dmax = jnp.nanmax(valid_depth)
    dscale = (2.0 ** depth_bits - 2.0) / jnp.maximum(dmax - dmin, 1e-9)
    depth_q = jnp.clip(
        (jnp.maximum(depth - dmin, 0.0) * dscale).astype(jnp.int32),
        0, 2 ** depth_bits - 1)
    if stage == "counts":
        return total + depth_q.sum()

    pair_g = _scatter_cummax_fill(capacity, offsets,
                                  jnp.arange(n, dtype=jnp.int32),
                                  valid & (counts > 0))
    if stage == "pairfill":
        return pair_g.sum()

    f32 = jnp.float32
    off_hi = (offsets >> 12).astype(f32)
    off_lo = (offsets & 0xFFF).astype(f32)
    exp_tab = jnp.stack(
        [tx0.astype(f32), ty0.astype(f32), rect_w.astype(f32),
         off_hi, off_lo, depth_q.astype(f32),
         cs[0], cs[1], cs[2]], axis=1)
    exp_tab = jnp.concatenate([exp_tab, jnp.stack(vmat, axis=1)], axis=1)
    exp = exp_tab[pair_g]
    e_tx0 = exp[:, 0].astype(jnp.int32)
    e_ty0 = exp[:, 1].astype(jnp.int32)
    e_rw = exp[:, 2].astype(jnp.int32)
    e_off = (exp[:, 3].astype(jnp.int32) << 12) | exp[:, 4].astype(jnp.int32)
    e_dq = exp[:, 5].astype(jnp.int32)
    p_idx = jnp.arange(capacity, dtype=jnp.int32)
    in_range = p_idx < total
    j = p_idx - e_off
    tile_x = e_tx0 + j % e_rw
    tile_y = e_ty0 + j // e_rw
    fine = _pair_ellipsoid_cull(tile_x, tile_y, exp[:, 6], exp[:, 7],
                                exp[:, 8], exp[:, 9:18], proj[0, 0],
                                proj[1, 1], width, height, cfg.tile_size)
    tile_id = jnp.where(in_range & fine, tile_y * nx + tile_x, num_tiles)
    key = (tile_id << depth_bits) | jnp.where(in_range, e_dq, 0)
    if stage == "expand":
        return key.sum()

    key_sorted, g_sorted, p_sorted = jax.lax.sort(
        (key, pair_g, p_idx), num_keys=1)
    tile_sorted = key_sorted >> depth_bits
    if stage == "sort":
        return tile_sorted.sum() + g_sorted.sum()

    tile_edges = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled").astype(jnp.int32)
    tile_counts = jnp.diff(
        jnp.concatenate([tile_edges, jnp.asarray([capacity], jnp.int32)]))
    starts = tile_edges
    padded_counts = ((tile_counts + g - 1) // g) * g
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts)])[:-1]
    padded_total = padded_starts[num_tiles]
    num_chunks = capacity_padded // g
    chunk_arr = jnp.zeros((num_chunks,), jnp.int32)
    chunk_arr = chunk_arr.at[jnp.where(tile_counts[:num_tiles] > 0,
                                       padded_starts[:num_tiles] // g,
                                       num_chunks)].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    chunk_arr = chunk_arr.at[jnp.minimum(padded_total // g,
                                         num_chunks - 1)].max(num_tiles)
    chunk_tile = jax.lax.cummax(chunk_arr)
    if stage == "edges":
        return chunk_tile.sum() + tile_counts.sum()

    diff = padded_starts - starts
    fill = jnp.zeros((capacity,), jnp.int32)
    fill = fill.at[tile_edges[:num_tiles]].max(diff[:num_tiles], mode="drop")
    delta = jax.lax.cummax(fill)
    keep = tile_sorted < num_tiles
    dest_drop = jnp.where(keep, p_idx + delta, capacity_padded)
    pair_gauss = jnp.full((capacity_padded,), n, jnp.int32)
    pair_gauss = pair_gauss.at[dest_drop].set(g_sorted, mode="drop")
    if stage == "place":
        return pair_gauss.sum()

    m_mat = act.inv_scales[:, :, None] * jnp.swapaxes(act.rotmats, 1, 2)
    b_vec = jnp.einsum("nij,nj->ni", m_mat, act.means,
                       preferred_element_type=jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32).reshape(1, 9)
    geom_rows = jnp.concatenate([
        jnp.concatenate([m_mat.reshape(n, 9), eye], 0),
        jnp.concatenate([b_vec, jnp.zeros((1, 3))], 0),
        jnp.concatenate([act.densities[:, None], jnp.zeros((1, 1))], 0),
        jnp.zeros((n + 1, 3), jnp.float32),
    ], axis=1)
    sh_all = jnp.concatenate([act.sh_coeffs,
                              jnp.zeros((1, 16, 3))], axis=0)
    rows64 = jnp.concatenate(
        [geom_rows, sh_all[..., 0], sh_all[..., 1], sh_all[..., 2]], axis=1)
    rows64 = jax.lax.optimization_barrier(rows64)
    pair_pos = jnp.full((capacity,), capacity_padded, jnp.int32)
    pair_pos = pair_pos.at[p_sorted].set(dest_drop, mode="drop")
    chunks64 = chunked_gather(g, rows64, pair_gauss, pair_pos,
                              offsets, counts)
    return chunks64[:, :, 0].sum()


def sync(x):
    _ = np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])
    return x


def chained(stage):
    @jax.jit
    def run(a):
        def body(i, carry):
            a, s = carry
            out = staged_bin(a, stage).astype(jnp.float32)
            a = a._replace(means=a.means + 0.0 * out)
            return (a, s + out)
        return jax.lax.fori_loop(0, K, body, (a, jnp.float32(0.0)))
    return run


prev = 0.0
for stage in ["ranges", "counts", "pairfill", "expand", "sort", "edges",
              "place", "gather64"]:
    fn = chained(stage)
    t0 = time.time()
    sync(fn(act))
    tc = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(fn(act))
        best = min(best, time.time() - t0)
    per = (best - 0.033) / K * 1e3
    print(f"{stage:10s}: compile {tc:6.1f}s  cum {per:7.2f} ms"
          f"  delta {per - prev:7.2f} ms", flush=True)
    prev = per
print("done", flush=True)
