"""Binning pass: Gaussians -> depth-sorted, chunk-aligned per-tile lists.

TPU-native replacement for the reference's Gaussian-Enclosing pass + BLAS/TLAS
build (particlePrimitives.comp, VulkanFullRT.cpp:575-787): TPUs have no RT
cores, so instead of building proxy icosahedra and a BVH we
  1. size each Gaussian's iso-response ellipsoid with the same `kernelScale`
     radius math (particlePrimitives.comp:81-105),
  2. compute its world AABB and conservatively project it to screen tiles
     (the spatial-cell idea of SplitBLAS.cpp done functionally),
  3. emit (tile, gaussian) pairs, sort them by (tile, view depth), and
  4. pad every tile's pair list to a multiple of the kernel chunk size G so
     the fused forward kernel can iterate a flat 1D chunk grid with
     scalar-prefetched `chunk_tile` indirection (the id-indirection idea of
     SplitBLAS.cpp:306-341).

Everything is jit-compatible with static capacities; `plan_capacity` measures
a scene+camera once (uncompiled NumPy) to pick them.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..models.gaussians import ActivatedGaussians
from ..ops.aabb import gaussian_world_aabb, intersect_aabb
from ..ops.kernels import kernel_scale
from .param_grads import chunked_gather


class BinnedScene(NamedTuple):
    """Chunked scene data consumed by the fused forward kernel."""
    geom: jnp.ndarray        # (num_chunks, 16, G) packed geometry
    sh_r: jnp.ndarray        # (num_chunks, 16, G)
    sh_g: jnp.ndarray        # (num_chunks, 16, G)
    sh_b: jnp.ndarray        # (num_chunks, 16, G)
    chunk_tile: jnp.ndarray  # (num_chunks,) int32 tile id (num_tiles = dummy)
    chunk_first: jnp.ndarray # (num_chunks,) int32 1 if first chunk of its tile
    tile_counts: jnp.ndarray # (num_tiles,) int32 pairs per tile (un-padded)
    num_pairs: jnp.ndarray   # () int32 total pairs before padding
    overflow: jnp.ndarray    # () int32 pairs dropped due to capacity
    pair_gauss: jnp.ndarray  # (capacity_padded,) int32 gaussian id per slot (N = pad)
    pair_pos: jnp.ndarray    # (capacity,) int32 pre-sort pair -> padded slot
    gauss_offsets: jnp.ndarray  # (N,) int32 pre-sort pair range start
    gauss_counts: jnp.ndarray   # (N,) int32 pre-sort pair range length


def _tile_ranges(act: ActivatedGaussians, w2c, proj, width, height,
                 cfg: RenderConfig):
    """Conservative per-Gaussian tile rectangle + validity + view depth."""
    ts = cfg.tile_size
    nx, ny = width // ts, height // ts

    radius = kernel_scale(act.densities, cfg.kernel_min_response,
                          float(cfg.kernel_degree),
                          cfg.adaptive_kernel_clamping)
    lo, hi = gaussian_world_aabb(act.means, act.scales, act.rotmats, radius)

    # 8 AABB corners -> camera space
    sel = jnp.asarray([[x, y, z] for x in (0, 1) for y in (0, 1)
                       for z in (0, 1)], jnp.float32)          # (8, 3)
    corners = lo[:, None, :] * (1 - sel) + hi[:, None, :] * sel  # (N, 8, 3)
    cam = jnp.einsum("nkj,ij->nki", corners, w2c[:3, :3]) + w2c[:3, 3]
    z = cam[..., 2]
    behind = z > -cfg.near                                  # camera looks -z
    all_behind = jnp.all(behind, axis=1)
    any_behind = jnp.any(behind, axis=1)

    clip = jnp.einsum("nkj,ij->nki", cam, proj[:3, :3]) + proj[:3, 3]
    wc = -z  # proj[3] = (0,0,-1,0)
    ndc = clip[..., :2] / jnp.maximum(wc, 1e-9)[..., None]
    px = (ndc * 0.5 + 0.5) * jnp.asarray([width, height], jnp.float32)

    big = jnp.asarray([width * 4.0, height * 4.0], jnp.float32)
    px_lo = jnp.min(jnp.where(behind[..., None], big, px), axis=1)
    px_hi = jnp.max(jnp.where(behind[..., None], -big, px), axis=1)
    # partially-behind gaussians wrap around the image plane: take full screen
    px_lo = jnp.where(any_behind[:, None], jnp.zeros(2, jnp.float32), px_lo)
    px_hi = jnp.where(any_behind[:, None],
                      jnp.asarray([width, height], jnp.float32), px_hi)

    off_screen = ((px_hi[:, 0] < 0) | (px_hi[:, 1] < 0)
                  | (px_lo[:, 0] >= width) | (px_lo[:, 1] >= height))
    # density <= alpha_min can never pass the alpha test (alpha <= density)
    dead = act.densities <= cfg.alpha_min
    valid = ~(all_behind | off_screen | dead)

    tx0 = jnp.clip(jnp.floor(px_lo[:, 0] / ts).astype(jnp.int32), 0, nx - 1)
    ty0 = jnp.clip(jnp.floor(px_lo[:, 1] / ts).astype(jnp.int32), 0, ny - 1)
    tx1 = jnp.clip(jnp.floor(px_hi[:, 0] / ts).astype(jnp.int32), 0, nx - 1)
    ty1 = jnp.clip(jnp.floor(px_hi[:, 1] / ts).astype(jnp.int32), 0, ny - 1)

    depth = -(act.means @ w2c[2, :3] + w2c[2, 3])
    return (tx0, ty0, tx1, ty1), valid, depth, (nx, ny)


def _scatter_cummax_fill(capacity: int, offsets, values, valid):
    """arr[p] = values[g] for the g whose [offset, offset+count) contains p."""
    arr = jnp.zeros((capacity,), jnp.int32)
    arr = arr.at[jnp.where(valid, offsets, capacity)].max(
        values, mode="drop")
    return jax.lax.associative_scan(jnp.maximum, arr)


@partial(jax.jit, static_argnames=("cfg", "width", "height", "capacity",
                                   "capacity_padded"))
def bin_gaussians(act: ActivatedGaussians, w2c: jnp.ndarray, proj: jnp.ndarray,
                  width: int, height: int, cfg: RenderConfig,
                  capacity: int, capacity_padded: int) -> BinnedScene:
    """Build the chunked, depth-sorted per-tile Gaussian lists."""
    g = cfg.chunk_size
    n = act.means.shape[0]
    (tx0, ty0, tx1, ty1), valid, depth, (nx, ny) = _tile_ranges(
        act, w2c, proj, width, height, cfg)
    num_tiles = nx * ny

    rect_w = tx1 - tx0 + 1
    counts = jnp.where(valid, rect_w * (ty1 - ty0 + 1), 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - capacity, 0)

    # pair p -> gaussian id via scatter + running max
    pair_g = _scatter_cummax_fill(capacity, offsets,
                                  jnp.arange(n, dtype=jnp.int32),
                                  valid & (counts > 0))
    p_idx = jnp.arange(capacity, dtype=jnp.int32)
    in_range = p_idx < total
    j = p_idx - offsets[pair_g]
    tile_x = tx0[pair_g] + j % rect_w[pair_g]
    tile_y = ty0[pair_g] + j // rect_w[pair_g]
    tile_id = jnp.where(in_range, tile_y * nx + tile_x, num_tiles)

    # sort by (tile, depth) with one packed int32 key: tile in the high bits,
    # scene-normalized quantized depth in the low bits (cheaper on TPU than a
    # two-key three-operand sort; depth quantization only reorders hits whose
    # depths differ by < range/2^depth_bits, which is visually irrelevant)
    tile_bits = max(1, (num_tiles + 1).bit_length())
    # cap at 24 bits: beyond the f32 mantissa extra depth levels are noise,
    # and the int-domain clamp below must be exact
    depth_bits = min(31 - tile_bits, 24)
    valid_depth = jnp.where(valid, depth, jnp.nan)
    dmin = jnp.nanmin(valid_depth)
    dmax = jnp.nanmax(valid_depth)
    dscale = (2.0 ** depth_bits - 2.0) / jnp.maximum(dmax - dmin, 1e-9)
    pair_q = jnp.clip(
        (jnp.maximum(depth[pair_g] - dmin, 0.0) * dscale).astype(jnp.int32),
        0, 2 ** depth_bits - 1)
    key = (tile_id << depth_bits) | jnp.where(in_range, pair_q, 0)
    key_sorted, g_sorted, p_sorted = jax.lax.sort(
        (key, pair_g, p_idx), num_keys=1)
    tile_sorted = key_sorted >> depth_bits

    # per-tile counts and padded chunk-aligned starts
    tile_counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[tile_sorted].add(
        jnp.where(tile_sorted < num_tiles, 1, 0))
    starts = jnp.cumsum(tile_counts) - tile_counts
    padded_counts = ((tile_counts + g - 1) // g) * g
    padded_starts = jnp.cumsum(padded_counts) - padded_counts
    padded_total = padded_starts[num_tiles]  # excludes dummy tile

    rank = jnp.arange(capacity, dtype=jnp.int32)
    dest = padded_starts[tile_sorted] + (rank - starts[tile_sorted])
    keep = tile_sorted < num_tiles
    pair_gauss = jnp.full((capacity_padded,), n, jnp.int32)
    pair_gauss = pair_gauss.at[jnp.where(keep, dest, capacity_padded)].set(
        g_sorted, mode="drop")
    # invert the sort permutation (second sort, not a scatter): pre-sort
    # pair p -> its padded chunk slot; the gradient reduction walks this
    _, pair_pos = jax.lax.sort_key_val(
        p_sorted, jnp.where(keep, dest, capacity_padded))

    # chunk -> tile mapping (+ trailing dummy chunks)
    num_chunks = capacity_padded // g
    chunk_arr = jnp.zeros((num_chunks,), jnp.int32)
    chunk_arr = chunk_arr.at[jnp.where(tile_counts[:num_tiles] > 0,
                                       padded_starts[:num_tiles] // g,
                                       num_chunks)].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    chunk_arr = chunk_arr.at[jnp.minimum(padded_total // g,
                                         num_chunks - 1)].max(num_tiles)
    chunk_tile = jax.lax.associative_scan(jnp.maximum, chunk_arr)
    chunk_first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)])

    # gather packed per-pair data (dummy row N has density 0 / identity frame)
    eye = jnp.tile(jnp.eye(3, dtype=jnp.float32).reshape(1, 9), (1, 1))
    geom_rows = jnp.concatenate([
        jnp.concatenate([act.means, jnp.zeros((1, 3))], 0),
        jnp.concatenate([act.inv_scales, jnp.ones((1, 3))], 0),
        jnp.concatenate([act.rotmats.reshape(n, 9), eye], 0),
        jnp.concatenate([act.densities[:, None], jnp.zeros((1, 1))], 0),
    ], axis=1)  # (N+1, 16)
    sh_all = jnp.concatenate([act.sh_coeffs,
                              jnp.zeros((1, 16, 3))], axis=0)  # (N+1, 16, 3)

    # one fused (N+1, 64) gather whose custom VJP is the scatter-free
    # segmented reduction (param_grads.chunked_gather)
    rows64 = jnp.concatenate(
        [geom_rows, sh_all[..., 0], sh_all[..., 1], sh_all[..., 2]], axis=1)
    chunks64 = chunked_gather(g, rows64, pair_gauss, pair_pos, offsets,
                              counts)

    return BinnedScene(
        geom=chunks64[:, 0:16, :],
        sh_r=chunks64[:, 16:32, :],
        sh_g=chunks64[:, 32:48, :],
        sh_b=chunks64[:, 48:64, :],
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        tile_counts=tile_counts[:num_tiles],
        num_pairs=total,
        overflow=overflow,
        pair_gauss=pair_gauss,
        pair_pos=pair_pos,
        gauss_offsets=offsets,
        gauss_counts=counts,
    )


def plan_capacity(act: ActivatedGaussians, w2c, proj, width, height,
                  cfg: RenderConfig, slack: float = 1.3):
    """Measure pair counts once (host NumPy) to pick static capacities."""
    (tx0, ty0, tx1, ty1), valid, _, (nx, ny) = jax.tree.map(
        np.asarray, _tile_ranges(act, jnp.asarray(w2c), jnp.asarray(proj),
                                 width, height, cfg))
    counts = np.where(valid, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    total = int(counts.sum())
    g = cfg.chunk_size
    capacity = max(g, int(math.ceil(total * slack / g)) * g)
    capacity_padded = capacity + (nx * ny + 1) * g
    return capacity, capacity_padded


def tile_rays(camera, cfg: RenderConfig, aabb=None):
    """Per-pixel rays + AABB clip range, tiled to (num_tiles, R, 8)."""
    ts = cfg.tile_size
    o, d = camera.rays()
    h, w = o.shape[:2]
    assert h % ts == 0 and w % ts == 0, (h, w, ts)
    tmin, tmax = intersect_aabb(aabb or cfg.aabb, jnp.asarray(o),
                                jnp.asarray(d))
    rays = jnp.concatenate([jnp.asarray(o), jnp.asarray(d),
                            tmin[..., None], tmax[..., None]], axis=-1)
    tiled = rays.reshape(h // ts, ts, w // ts, ts, 8)
    return tiled.transpose(0, 2, 1, 3, 4).reshape(-1, ts * ts, 8)


def untile(img_tiled: jnp.ndarray, width: int, height: int, ts: int):
    """(num_tiles, R, C) -> (H, W, C)."""
    ny, nx = height // ts, width // ts
    c = img_tiled.shape[-1]
    return (img_tiled.reshape(ny, nx, ts, ts, c)
            .transpose(0, 2, 1, 3, 4).reshape(height, width, c))
