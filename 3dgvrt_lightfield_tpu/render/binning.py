"""Binning pass: Gaussians -> depth-sorted, chunk-aligned per-tile lists.

TPU-native replacement for the reference's Gaussian-Enclosing pass + BLAS/TLAS
build (particlePrimitives.comp, VulkanFullRT.cpp:575-787): TPUs have no RT
cores, so instead of building proxy icosahedra and a BVH we
  1. size each Gaussian's iso-response ellipsoid with the same `kernelScale`
     radius math (particlePrimitives.comp:81-105),
  2. compute its tight camera-space AABB, project it to screen-tile rects
     (the spatial-cell idea of SplitBLAS.cpp done functionally), and kill
     the over-covered corners with an exact per-pair ellipsoid-vs-tile-
     frustum support test,
  3. emit (tile, gaussian) pairs, sort them by (tile, view depth), and
  4. pad every tile's pair list to a multiple of the kernel chunk size G so
     the fused forward kernel can iterate a flat 1D chunk grid with
     scalar-prefetched `chunk_tile` indirection (the id-indirection idea of
     SplitBLAS.cpp:306-341).

Random-access discipline (measured on v5e: every gathered/scattered ROW costs
~13ns regardless of width, so cost == number of random rows, not bytes):
  * the per-pair expansion reads ONE packed 8-column int32 row per pair
    (tx0/ty0/rect_w/offset/depth_q fused) instead of five scalar gathers,
  * per-tile counts come from `searchsorted` differences on the sorted tile
    ids — num_tiles+1 queries, not a capacity-sized scatter-add,
  * capacity-sized index work stays as single scatters (padded-slot
    placement) or sorts; searchsorted is never used with capacity-many
    queries (log-n rounds would multiply the row count),
  * the gradient transpose of the final parameter gather is a segmented
    reduction (param_grads.chunked_gather), no scatter-add anywhere.

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
from ..ops.aabb import intersect_aabb
from ..ops.kernels import kernel_scale
from ..ops.sh import sh_basis_components
from .param_grads import chunked_gather
from .segreduce import (GROUP, ReducePlan, build_reduce_plan,
                        build_reduce_plan_compact, plan_rows_compact)
from .tile_math import RAY_ROWS


#: bump when binning/layout changes invalidate cached capacity plans
PLAN_VERSION = 4


class BinTopology(NamedTuple):
    """Pair-list topology: which Gaussian lands in which tile chunk slot.

    This is the TPU analog of the reference's built acceleration structure
    (VulkanFullRT.cpp:575-787): pure int32 index structure, NO differentiable
    parameter data.  No gradient flows through it (sort orders / cull masks
    are integer outputs), so a renderer may reuse a topology across frames
    while the parameters move — the AS-build-once shape of the reference
    (built at :575-787, per-frame dispatch only re-records at :1185-1244) —
    at the cost of slightly stale culling/depth-ordering, refreshed on
    whatever cadence the caller picks (see TiledRenderer / bench.py).
    """
    chunk_tile: jnp.ndarray  # (num_chunks,) int32 tile id (num_tiles = dummy)
    chunk_first: jnp.ndarray # (num_chunks,) int32 1 if first chunk of its tile
    tile_counts: jnp.ndarray # (num_tiles,) int32 pairs per tile (un-padded)
    num_pairs: jnp.ndarray   # () int32 surviving pairs (post fine-cull)
    overflow: jnp.ndarray    # () int32 rect pairs dropped (capacity) +
                             #    padded slots dropped (capacity_padded)
    pair_gauss: jnp.ndarray  # (capacity_padded,) int32 gaussian id per slot (N = pad)
    pair_pos: jnp.ndarray    # (capacity,) int32 PRE-SORT pair -> padded slot
                             #    (capacity_padded = culled/dropped)
    gauss_offsets: jnp.ndarray  # (N,) int32 pre-sort pair range start
    gauss_counts: jnp.ndarray   # (N,) int32 pre-sort pair range length
    red: object              # segreduce.ReducePlan (grouped grad-reduce
                             #    layout) or None above the at-scale gate


class BinnedScene(NamedTuple):
    """Chunked scene data consumed by the fused forward kernel."""
    chunks: jnp.ndarray      # (num_chunks, G, 64) fused params (tile_math)
    chunk_tile: jnp.ndarray  # (num_chunks,) int32 tile id (num_tiles = dummy)
    chunk_first: jnp.ndarray # (num_chunks,) int32 1 if first chunk of its tile
    tile_counts: jnp.ndarray # (num_tiles,) int32 pairs per tile (un-padded)
    num_pairs: jnp.ndarray   # () int32 surviving pairs (post fine-cull)
    overflow: jnp.ndarray    # () int32 rect pairs dropped (capacity) +
                             #    padded slots dropped (capacity_padded)
    pair_gauss: jnp.ndarray  # (capacity_padded,) int32 gaussian id per slot (N = pad)
    pair_pos: jnp.ndarray    # (capacity,) int32 PRE-SORT pair -> padded slot
                             #    (capacity_padded = culled/dropped)
    gauss_offsets: jnp.ndarray  # (N,) int32 pre-sort pair range start
    gauss_counts: jnp.ndarray   # (N,) int32 pre-sort pair range length
    red: object              # segreduce.ReducePlan or None


class FrameCullTable(NamedTuple):
    """Band-independent per-Gaussian frame geometry — ALL (N,) 1D columns.

    1D on purpose: any (N, C<128) f32 2D array occupies N x 128 lanes under
    the TPU's (8, 128) tiling (2.38 GiB per array at 5M gaussians — the
    measured config[2] OOM class, SCALE_r03.md), while (N,) columns pad to
    nothing.  The banded renderer computes this table ONCE per frame and
    every band derives its local rects/expansion from it, so no
    gaussian-count-sized 2D temp lives across the band scan except the
    single packed exp_tab of the band being binned.
    """
    tx0: jnp.ndarray    # (N,) int32 GLOBAL tile rect
    ty0: jnp.ndarray
    tx1: jnp.ndarray
    ty1: jnp.ndarray
    valid: jnp.ndarray  # (N,) bool
    depth: jnp.ndarray  # (N,) f32 view depth (-z cam)
    cs: tuple           # 3 x (N,) f32 camera-space center
    v: tuple            # 9 x (N,) f32 ellipsoid matrix V, row-major


def frame_cull_table(act: ActivatedGaussians, w2c, proj, width, height,
                     cfg: RenderConfig) -> FrameCullTable:
    """Per-Gaussian GLOBAL tile rects + cull geometry (see FrameCullTable)."""
    ts = cfg.tile_size
    nx, ny = width // ts, height // ts

    radius = kernel_scale(act.densities, cfg.kernel_min_response,
                          float(cfg.kernel_degree),
                          cfg.adaptive_kernel_clamping)

    # iso-response ellipsoid straight in CAMERA space: with
    # V = W @ R @ diag(radius*s)  (W = w2c rotation), the ellipsoid is
    # {cs + V u : |u| <= 1}, so its tight cam AABB half-extent is the row
    # norm of V and its support along any plane normal n is |V^T n| — no
    # world-AABB -> |W|-rotated-box double expansion (the r2 bound), and V
    # feeds the exact per-pair ellipsoid-vs-tile-frustum cull below.
    # Computed as flat (N,) column arithmetic with scalar W entries — a
    # (N, 3, 3) einsum tempts XLA into transposed (8, 128)-tiled temp
    # layouts that pad the 3-wide dims up to 113x (measured 5M-gaussian
    # OOM, SCALE_r03.md); rot9[:, 3j+k] = R[j, k].
    a_sc = radius[:, None] * act.scales                   # (N, 3)
    v_cols = []
    for i in range(3):
        for k in range(3):
            s = (w2c[i, 0] * act.rot9[:, k]
                 + w2c[i, 1] * act.rot9[:, 3 + k]
                 + w2c[i, 2] * act.rot9[:, 6 + k])
            v_cols.append(s * a_sc[:, k])                 # V[i, k]
    cs_cols = tuple(
        w2c[i, 0] * act.means[:, 0] + w2c[i, 1] * act.means[:, 1]
        + w2c[i, 2] * act.means[:, 2] + w2c[i, 3] for i in range(3))
    ec = [jnp.sqrt(v_cols[3 * i] ** 2 + v_cols[3 * i + 1] ** 2
                   + v_cols[3 * i + 2] ** 2) for i in range(3)]
    # screen bounds: clip = diag(P00, P11) and w = -z (perspective_vulkan /
    # raygen.rgen:119-121), so each ndc extreme is attained at one of the
    # four (coord, z) corner combinations — 4 products + min/max per axis.
    z_lo, z_hi = cs_cols[2] - ec[2], cs_cols[2] + ec[2]
    all_behind = z_lo > -cfg.near                         # camera looks -z
    any_behind = z_hi > -cfg.near

    # w = -z over the in-front part of the box, clamped at the near plane
    w_lo = jnp.maximum(-z_hi, cfg.near)
    w_hi = jnp.maximum(-z_lo, cfg.near)
    inv_wl, inv_wh = 1.0 / w_lo, 1.0 / w_hi

    def ndc_range(ax_lo, ax_hi, p_diag):
        cands = (p_diag * ax_lo * inv_wl, p_diag * ax_lo * inv_wh,
                 p_diag * ax_hi * inv_wl, p_diag * ax_hi * inv_wh)
        return (jnp.minimum(jnp.minimum(cands[0], cands[1]),
                            jnp.minimum(cands[2], cands[3])),
                jnp.maximum(jnp.maximum(cands[0], cands[1]),
                            jnp.maximum(cands[2], cands[3])))

    ndc_x0, ndc_x1 = ndc_range(cs_cols[0] - ec[0], cs_cols[0] + ec[0],
                               proj[0, 0])
    ndc_y0, ndc_y1 = ndc_range(cs_cols[1] - ec[1], cs_cols[1] + ec[1],
                               proj[1, 1])
    px_x0 = (ndc_x0 * 0.5 + 0.5) * width
    px_x1 = (ndc_x1 * 0.5 + 0.5) * width
    px_y0 = (ndc_y0 * 0.5 + 0.5) * height
    px_y1 = (ndc_y1 * 0.5 + 0.5) * height

    # partially-behind gaussians wrap around the image plane: take full screen
    px_x0 = jnp.where(any_behind, 0.0, px_x0)
    px_y0 = jnp.where(any_behind, 0.0, px_y0)
    px_x1 = jnp.where(any_behind, float(width), px_x1)
    px_y1 = jnp.where(any_behind, float(height), px_y1)

    off_screen = ((px_x1 < 0) | (px_y1 < 0)
                  | (px_x0 >= width) | (px_y0 >= height))
    # density <= alpha_min can never pass the alpha test (alpha <= density)
    dead = act.densities <= cfg.alpha_min
    valid = ~(all_behind | off_screen | dead)

    tx0 = jnp.clip(jnp.floor(px_x0 / ts).astype(jnp.int32), 0, nx - 1)
    ty0 = jnp.clip(jnp.floor(px_y0 / ts).astype(jnp.int32), 0, ny - 1)
    tx1 = jnp.clip(jnp.floor(px_x1 / ts).astype(jnp.int32), 0, nx - 1)
    ty1 = jnp.clip(jnp.floor(px_y1 / ts).astype(jnp.int32), 0, ny - 1)

    return FrameCullTable(tx0, ty0, tx1, ty1, valid, -cs_cols[2],
                          cs_cols, tuple(v_cols))


def _band_localize(tab: FrameCullTable, ny: int, band):
    """Global tile rects -> LOCAL rows of the band.

    `band` is (offset, stride) for round-robin tile-row banding (band owns
    global rows offset, offset+stride, ...) or (offset, 1, count) for a
    CONTIGUOUS band owning global rows [offset, offset+count) — span
    banding, where a y-sorted model keeps each band's live gaussian ids in
    a narrow contiguous range (see segreduce.CompactReducePlan.src_range).
    """
    offset, stride = band[0], band[1]
    count = band[2] if len(band) > 2 else 0
    tx0, ty0, tx1, ty1 = tab.tx0, tab.ty0, tab.tx1, tab.ty1
    valid = tab.valid
    if stride != 1:
        assert not count, band
        assert ny % stride == 0, (ny, stride)
        lny = ny // stride
        ly0 = (ty0 - offset + stride - 1) // stride   # ceil((ty0-off)/stride)
        ly1 = (ty1 - offset) // stride                # floor
        valid = valid & (ly1 >= ly0) & (ly1 >= 0) & (ly0 <= lny - 1)
        ty0 = jnp.clip(ly0, 0, lny - 1)
        ty1 = jnp.clip(ly1, 0, lny - 1)
        ny = lny
    elif count:
        lny = count
        ly0 = ty0 - offset
        ly1 = ty1 - offset
        valid = valid & (ly1 >= 0) & (ly0 <= lny - 1)
        ty0 = jnp.clip(ly0, 0, lny - 1)
        ty1 = jnp.clip(ly1, 0, lny - 1)
        ny = lny
    return (tx0, ty0, tx1, ty1), valid, ny


def _tile_ranges(act: ActivatedGaussians, w2c, proj, width, height,
                 cfg: RenderConfig, band=(0, 1)):
    """Conservative per-Gaussian tile rectangle + validity + view depth.

    `band = (offset, stride)` restricts the result to every stride-th tile
    ROW starting at `offset` (round-robin tile-row sharding across devices;
    stride must divide the tile-row count and be static, offset may be a
    traced per-device scalar).  Returned ty0/ty1 are LOCAL row indices
    within the band; (nx, ny) is the local grid.
    """
    nx, ny = width // cfg.tile_size, height // cfg.tile_size
    tab = frame_cull_table(act, w2c, proj, width, height, cfg)
    rects, valid, ny = _band_localize(tab, ny, band)
    return rects, valid, tab.depth, (nx, ny), tab.cs, tab.v


def _scatter_cummax_fill(capacity: int, offsets, values, valid):
    """arr[p] = values[g] for the g whose [offset, offset+count) contains p."""
    arr = jnp.zeros((capacity,), jnp.int32)
    arr = arr.at[jnp.where(valid, offsets, capacity)].max(
        values, mode="drop")
    # lax.cummax is ONE HLO op; lax.associative_scan here built a graph that
    # alone cost ~53 s of XLA compile time at 1M capacity (measured on v5e)
    return jax.lax.cummax(arr)


def _pair_ellipsoid_cull(tile_x, tile_y, csx, csy, csz, v9, p00, p11,
                         width, height, ts):
    """Exact ellipsoid-vs-tile-frustum test per (tile, gaussian) pair.

    The tile's frustum is the wedge of the four planes through the camera
    origin along the tile's ndc edges; with a diagonal projection and w = -z,
    the plane for ndc_x >= a is n=(P00, 0, a) (P00*cx + a*cz >= 0).  The
    iso-response ellipsoid {cs + V u : |u| <= 1} (V from _tile_ranges)
    intersects the half-space n.x >= 0 iff n.cs >= -|V^T n| — the support
    function of the ellipsoid, EXACT per plane (the r2 bound used the
    bounding sphere, r * max(scale), which over-covers anisotropic
    gaussians by the axis ratio).  Compared squared to avoid sqrt.  Keeps
    every pair whose acceptance region (response >= kernel_min_response)
    could touch the tile; kills the rect corners the AABB expansion
    over-covers (and nearly all tiles of the conservative full-screen rects
    used for partially-behind gaussians).

    v9 is V.reshape(9) per pair: [Vx0 Vx1 Vx2 Vy0 Vy1 Vy2 Vz0 Vz1 Vz2]
    (row-major rows x/y/z, columns = ellipsoid axes).
    """
    fx, fy = 2.0 * ts / width, 2.0 * ts / height
    a0 = fx * tile_x.astype(jnp.float32) - 1.0
    a1 = a0 + fx
    b0 = fy * tile_y.astype(jnp.float32) - 1.0
    b1 = b0 + fy
    lx = p00 * csx
    ly = p11 * csy

    def sup2(na, nc, r0, r1):
        # |V^T n|^2 for n with components na on row r0, nc on row r1 (=z)
        s = 0.0
        for k in range(3):
            u = na * v9[..., r0 * 3 + k] + nc * v9[..., r1 * 3 + k]
            s = s + u * u
        return s

    def touches_ge(d, s2):   # ellipsoid touches {n.x >= 0}
        return (d >= 0) | (d * d <= s2)

    def touches_le(d, s2):   # ellipsoid touches {n.x <= 0}
        return (d <= 0) | (d * d <= s2)

    keep = touches_ge(lx + a0 * csz, sup2(p00, a0, 0, 2))
    keep &= touches_le(lx + a1 * csz, sup2(p00, a1, 0, 2))
    keep &= touches_ge(ly + b0 * csz, sup2(p11, b0, 1, 2))
    keep &= touches_le(ly + b1 * csz, sup2(p11, b1, 1, 2))
    return keep


@partial(jax.jit, static_argnames=("cfg", "width", "height", "capacity",
                                   "capacity_padded", "row_stride",
                                   "capacity_reduce", "capacity_live",
                                   "row_count", "capacity_range"))
def bin_topology(act: ActivatedGaussians, w2c: jnp.ndarray, proj: jnp.ndarray,
                 width: int, height: int, cfg: RenderConfig,
                 capacity: int, capacity_padded: int,
                 row_offset=0, row_stride: int = 1,
                 capacity_reduce: int = 0,
                 capacity_live: int = 0,
                 row_count: int = 0,
                 capacity_range: int = 0) -> BinTopology:
    """Build the depth-sorted, chunk-aligned pair-list TOPOLOGY (no params).

    This is the expensive, parameter-gradient-free half of binning (tile
    rects, pair expansion, fine cull, sort, padded-slot placement); feed it
    to `gather_chunks` to attach the differentiable per-pair parameter rows.
    With `row_stride > 1` the pass bins only every stride-th tile row
    starting at `row_offset` (round-robin tile-row sharding; `row_offset`
    may be a traced per-device scalar inside shard_map).  With
    `row_count > 0` (and stride 1) it bins the CONTIGUOUS rows
    [row_offset, row_offset+row_count) — span banding."""
    tab = frame_cull_table(act, w2c, proj, width, height, cfg)
    return bin_topology_from_table(tab, proj, width, height, cfg, capacity,
                                   capacity_padded, row_offset, row_stride,
                                   capacity_reduce, capacity_live,
                                   row_count, capacity_range)


@partial(jax.jit, static_argnames=("cfg", "width", "height", "capacity",
                                   "capacity_padded", "row_stride",
                                   "capacity_reduce", "capacity_live",
                                   "row_count", "capacity_range"))
def bin_topology_from_table(tab: FrameCullTable, proj: jnp.ndarray,
                            width: int, height: int, cfg: RenderConfig,
                            capacity: int, capacity_padded: int,
                            row_offset=0, row_stride: int = 1,
                            capacity_reduce: int = 0,
                            capacity_live: int = 0,
                            row_count: int = 0,
                            capacity_range: int = 0) -> BinTopology:
    """Topology from a precomputed frame table (see FrameCullTable).

    The banded renderer computes the table once per frame and calls this
    per band — the only gaussian-count-sized 2D temp is this band's packed
    expansion table."""
    g = cfg.chunk_size
    n = tab.tx0.shape[0]
    nx = width // cfg.tile_size
    (tx0, ty0, tx1, ty1), valid, ny = _band_localize(
        tab, height // cfg.tile_size, (row_offset, row_stride, row_count))
    depth = tab.depth
    num_tiles = nx * ny

    rect_w = tx1 - tx0 + 1
    counts = jnp.where(valid, rect_w * (ty1 - ty0 + 1), 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - capacity, 0)

    # depth quantization params (per-gaussian, BEFORE pair expansion)
    tile_bits = max(1, (num_tiles + 1).bit_length())
    # cap at 24 bits: beyond the f32 mantissa extra depth levels are noise,
    # and the int-domain clamp below must be exact
    depth_bits = min(31 - tile_bits, 24)
    valid_depth = jnp.where(valid, depth, jnp.nan)
    dmin = jnp.nanmin(valid_depth)
    dmax = jnp.nanmax(valid_depth)
    dscale = (2.0 ** depth_bits - 2.0) / jnp.maximum(dmax - dmin, 1e-9)
    depth_q = jnp.clip(
        (jnp.maximum(depth - dmin, 0.0) * dscale).astype(jnp.int32),
        0, 2 ** depth_bits - 1)

    # pair p -> gaussian id via scatter of range starts + running max
    pair_g = _scatter_cummax_fill(capacity, offsets,
                                  jnp.arange(n, dtype=jnp.int32),
                                  valid & (counts > 0))
    # ONE packed f32 gather for the whole expansion (the ~13ns row-cost
    # rule).  Int columns are stored as exact f32 VALUES — never bitcast:
    # TPU ops flush f32 denormals, which silently zeroes bitcast small ints.
    # tx0/ty0/rect_w/depth_q are < 2^24 (f32-exact); offsets can exceed 2^24
    # on big scenes, so they travel as two 12-bit-safe halves.
    f32 = jnp.float32
    off_hi = (offsets >> 12).astype(f32)
    off_lo = (offsets & 0xFFF).astype(f32)
    exp_tab = jnp.stack(
        [tx0.astype(f32), ty0.astype(f32), rect_w.astype(f32),
         off_hi, off_lo, depth_q.astype(f32),
         tab.cs[0], tab.cs[1], tab.cs[2], *tab.v], axis=1)    # (N, 18)
    exp = exp_tab[pair_g]                                     # (capacity, 18)
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
    tile_y_global = tile_y * row_stride + row_offset
    fine = _pair_ellipsoid_cull(tile_x, tile_y_global, exp[:, 6], exp[:, 7],
                                exp[:, 8], exp[:, 9:18], proj[0, 0],
                                proj[1, 1], width, height, cfg.tile_size)
    tile_id = jnp.where(in_range & fine, tile_y * nx + tile_x, num_tiles)

    # sort by (tile, depth) with one packed int32 key: tile in the high bits,
    # scene-normalized quantized depth in the low bits (cheaper on TPU than a
    # two-key three-operand sort; depth quantization only reorders hits whose
    # depths differ by < range/2^depth_bits, which is visually irrelevant)
    key = (tile_id << depth_bits) | jnp.where(in_range, e_dq, 0)
    key_sorted, g_sorted, p_sorted = jax.lax.sort(
        (key, pair_g, p_idx), num_keys=1)
    tile_sorted = key_sorted >> depth_bits

    # per-tile counts from the sorted keys: searchsorted differences — only
    # num_tiles+1 binary-search queries, not a capacity-sized scatter-add
    tile_edges = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
        method="scan_unrolled").astype(jnp.int32)
    tile_counts = jnp.diff(
        jnp.concatenate([tile_edges, jnp.asarray([capacity], jnp.int32)]))
    starts = tile_edges
    padded_counts = ((tile_counts + g - 1) // g) * g
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts)])[:-1]
    padded_total = padded_starts[num_tiles]  # excludes dummy tile
    overflow = overflow + jnp.maximum(padded_total - capacity_padded, 0)

    # chunk -> tile mapping (+ trailing dummy chunks)
    num_chunks = capacity_padded // g
    chunk_arr = jnp.zeros((num_chunks,), jnp.int32)
    chunk_arr = chunk_arr.at[jnp.where(tile_counts[:num_tiles] > 0,
                                       padded_starts[:num_tiles] // g,
                                       num_chunks)].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    chunk_arr = chunk_arr.at[jnp.minimum(padded_total // g,
                                         num_chunks - 1)].max(num_tiles)
    chunk_tile = jax.lax.cummax(chunk_arr)
    chunk_first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)])

    # sorted pair -> padded slot: dest = p + (padded_starts - starts)[tile(p)].
    # The offset delta is non-decreasing over sorted pairs (padding only ever
    # adds), so a tiny scatter at tile edges + cummax replaces two
    # capacity-row gathers (measured 17.7 -> ~1 ms at 1M pairs on v5e)
    diff = padded_starts - starts          # (num_tiles + 1,) non-decreasing
    fill = jnp.zeros((capacity,), jnp.int32)
    fill = fill.at[tile_edges[:num_tiles]].max(diff[:num_tiles], mode="drop")
    delta = jax.lax.cummax(fill)
    keep = tile_sorted < num_tiles
    dest_drop = jnp.where(keep, p_idx + delta, capacity_padded)
    # id indirection: ONE narrow int scatter (measured ~3 ms/1M rows on v5e;
    # scattering the 64-col parameter rows directly costs ~3x a gather, so
    # the wide data moves by GATHER below)
    pair_gauss = jnp.full((capacity_padded,), n, jnp.int32)
    pair_gauss = pair_gauss.at[dest_drop].set(g_sorted, mode="drop")
    # invert the sort permutation HERE (pre-sort pair -> padded slot): the
    # gather VJP needs it every backward, and it is pure topology — carrying
    # it saves a 1.8M-element sort per training step (measured 5.9 ms/step)
    pair_pos = jnp.full((capacity,), capacity_padded, jnp.int32)
    pair_pos = pair_pos.at[p_sorted].set(dest_drop, mode="drop")

    # grouped gradient-reduction layout (segreduce.py): pure topology work,
    # amortized over the bind/refresh cadence.  Three regimes:
    #   capacity_live > 0  -> COMPACT plan over the band's live gaussians
    #                         (the at-scale default: padding O(n_live), one
    #                         N-row expansion per backward — un-gates the
    #                         Pallas segreduce at 5M, r3 verdict item 2);
    #   n <= 1.5M          -> full-id-space plan (flagship path: nearly all
    #                         gaussians live, no expansion gather needed);
    #   else               -> None = XLA prefix fallback
    #                         (param_grads._bwd_xla_prefix).
    if capacity_live > 0:
        assert capacity_live % GROUP == 0, capacity_live
        # fallback sizing uses the PAIR capacity as the survivor bound — a
        # deliberate over-allocation (survivors <= capacity always); callers
        # with a measured live count pass capacity_reduce instead
        cap_r = capacity_reduce or plan_rows_compact(capacity)
        red, red_overflow = build_reduce_plan_compact(
            pair_g, pair_pos, offsets, counts, n, capacity,
            capacity_padded, capacity_live, cap_r, capacity_range)
        overflow = overflow + red_overflow
    elif n <= 1_500_000:
        red, red_overflow = build_reduce_plan(
            pair_g, pair_pos, offsets, counts, n, capacity,
            capacity_padded, capacity_reduce)
        overflow = overflow + red_overflow
    else:
        red = None

    return BinTopology(
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        tile_counts=tile_counts[:num_tiles],
        num_pairs=tile_edges[num_tiles],
        overflow=overflow,
        pair_gauss=pair_gauss,
        pair_pos=pair_pos,
        gauss_offsets=offsets,
        gauss_counts=counts,
        red=red,
    )


def param_rows(act: ActivatedGaussians, cfg: RenderConfig) -> jnp.ndarray:
    """Fused (N+1, 64) per-Gaussian parameter table (dummy row N = zeros).

    Band/tile independent: the banded renderer builds this ONCE per frame
    outside its band scan (it only depends on the parameters), and each
    band gathers from it.  The world->unit-local frame is prefolded per
    Gaussian (tile_math v2): M = diag(1/s) @ R^T and b = M @ mean, so the
    kernel never touches scale/rotation separately.
    """
    n = act.means.shape[0]
    # M = diag(1/s) @ R^T: m[3i+k] = M[i, k] = inv_s[:, i] * R[k, i],
    # with R[k, i] = rot9[:, 3k+i]; dummy row N = identity frame, zero
    # density/radiance.
    m_cols = [act.inv_scales[:, i] * act.rot9[:, 3 * k + i]
              for i in range(3) for k in range(3)]
    # b = M @ mean: b[:, i] = inv_s[:, i] * sum_k R[k, i] * mean[:, k]
    b_cols = [act.inv_scales[:, i]
              * (act.rot9[:, i] * act.means[:, 0]
                 + act.rot9[:, 3 + i] * act.means[:, 1]
                 + act.rot9[:, 6 + i] * act.means[:, 2])
              for i in range(3)]

    if n > 1_500_000:
        # at-scale build: every column becomes 1D (N,), gets its dummy-row
        # value appended while STILL 1D, and the table is emitted by ONE
        # stack.  Any (N, C<128) 2D intermediate occupies N x 128 lanes
        # under the TPU's (8, 128) tiling — the 2D build below holds seven
        # such temps alive at once, a measured 16.7 GiB at 5M gaussians
        # (SCALE_r03.md).  The 64-way 1D stack is XLA-hostile at small N
        # (bench regression 124 -> 146 ms/frame, compile 862 s), so it is
        # gated to scenes where the 2D temps would actually threaten HBM.
        eye9 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        one = jnp.ones((1,), jnp.float32)
        zero = jnp.zeros((1,), jnp.float32)
        cols = [jnp.concatenate([m, eye9[j] * one])
                for j, m in enumerate(m_cols)]
        cols += [jnp.concatenate([b, zero]) for b in b_cols]
        cols.append(jnp.concatenate([act.densities, zero]))   # col 12
        cols += [jnp.zeros((n + 1,), jnp.float32)] * 3        # cols 13:16
        # sh_flat is already channel-major [R:16|G:16|B:16] — the kernel's
        # CH_SH layout (cols 16:64)
        cols += [jnp.concatenate([act.sh_flat[:, j], zero]) for j in range(48)]
        rows64 = jnp.stack(cols, axis=1)
    else:
        eye = jnp.eye(3, dtype=jnp.float32).reshape(1, 9)
        geom_rows = jnp.concatenate([
            jnp.concatenate([jnp.stack(m_cols, axis=1), eye], 0),
            jnp.concatenate([jnp.stack(b_cols, axis=1), jnp.zeros((1, 3))], 0),
            jnp.concatenate([act.densities[:, None], jnp.zeros((1, 1))], 0),
            jnp.zeros((n + 1, 3), jnp.float32),
        ], axis=1)  # (N+1, 16)
        rows64 = jnp.concatenate(
            [geom_rows,
             jnp.concatenate([act.sh_flat, jnp.zeros((1, 48))], 0)], axis=1)

    # force the packed table to materialize: XLA otherwise fuses the build
    # INTO the gather, turning every gathered row into many scattered source
    # reads (measured 14 ms vs 7 ms for the same gather on v5e)
    return jax.lax.optimization_barrier(rows64)


def gather_from_rows(rows64: jnp.ndarray, topo: BinTopology,
                     cfg: RenderConfig) -> jnp.ndarray:
    """(N+1, 64) table + topology -> (num_chunks, G, 64) kernel blocks."""
    return chunked_gather(cfg.chunk_size, rows64, topo.pair_gauss,
                          topo.pair_pos, topo.gauss_offsets,
                          topo.gauss_counts, topo.red)


def gather_chunks(act: ActivatedGaussians, topo: BinTopology,
                  cfg: RenderConfig) -> jnp.ndarray:
    """Gather fused per-pair parameter rows into (num_chunks, G, 64) blocks.

    The differentiable half of binning: the ONLY path gradients take
    through the binning pass, so a training step may reuse a stale `topo`
    and still produce exactly the gradients of its forward render.
    """
    return gather_from_rows(param_rows(act, cfg), topo, cfg)


def binned_scene(chunks: jnp.ndarray, topo: BinTopology) -> BinnedScene:
    """Assemble the kernel input from a (possibly reused) topology."""
    return BinnedScene(chunks, *topo)


def bin_gaussians(act: ActivatedGaussians, w2c: jnp.ndarray, proj: jnp.ndarray,
                  width: int, height: int, cfg: RenderConfig,
                  capacity: int, capacity_padded: int,
                  row_offset=0, row_stride: int = 1) -> BinnedScene:
    """Build the chunked, depth-sorted per-tile Gaussian lists.

    Composition of `bin_topology` (index structure, gradient-free) and
    `gather_chunks` (parameter rows, the gradient path); callers that render
    many frames with a fixed camera should hold the topology and call
    `gather_chunks` per frame instead (see module doc / TiledRenderer).
    """
    topo = bin_topology(act, w2c, proj, width, height, cfg, capacity,
                        capacity_padded, row_offset, row_stride)
    return binned_scene(gather_chunks(act, topo, cfg), topo)


def _bucket_capacity(v: int, g: int, ratio: float = 1.25) -> int:
    """Round a capacity UP to the next step of a chunk-aligned geometric grid.

    Every distinct (capacity, capacity_padded) pair is a fresh XLA/Mosaic
    compile of the whole pipeline (minutes at bench scale).  Snapping plans to
    x`ratio` steps means a re-plan after modest scene/camera drift lands on a
    shape that is ALREADY compiled (and persistently cached) instead of
    triggering a new one; worst case it over-allocates by `ratio` - 1, which
    only adds dead trailing chunks (DMA-skipped) and sort width — but every
    over-allocated row in the two hot gathers still costs its ~11.6-13 ns
    (PROFILE sections 7d/8), up to `ratio`-1 of pure gather toll.  FROZEN
    scene+camera workloads (benchmarks, serving a trained asset) should
    plan with ratio <= 1.0: exact chunk-aligned capacities, no grid.
    """
    v = max(int(v), g)
    if ratio <= 1.0:  # exact: chunk-aligned only (frozen-workload plans)
        return -(-v // g) * g
    k = math.ceil(math.log(v / g) / math.log(ratio) - 1e-9)
    return int(math.ceil(g * ratio ** k / g)) * g


def _host_expand_cull(tab: FrameCullTable, proj, width, height,
                      cfg: RenderConfig, band=(0, 1)):
    """Shared host-NumPy replication of the expansion + fine cull.

    Returns (total_rect_pairs, per_tile_survivors, nx, ny) for the band —
    consumed by both the pipeline-capacity and the reduce-rows planners so
    the O(pairs) host pass runs once per (camera, band)."""
    ts = cfg.tile_size
    nx, ny = width // ts, height // ts
    tx0, tx1 = np.asarray(tab.tx0), np.asarray(tab.tx1)
    ty0, ty1 = np.asarray(tab.ty0), np.asarray(tab.ty1)
    valid = np.asarray(tab.valid)
    offset, stride = band[0], band[1]
    count = band[2] if len(band) > 2 else 0
    if stride != 1:
        assert ny % stride == 0, (ny, stride)
        lny = ny // stride
        ly0 = -(-(ty0 - offset) // stride)            # ceil
        ly1 = (ty1 - offset) // stride                # floor
        valid = valid & (ly1 >= ly0) & (ly1 >= 0) & (ly0 <= lny - 1)
        ty0 = np.clip(ly0, 0, lny - 1)
        ty1 = np.clip(ly1, 0, lny - 1)
        ny = lny
    elif count:
        lny = count
        ly0 = ty0 - offset
        ly1 = ty1 - offset
        valid = valid & (ly1 >= 0) & (ly0 <= lny - 1)
        ty0 = np.clip(ly0, 0, lny - 1)
        ty1 = np.clip(ly1, 0, lny - 1)
        ny = lny
    counts = np.where(valid, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    total = int(counts.sum())
    rect_w = (tx1 - tx0 + 1)
    pg = np.repeat(np.arange(counts.shape[0]), counts)
    offs = np.cumsum(counts) - counts
    j = np.arange(total) - np.repeat(offs, counts)
    tile_x = tx0[pg] + j % rect_w[pg]
    tile_y = ty0[pg] + j // rect_w[pg]
    cs = [np.asarray(c) for c in tab.cs]
    v9 = np.stack([np.asarray(c) for c in tab.v], axis=1)
    keep = np.asarray(_pair_ellipsoid_cull(
        tile_x, tile_y * stride + offset,
        cs[0][pg], cs[1][pg], cs[2][pg], v9[pg],
        float(np.asarray(proj)[0, 0]), float(np.asarray(proj)[1, 1]),
        width, height, cfg.tile_size))
    tile_id = (tile_y * nx + tile_x)[keep]
    per_tile = np.bincount(tile_id, minlength=nx * ny)
    live_counts = np.bincount(pg[keep], minlength=counts.shape[0])
    return total, per_tile, nx, ny, live_counts


def plan_capacity_from_table(tab: FrameCullTable, proj, width, height,
                             cfg: RenderConfig, slack: float = 1.3,
                             band=(0, 1), bucket_ratio: float = 1.25):
    """Host-NumPy capacity plan from a (host) frame table — see plan_capacity.

    Callers planning many bands of one frame (plan_capacity_banded) compute
    `frame_cull_table` once and call this per band instead of re-running the
    device pass per band."""
    g = cfg.chunk_size
    total, per_tile, nx, ny, _ = _host_expand_cull(tab, proj, width, height,
                                                   cfg, band)
    capacity = max(g, int(math.ceil(total * slack / g)) * g)
    # slack per tile for camera motion + a pool of whole chunks for tiles
    # that are empty now but covered later; runtime overflow is reported in
    # BinnedScene.overflow_padded (callers re-plan on overflow)
    padded = int((np.ceil(per_tile * slack / g) * g).sum())
    padded += g * (1 + max(64, int(nx) * int(ny) // 16))
    capacity_padded = int(min(padded, capacity + int(nx) * int(ny) * g + g))
    # snap to the compile-shape grid (see _bucket_capacity): re-plans after
    # drift/overflow reuse already-compiled pipeline shapes
    return (_bucket_capacity(capacity, g, bucket_ratio),
            _bucket_capacity(capacity_padded, g, bucket_ratio))


def plan_reduce_capacity_from_table(tab: FrameCullTable, proj, width, height,
                                    cfg: RenderConfig, n_rows: int,
                                    slack: float = 1.05, band=(0, 1),
                                    bucket_ratio: float = 1.1) -> int:
    """Host plan for the live-compacted grad-reduce layout (segreduce.py).

    Counts the post-cull SURVIVOR pairs (the same host replication of the
    expansion + fine cull as plan_capacity_from_table) and sizes the static
    reduction row count: survivors x slack + one padded block per
    256-Gaussian group, bucketed like the other capacities.  Rows that
    don't fit at runtime are counted into topology overflow (re-plan
    contract), so a tight slack is safe."""
    from .segreduce import plan_rows
    _, per_tile, _, _, _ = _host_expand_cull(tab, proj, width, height, cfg,
                                             band)
    survivors = int(per_tile.sum())
    # finer 1.1x bucket than the pipeline shapes: the reduce gather pays a
    # hard ~11.6 ns per row (PROFILE section 1), and the 1.25x grid was
    # measured to quantize the live-compaction win away entirely (round-4
    # stage profile: survivors 1.166M -> same 1.77M rows as no compaction)
    budget = _bucket_capacity(int(math.ceil(survivors * slack)),
                              cfg.chunk_size, ratio=bucket_ratio)
    return plan_rows(budget, n_rows)


def plan_compact_reduce_from_table(tab: FrameCullTable, proj, width, height,
                                   cfg: RenderConfig,
                                   slack: float = 1.05, band=(0, 1)):
    """Host plan for the COMPACT grad-reduce layout (segreduce.py).

    Returns (capacity_live, capacity_reduce, capacity_range) for one band:
    live-gaussian capacity (bucketed multiple of GROUP), the DENSE
    reduction row count — the alignment-free layout's rows are exactly the
    surviving pairs (x slack), nothing else, and every planned row costs a
    hard ~11.6 ns in the backward permutation gather — and the live-ID
    WINDOW width (first..last live id, x slack): with a y-sorted model and
    contiguous bands this is the narrow expansion window (span banding);
    for round-robin bands or unsorted models it degrades to ~N and the
    expansion runs full-table exactly as before.  Runtime overflow of any
    budget is folded into topology overflow (re-plan contract)."""
    _, per_tile, _, _, live_counts = _host_expand_cull(tab, proj, width,
                                                       height, cfg, band)
    n = live_counts.shape[0]
    n_live = int((live_counts > 0).sum())
    survivors = int(per_tile.sum())
    cap_live = _bucket_capacity(int(math.ceil(max(n_live, 1) * slack)),
                                GROUP, ratio=1.1)
    cap_r = plan_rows_compact(int(math.ceil(survivors * slack)))
    live_idx = np.nonzero(live_counts > 0)[0]
    width_ids = (int(live_idx[-1]) - int(live_idx[0]) + 1) if live_idx.size \
        else 1
    cap_range = min(_bucket_capacity(int(math.ceil(width_ids * slack)),
                                     GROUP, ratio=1.1), n)
    return cap_live, cap_r, cap_range


def plan_capacity(act: ActivatedGaussians, w2c, proj, width, height,
                  cfg: RenderConfig, slack: float = 1.3, band=(0, 1)):
    """Measure pair counts once (host NumPy) to pick static capacities.

    `capacity` sizes the pre-cull expansion+sort arrays (rect pairs);
    `capacity_padded` sizes the chunked kernel arrays and is planned from the
    post-cull per-tile survivor counts (chunk-rounded, with slack for camera
    motion), so the fine cull shrinks the gather and kernel grids too.
    `band` plans one tile-row shard (see bin_gaussians row_offset/stride).
    """
    tab = jax.tree.map(np.asarray, frame_cull_table(
        act, jnp.asarray(w2c), jnp.asarray(proj), width, height, cfg))
    return plan_capacity_from_table(tab, proj, width, height, cfg, slack,
                                    band)


def tile_rays(camera, cfg: RenderConfig, aabb=None, tmax_clip=None):
    """Per-pixel rays + AABB clip range + SH basis, tiled to (T, 24, R).

    Rows 0:8 are [o, d, tmin, tmax]; rows 8:24 are the 16 SH basis values of
    the ray direction (zero above (sh_degree+1)^2), precomputed here so the
    fused kernels never re-evaluate the basis polynomials per chunk.
    `tmax_clip` (H, W) optionally caps each ray's march distance (combined
    gaussian+mesh scenes: opaque surfaces terminate the march)."""
    ts = cfg.tile_size
    o, d = camera.rays()
    h, w = o.shape[:2]
    assert h % ts == 0 and w % ts == 0, (h, w, ts)
    d = jnp.asarray(d)
    tmin, tmax = intersect_aabb(aabb or cfg.aabb, jnp.asarray(o), d)
    if tmax_clip is not None:
        tmax = jnp.minimum(tmax, tmax_clip)
    basis = sh_basis_components(d[..., 0], d[..., 1], d[..., 2],
                                cfg.sh_degree)
    basis += [jnp.zeros_like(d[..., 0])] * (16 - len(basis))
    rays = jnp.concatenate([jnp.asarray(o), d, tmin[..., None],
                            tmax[..., None], jnp.stack(basis, axis=-1)],
                           axis=-1)
    tiled = rays.reshape(h // ts, ts, w // ts, ts, RAY_ROWS)
    return tiled.transpose(0, 2, 4, 1, 3).reshape(-1, RAY_ROWS, ts * ts)


def untile(img_tiled: jnp.ndarray, width: int, height: int, ts: int):
    """(num_tiles, C, R) -> (H, W, C)."""
    ny, nx = height // ts, width // ts
    c = img_tiled.shape[1]
    return (img_tiled.reshape(ny, nx, c, ts, ts)
            .transpose(0, 3, 1, 4, 2).reshape(height, width, c))


def band_rays(camera, cfg: RenderConfig, stride: int, aabb=None,
              mode: str = "stride"):
    """Tiled rays split into `stride` tile-row bands.

    mode="stride" (round-robin): band d owns global tile rows d, d+stride,
    d+2*stride, ... — the load-balanced default for round-robin banding and
    multi-chip tile-row sharding.  mode="contig" (span banding): band d
    owns the CONTIGUOUS rows [d*ny/stride, (d+1)*ny/stride) — required for
    the y-sorted-model live-id windows (contiguity in image rows <=>
    contiguity in sorted gaussian ids).  Returns
    (stride, local_tiles, RAY_ROWS, R): axis 0 is the band (shardable).
    """
    ts = cfg.tile_size
    rays = tile_rays(camera, cfg, aabb)                 # (ny*nx, 24, R)
    ny = camera.height // ts
    nx = camera.width // ts
    assert ny % stride == 0, (ny, stride)
    if mode == "contig":
        return rays.reshape(stride, (ny // stride) * nx, RAY_ROWS, ts * ts)
    assert mode == "stride", mode
    byband = rays.reshape(ny // stride, stride, nx, RAY_ROWS, ts * ts)
    return byband.transpose(1, 0, 2, 3, 4).reshape(
        stride, (ny // stride) * nx, RAY_ROWS, ts * ts)


def plan_row_split(tab: FrameCullTable, proj, width, height,
                   cfg: RenderConfig, n_bands: int):
    """PAIR-BALANCED contiguous tile-row split: ((offset, count), ...).

    Uniform contiguous bands (span banding) pay a load-balance penalty the
    round-robin bands did not: per-band capacities are max-merged and the
    central rows of a projected scene are heavier than the edge rows, so
    every band's gather pays the heaviest band's row count (SCALE_r05.md
    "why -67 and not -178").  This planner cuts the tile rows at the
    n-quantiles of the per-row SURVIVOR-pair prefix sum instead — unequal
    row counts, ~equal pairs — analogous to how SplitBLAS sizes its grid
    cells by primitive count, not extent (SplitBLAS.cpp:678-752).  Bands
    keep >= 1 row each; consumed by the variable-band (unrolled) renderer,
    which gives every band its OWN static capacities.
    """
    _, per_tile, nx, ny, _ = _host_expand_cull(tab, proj, width, height, cfg)
    assert 1 <= n_bands <= ny, (n_bands, ny)
    row_pairs = per_tile.reshape(ny, nx).sum(axis=1)
    cum = np.cumsum(row_pairs)
    total = max(int(cum[-1]), 1)
    cuts = [0]
    for k in range(1, n_bands):
        j = int(np.searchsorted(cum, total * k / n_bands))
        # every band keeps >= 1 row (empty-sky rows can make quantiles
        # collide); leave enough rows for the remaining bands too
        cuts.append(max(cuts[-1] + 1, min(j, ny - (n_bands - k))))
    cuts.append(ny)
    return tuple((cuts[i], cuts[i + 1] - cuts[i]) for i in range(n_bands))


def band_rays_split(camera, cfg: RenderConfig, specs, aabb=None):
    """Per-band ray arrays for a variable (offset, count) row split.

    Unlike `band_rays` (uniform bands, one stacked array for lax.scan),
    variable bands have per-band shapes — returns a TUPLE of
    (count*nx, RAY_ROWS, R) arrays, consumed by the unrolled bound
    renderer (banded._render_banded_bound, tuple form)."""
    rays = tile_rays(camera, cfg, aabb)                 # (ny*nx, 24, R)
    nx = camera.width // cfg.tile_size
    return tuple(rays[off * nx:(off + count) * nx] for off, count in specs)


def unband_image(bands: jnp.ndarray, width: int, height: int, ts: int,
                 mode: str = "stride"):
    """(stride, local_H, W, C) band images -> (H, W, C).

    mode="stride" interleaves round-robin tile rows; mode="contig" stacks
    the bands' contiguous row blocks (a plain reshape)."""
    stride, lh, w, c = bands.shape
    if mode == "contig":
        return bands.reshape(height, width, c)
    assert mode == "stride", mode
    lny = lh // ts
    return (bands.reshape(stride, lny, ts, w, c)
            .transpose(1, 0, 2, 3, 4).reshape(height, width, c))
