"""Hand-scheduled forward + backward for the fused tile renderer (custom VJP).

SURVEY.md section 7 steps 3-4: the fused forward kernel and the backward
through the sorted, early-terminated composite.  Design:

  * One flat 1D grid over Gaussian chunks; `chunk_tile` (scalar-prefetched)
    maps each chunk to its image tile, so consecutive chunks of the same tile
    keep the tile's ray block and accumulator block resident in VMEM.
  * All per-chunk parameters travel as ONE fused (G, 64) block in
    gaussian-major layout (tile_math.chunk), produced by the binning gather
    with no transpose anywhere.
  * `chunk_core` factors the sequential state down to the per-ray
    transmittance, so the only saved residual is T_in per (chunk, ray) —
    O(num_chunks * R) floats, far cheaper than rematerializing hit chains.
  * The backward kernel walks the chunk grid in REVERSE (index maps use
    num_chunks-1-c); because chunks of a tile are contiguous, each tile's
    cotangent carry bar_T stays VMEM-resident exactly like the forward
    accumulator.
  * Inside the kernel the per-chunk gradients come from the HAND-DERIVED
    VJP `tile_math.chunk_core_bwd` (validated against jax.vjp of chunk_core
    in tests/test_backward.py): one shared forward recompute, full-lane
    intermediates — measured faster than the jax.vjp-traced graph.
  * Trailing dead capacity chunks (tile id == num_tiles) are mapped onto the
    last real chunk's block index via a `min(c, last_real)` clamp in the
    BlockSpec index map: the Pallas pipeline skips re-DMA for repeated
    indices, so dead chunks cost neither bandwidth nor compute.  The only
    scalar-prefetch ARRAY is `chunk_tile` — `first`/`last` are neighbor
    compares of it done in-kernel, and `last_real` is one scalar.  (The
    former three per-chunk int32 maps exceeded the 1 MB SMEM at 5M-scale
    chunk counts — the r4 bands=2 Mosaic OOM, SCALE_r04b.md.)
  * Per-pair parameter gradients leave the kernel as (num_chunks, G, 64)
    blocks; the custom VJP of the binning gather (param_grads.chunked_gather)
    turns them into per-Gaussian gradients scatter-free, so
    `jax.grad(loss)(model)` works end-to-end through `render_image_tiled`.

Camera-ray gradients are emitted when cfg.ray_gradients is set: the backward
kernel accumulates per-tile (24, R) ray cotangents (origins, directions, SH
basis rows) alongside the parameter blocks, enabling pose/camera optimization
through `tile_rays` (tests/test_ray_grads.py).  With the flag OFF (default —
the training paths treat rays as constants and skip the extra backward work),
bar_rays is SILENT ZEROS; see the note in `_render_bwd`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .tile_math import ACC_T, RAY_ROWS, chunk_core_bwd, chunk_update


#: chunks of T_in residual packed per block row (Mosaic needs >=8 sublanes)
TIN_PACK = 16


def _last_real(chunk_tile: jnp.ndarray, num_tiles: int) -> jnp.ndarray:
    """(1,) int32: index of the last real chunk.  The chunk BlockSpec maps
    every trailing dead chunk onto this block (`min(c, last_real)` in the
    index map — repeated index => the pipeline skips the re-DMA).  Replaces
    the per-chunk `chunk_src` scalar-prefetch ARRAY: at 5M-scale chunk
    counts the three int32 maps (tile, first, src) exceeded the 1 MB SMEM
    (SCALE_r04b bands=2 Mosaic OOM); `first`/`last` are neighbor compares
    of `chunk_tile` derived in-kernel, and `src` is this one scalar."""
    n_real = jnp.sum((chunk_tile < num_tiles).astype(jnp.int32))
    return jnp.maximum(n_real - 1, 0)[None]


def _fwd_kernel(ct_ref, lr_ref, rays_ref, chunk_ref, acc_ref,
                tin_ref, *, cfg: RenderConfig, num_tiles: int):
    c = pl.program_id(0)
    # first chunk of its tile: SMEM neighbor compare (no prefetched map)
    prev = ct_ref[jnp.maximum(c - 1, 0)]
    first = (c == 0) | (ct_ref[c] != prev)

    @pl.when(first)
    def _():
        r = acc_ref.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, r), 0)
        acc_ref[0, :, :] = jnp.where(row == ACC_T, 1.0, 0.0)

    tin_ref[c % TIN_PACK, :] = acc_ref[0, ACC_T, :]
    # skip saturated tiles (raygen.rgen:142) AND dead trailing capacity
    # chunks (tile id == num_tiles)
    alive = ((ct_ref[c] < num_tiles)
             & (jnp.max(acc_ref[0, ACC_T, :]) > cfg.min_transmittance))

    @pl.when(alive)
    def _():
        acc_ref[0, :, :] = chunk_update(rays_ref[0], chunk_ref[0],
                                        acc_ref[0], cfg)


def _bwd_kernel(ct_ref, lr_ref, rays_ref, chunk_ref, tin_ref,
                bar_acc_ref, bar_t_ref, bar_chunk_ref, *opt_refs,
                cfg: RenderConfig, num_chunks: int, num_tiles: int):
    bar_rays_ref = opt_refs[0] if opt_refs else None
    c = pl.program_id(0)
    rc = num_chunks - 1 - c
    # last forward chunk of its tile: SMEM neighbor compare (no map)
    nxt = ct_ref[jnp.minimum(rc + 1, num_chunks - 1)]
    last = (rc == num_chunks - 1) | (ct_ref[rc] != nxt)

    # first visit of this tile in reverse order == its last forward chunk
    @pl.when(last)
    def _():
        bar_t_ref[0, 0, :] = bar_acc_ref[0, ACC_T, :]
        if cfg.ray_gradients:
            # every tile that owns >= 1 chunk gets its ray-cotangent block
            # defined here (dead trailing chunks define the dummy block);
            # chunkless tiles are masked outside (_render_bwd)
            bar_rays_ref[0] = jnp.zeros_like(bar_rays_ref[0])

    t_in = tin_ref[rc % TIN_PACK, :][None, :]
    real = ct_ref[rc] < num_tiles
    alive = real & (jnp.max(t_in) > cfg.min_transmittance)

    @pl.when(alive)
    def _():
        # hand-derived VJP (tile_math.chunk_core_bwd): one shared forward
        # recompute, full-lane intermediates; cotangents are the carried
        # d/d t_out plus the additive rgb/depth heads (hit counts: no grad)
        out = chunk_core_bwd(rays_ref[0], chunk_ref[0], t_in,
                             bar_t_ref[0, 0, :][None, :],
                             bar_acc_ref[0, 0:3, :],
                             bar_acc_ref[0, 3:4, :], cfg)
        bar_chunk_ref[0] = out[0]
        bar_t_ref[0, 0, :] = out[1][0, :]
        if cfg.ray_gradients:
            bar_rays_ref[0] += out[2]

    # real-but-saturated chunks emit zero grads; dead trailing chunks ALSO
    # write zeros to their own blocks — bar_chunks must be fully defined:
    # the segreduce backward's clamped dead-row gather reads the last
    # chunk's rows, and uninitialized memory there surfaced as NaN
    # gradients on CPU interpret (0 x NaN = NaN in the 0/1-selection
    # matmul).  The extra dead-region writes are a ~36 MB stream at bench
    # scale — noise next to the kernel.
    @pl.when(jnp.logical_not(alive))
    def _():
        bar_chunk_ref[0] = jnp.zeros_like(bar_chunk_ref[0])


def _pad_rays(rays):
    """Add a dummy tile row: dummy chunks carry tile id == num_tiles, and the
    ray BlockSpec index must stay in bounds (OOB block DMA aborts on TPU)."""
    return jnp.concatenate([rays, jnp.zeros_like(rays[:1])], axis=0)


class _NullRef:
    """Write-sink standing in for the residual ref in the no-residual path."""
    def __setitem__(self, *a):
        pass


def _forward_call(cfg, interpret, with_residuals, chunks, rays, chunk_tile):
    num_chunks, g, _ = chunks.shape
    num_tiles, _, r = rays.shape
    rays = _pad_rays(rays)
    last_real = _last_real(chunk_tile, num_tiles)

    out_shape = [jax.ShapeDtypeStruct((num_tiles + 1, 8, r), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 8, r), lambda c, ct, lr: (ct[c], 0, 0))]
    if with_residuals:
        nc_pad = ((num_chunks + TIN_PACK - 1) // TIN_PACK) * TIN_PACK
        out_shape.append(jax.ShapeDtypeStruct((nc_pad, r), jnp.float32))
        out_specs.append(
            pl.BlockSpec((TIN_PACK, r),
                         lambda c, ct, lr: (c // TIN_PACK, 0)))
        kernel = functools.partial(_fwd_kernel, cfg=cfg, num_tiles=num_tiles)
    else:
        def kernel(ct_ref, lr_ref, rays_ref, chunk_ref, acc_ref,
                   *, _cfg=cfg, _nt=num_tiles):
            _fwd_kernel(ct_ref, lr_ref, rays_ref, chunk_ref, acc_ref,
                        _NullRef(), cfg=_cfg, num_tiles=_nt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, RAY_ROWS, r),
                         lambda c, ct, lr: (ct[c], 0, 0)),
            # dead trailing chunks alias the last real chunk's block: the
            # repeated index skips the re-DMA (one SMEM scalar, not a
            # per-chunk chunk_src map)
            pl.BlockSpec((1, g, 64),
                         lambda c, ct, lr: (jnp.minimum(c, lr[0]), 0, 0)),
        ],
        out_specs=tuple(out_specs) if with_residuals else out_specs[0],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape) if with_residuals else out_shape[0],
        interpret=interpret,
    )(chunk_tile, last_real, rays, chunks)
    return out if with_residuals else (out, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def render_tiles_ad(cfg: RenderConfig, interpret: bool, chunks, rays,
                    chunk_tile):
    """Differentiable fused tile render: returns raw (num_tiles+1, 8, R) acc."""
    acc, _ = _forward_call(cfg, interpret, False, chunks, rays, chunk_tile)
    return acc


def _render_fwd(cfg, interpret, chunks, rays, chunk_tile):
    acc, tin = _forward_call(cfg, interpret, True, chunks, rays, chunk_tile)
    return acc, (chunks, rays, chunk_tile, tin)


def _render_bwd(cfg, interpret, res, bar_acc):
    chunks, rays, chunk_tile, tin = res
    num_chunks, g, _ = chunks.shape
    num_tiles, _, r = rays.shape
    rays = _pad_rays(rays)
    last_real = _last_real(chunk_tile, num_tiles)

    rev = lambda c: num_chunks - 1 - c
    out_specs = [
        pl.BlockSpec((1, 8, r), lambda c, ct, lr: (ct[rev(c)], 0, 0)),
        # identity map (NOT the last-real alias): every chunk — dead
        # trailing ones included — writes its own bar block, so the
        # whole cotangent buffer is defined memory (see _bwd_kernel)
        pl.BlockSpec((1, g, 64),
                     lambda c, ct, lr: (rev(c), 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles + 1, 8, r), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, g, 64), jnp.float32),
    ]
    if cfg.ray_gradients:
        # per-tile ray cotangents, accumulated across the tile's chunks with
        # the same VMEM-resident revisiting as the bar_t carry
        out_specs.append(pl.BlockSpec(
            (1, RAY_ROWS, r), lambda c, ct, lr: (ct[rev(c)], 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((num_tiles + 1, RAY_ROWS, r), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, RAY_ROWS, r),
                         lambda c, ct, lr: (ct[rev(c)], 0, 0)),
            pl.BlockSpec((1, g, 64),
                         lambda c, ct, lr: (jnp.minimum(rev(c), lr[0]),
                                            0, 0)),
            pl.BlockSpec((TIN_PACK, r),
                         lambda c, ct, lr: (rev(c) // TIN_PACK, 0)),
            pl.BlockSpec((1, 8, r), lambda c, ct, lr: (ct[rev(c)], 0, 0)),
        ],
        out_specs=tuple(out_specs),
    )
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, num_chunks=num_chunks,
                          num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(chunk_tile, last_real, rays, chunks, tin, bar_acc)
    bar_chunks = out[1]

    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    if cfg.ray_gradients:
        # tiles that own no chunk were never visited: their blocks are
        # undefined memory AND their true ray gradient is exactly zero
        visited = jnp.zeros((num_tiles + 1,), jnp.int32).at[chunk_tile].set(
            1, mode="drop")
        bar_rays = jnp.where(visited[:num_tiles, None, None] == 1,
                             out[2][:num_tiles], 0.0)
    else:
        # DOCUMENTED silent-zero: with cfg.ray_gradients=False (the
        # default), differentiating w.r.t. anything flowing through `rays`
        # yields zeros — rays are constants in every training path.  Set
        # ray_gradients=True for pose/camera optimization (tested in
        # tests/test_ray_grads.py).
        bar_rays = jnp.zeros_like(rays[:-1])
    return (bar_chunks, bar_rays, int_zero(chunk_tile))


render_tiles_ad.defvjp(_render_fwd, _render_bwd)
