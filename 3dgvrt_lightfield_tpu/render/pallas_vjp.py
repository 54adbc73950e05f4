"""Hand-scheduled backward pass for the fused tile renderer (custom VJP).

SURVEY.md section 7 step 4: the backward through the sorted, early-terminated
composite.  Design:

  * `chunk_core` factors the sequential state down to the per-ray
    transmittance, so the only saved residual is T_in per (chunk, ray) —
    O(num_chunks * R) floats, far cheaper than rematerializing hit chains.
  * The backward kernel walks the chunk grid in REVERSE (index maps use
    num_chunks-1-c); because chunks of a tile are contiguous, each tile's
    cotangent carry bar_T stays VMEM-resident exactly like the forward
    accumulator.
  * Inside the kernel the per-chunk gradients come from `jax.vjp` of
    `chunk_core` — Pallas traces through it, so the math is autodiff-exact
    while the schedule (chunking, residency, reverse order) is hand-written.
  * Per-pair parameter gradients (d geom, d SH) leave the kernel as
    (num_chunks, 16, G) blocks; XLA's transpose of the binning gather turns
    them into the per-Gaussian scatter-add automatically, so
    `jax.grad(loss)(model)` works end-to-end through `render_image_tiled`.

Camera-ray gradients are not yet emitted (bar_rays = 0): pose optimization is
out of scope for the training loop (the reference has no trainable cameras).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .tile_math import ACC_T, chunk_core, chunk_update


#: chunks of T_in residual packed per block row (Mosaic needs >=8 sublanes)
TIN_PACK = 16


def _fwd_kernel(ct_ref, cf_ref, rays_ref, geom_ref, sh_r_ref, sh_g_ref,
                sh_b_ref, acc_ref, tin_ref, *, cfg: RenderConfig,
                num_tiles: int):
    c = pl.program_id(0)

    @pl.when(cf_ref[c] == 1)
    def _():
        r = acc_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (r, 8), 1)
        acc_ref[0, :, :] = jnp.where(col == ACC_T, 1.0, 0.0)

    tin_ref[c % TIN_PACK, :] = acc_ref[0, :, ACC_T]
    # skip saturated tiles (raygen.rgen:142) AND dead trailing capacity
    # chunks (tile id == num_tiles): they still DMA but cost no compute
    alive = ((ct_ref[c] < num_tiles)
             & (jnp.max(acc_ref[0, :, ACC_T]) > cfg.min_transmittance))

    @pl.when(alive)
    def _():
        acc_ref[0, :, :] = chunk_update(
            rays_ref[0], geom_ref[0], sh_r_ref[0], sh_g_ref[0], sh_b_ref[0],
            acc_ref[0], cfg)


def _bwd_kernel(ct_ref, cl_ref, rays_ref, geom_ref, sh_r_ref, sh_g_ref,
                sh_b_ref, tin_ref, bar_acc_ref, bar_t_ref, bar_geom_ref,
                bar_shr_ref, bar_shg_ref, bar_shb_ref, *, cfg: RenderConfig,
                num_chunks: int, num_tiles: int):
    c = pl.program_id(0)
    rc = num_chunks - 1 - c

    # first visit of this tile in reverse order == its last forward chunk
    @pl.when(cl_ref[rc] == 1)
    def _():
        bar_t_ref[0, 0, :] = bar_acc_ref[0, :, ACC_T]

    t_in = tin_ref[rc % TIN_PACK, :][:, None]
    alive = ((ct_ref[rc] < num_tiles)
             & (jnp.max(t_in) > cfg.min_transmittance))

    @pl.when(alive)
    def _():
        def f(geom, sh_r, sh_g, sh_b, t_in):
            return chunk_core(rays_ref[0], geom, sh_r, sh_g, sh_b, t_in, cfg)

        _, vjp = jax.vjp(f, geom_ref[0], sh_r_ref[0], sh_g_ref[0],
                         sh_b_ref[0], t_in)
        r = t_in.shape[0]
        cot = (bar_t_ref[0, 0, :][:, None],        # d/d t_out (carry)
               bar_acc_ref[0, :, 0:3],             # d/d rgb_contrib
               bar_acc_ref[0, :, 3:4],             # d/d depth_contrib
               jnp.zeros((r, 1), jnp.float32))     # hit counts: no gradient
        bg, bsr, bsg, bsb, bt = vjp(cot)
        bar_geom_ref[0] = bg
        bar_shr_ref[0] = bsr
        bar_shg_ref[0] = bsg
        bar_shb_ref[0] = bsb
        bar_t_ref[0, 0, :] = bt[:, 0]

    @pl.when(jnp.logical_not(alive))
    def _():
        bar_geom_ref[0] = jnp.zeros_like(bar_geom_ref[0])
        bar_shr_ref[0] = jnp.zeros_like(bar_shr_ref[0])
        bar_shg_ref[0] = jnp.zeros_like(bar_shg_ref[0])
        bar_shb_ref[0] = jnp.zeros_like(bar_shb_ref[0])


def _pad_rays(rays):
    """Add a dummy tile row: dummy chunks carry tile id == num_tiles, and the
    ray BlockSpec index must stay in bounds (OOB block DMA aborts on TPU)."""
    return jnp.concatenate([rays, jnp.zeros_like(rays[:1])], axis=0)


def _forward_call(cfg, interpret, with_residuals, geom, sh_r, sh_g, sh_b,
                  rays, chunk_tile, chunk_first):
    num_chunks, _, g = geom.shape
    num_tiles, r, _ = rays.shape
    rays = _pad_rays(rays)

    out_shape = [jax.ShapeDtypeStruct((num_tiles + 1, r, 8), jnp.float32)]
    out_specs = [pl.BlockSpec((1, r, 8), lambda c, ct, cf: (ct[c], 0, 0))]
    if with_residuals:
        nc_pad = ((num_chunks + TIN_PACK - 1) // TIN_PACK) * TIN_PACK
        out_shape.append(jax.ShapeDtypeStruct((nc_pad, r), jnp.float32))
        out_specs.append(
            pl.BlockSpec((TIN_PACK, r), lambda c, ct, cf: (c // TIN_PACK, 0)))
        kernel = functools.partial(_fwd_kernel, cfg=cfg, num_tiles=num_tiles)
    else:
        def kernel(ct_ref, cf_ref, rays_ref, geom_ref, a, b, d, acc_ref,
                   *, _cfg=cfg, _nt=num_tiles):
            _fwd_kernel(ct_ref, cf_ref, rays_ref, geom_ref, a, b, d, acc_ref,
                        _NullRef(), cfg=_cfg, num_tiles=_nt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, r, 8), lambda c, ct, cf: (ct[c], 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cf: (c, 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cf: (c, 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cf: (c, 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cf: (c, 0, 0)),
        ],
        out_specs=tuple(out_specs) if with_residuals else out_specs[0],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape) if with_residuals else out_shape[0],
        interpret=interpret,
    )(chunk_tile, chunk_first, rays, geom, sh_r, sh_g, sh_b)
    return out if with_residuals else (out, None)


class _NullRef:
    """Write-sink standing in for the residual ref in the no-residual path."""
    def __setitem__(self, *a):
        pass


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def render_tiles_ad(cfg: RenderConfig, interpret: bool, geom, sh_r, sh_g,
                    sh_b, rays, chunk_tile, chunk_first):
    """Differentiable fused tile render: returns raw (num_tiles+1, R, 8) acc."""
    acc, _ = _forward_call(cfg, interpret, False, geom, sh_r, sh_g, sh_b,
                           rays, chunk_tile, chunk_first)
    return acc


def _render_fwd(cfg, interpret, geom, sh_r, sh_g, sh_b, rays, chunk_tile,
                chunk_first):
    acc, tin = _forward_call(cfg, interpret, True, geom, sh_r, sh_g, sh_b,
                             rays, chunk_tile, chunk_first)
    return acc, (geom, sh_r, sh_g, sh_b, rays, chunk_tile, tin)


def _render_bwd(cfg, interpret, res, bar_acc):
    geom, sh_r, sh_g, sh_b, rays, chunk_tile, tin = res
    num_chunks, _, g = geom.shape
    num_tiles, r, _ = rays.shape
    rays = _pad_rays(rays)

    chunk_last = jnp.concatenate([
        (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32),
        jnp.ones((1,), jnp.int32)])

    rev = lambda c: num_chunks - 1 - c
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, r, 8), lambda c, ct, cl: (ct[rev(c)], 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((TIN_PACK, r),
                         lambda c, ct, cl: (rev(c) // TIN_PACK, 0)),
            pl.BlockSpec((1, r, 8), lambda c, ct, cl: (ct[rev(c)], 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, r), lambda c, ct, cl: (ct[rev(c)], 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
            pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        ),
    )
    _, bar_geom, bar_shr, bar_shg, bar_shb = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, num_chunks=num_chunks,
                          num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, 8, r), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
        ),
        interpret=interpret,
    )(chunk_tile, chunk_last, rays, geom, sh_r, sh_g, sh_b, tin, bar_acc)

    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (bar_geom, bar_shr, bar_shg, bar_shb, jnp.zeros_like(rays),
            int_zero(chunk_tile), int_zero(chunk_tile))


render_tiles_ad.defvjp(_render_fwd, _render_bwd)
