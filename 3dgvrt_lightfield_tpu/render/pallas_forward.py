"""Fused forward render kernel (Pallas/Mosaic).

One flat 1D grid over Gaussian chunks; `chunk_tile` (scalar-prefetched) maps
each chunk to its image tile, so consecutive chunks of the same tile keep the
tile's ray block and accumulator block resident in VMEM (Pallas revisiting).
This replaces the reference's raygen/anyhit/processHit pipeline
(raygen.rgen:140-184) — the per-ray k=16 segment re-trace loop becomes the
depth-ordered chunk loop, and the early-out at min transmittance becomes a
whole-tile skip predicate.

The per-chunk math lives in tile_math.chunk_update and is shared with the
lax.scan reference implementation used for allclose validation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .binning import BinnedScene
from .tile_math import ACC_T, chunk_update


def _kernel(chunk_tile_ref, chunk_first_ref, rays_ref, geom_ref, sh_r_ref,
            sh_g_ref, sh_b_ref, acc_ref, *, cfg: RenderConfig):
    c = pl.program_id(0)
    is_first = chunk_first_ref[c] == 1

    @pl.when(is_first)
    def _():
        r = acc_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (r, 8), 1)
        acc_ref[0, :, :] = jnp.where(col == ACC_T, 1.0, 0.0)

    # Whole-tile early exit: skip the chunk when every ray is saturated
    # (raygen.rgen:142 `rayTransmittance > minTransmittance`).
    t_alive = jnp.max(acc_ref[0, :, ACC_T]) > cfg.min_transmittance

    @pl.when(t_alive)
    def _():
        acc_ref[0, :, :] = chunk_update(
            rays_ref[0], geom_ref[0], sh_r_ref[0], sh_g_ref[0], sh_b_ref[0],
            acc_ref[0], cfg)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret"))
def forward_tiles(binned: BinnedScene, rays_tiled: jnp.ndarray,
                  cfg: RenderConfig, interpret: bool = False) -> jnp.ndarray:
    """Run the fused kernel.

    Args:
      binned: output of binning.bin_gaussians.
      rays_tiled: (num_tiles, R, 8) from binning.tile_rays.
      interpret: run in Pallas interpreter mode (CPU testing).

    Returns (num_tiles, R, 8) accumulators (rgb, depth, T, hits).
    """
    num_tiles, r, _ = rays_tiled.shape
    num_chunks, _, g = binned.geom.shape

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
        out_specs=pl.BlockSpec((1, r, 8), lambda c, ct, cf: (ct[c], 0, 0)),
    )

    acc = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles + 1, r, 8), jnp.float32),
        interpret=interpret,
    )(binned.chunk_tile, binned.chunk_first, rays_tiled, binned.geom,
      binned.sh_r, binned.sh_g, binned.sh_b)

    acc = acc[:num_tiles]
    # tiles that received no chunk keep undefined memory: reset to background
    empty = binned.tile_counts == 0
    background = jnp.zeros((8,), jnp.float32).at[ACC_T].set(1.0)
    return jnp.where(empty[:, None, None], background, acc)


def forward_tiles_reference(binned: BinnedScene, rays_tiled: jnp.ndarray,
                            cfg: RenderConfig) -> jnp.ndarray:
    """lax.scan reference of the exact kernel computation (validation path).

    Serial over chunks; numerically identical to the Pallas kernel up to
    float associativity.  Also the interim autodiff path for gradients until
    the hand-written backward kernel lands.
    """
    num_tiles, r, _ = rays_tiled.shape
    background = jnp.zeros((r, 8), jnp.float32).at[:, ACC_T].set(1.0)
    acc0 = jnp.tile(background[None], (num_tiles + 1, 1, 1))

    def step(acc, chunk):
        geom, sh_r, sh_g, sh_b, tile = chunk
        tile_acc = acc[tile]
        alive = jnp.max(tile_acc[:, ACC_T]) > cfg.min_transmittance
        new = jax.lax.cond(
            alive,
            lambda: chunk_update(rays_tiled[jnp.minimum(tile, num_tiles - 1)],
                                 geom, sh_r, sh_g, sh_b, tile_acc, cfg),
            lambda: tile_acc)
        return acc.at[tile].set(new), None

    acc, _ = jax.lax.scan(
        step, acc0,
        (binned.geom, binned.sh_r, binned.sh_g, binned.sh_b,
         binned.chunk_tile))
    acc = acc[:num_tiles]
    empty = binned.tile_counts == 0
    return jnp.where(empty[:, None, None],
                     jnp.zeros((8,), jnp.float32).at[ACC_T].set(1.0), acc)
