"""Fused forward render entry points (Pallas/Mosaic).

One flat 1D grid over Gaussian chunks; `chunk_tile` (scalar-prefetched) maps
each chunk to its image tile, so consecutive chunks of the same tile keep the
tile's ray block and accumulator block resident in VMEM (Pallas revisiting).
This replaces the reference's raygen/anyhit/processHit pipeline
(raygen.rgen:140-184) — the per-ray k=16 segment re-trace loop becomes the
depth-ordered chunk loop, and the early-out at min transmittance becomes a
whole-tile skip predicate.

The kernels live in pallas_vjp.py (forward, forward-with-residual, and the
reverse-walk backward registered as a custom VJP); the per-chunk math is
tile_math.chunk_core, shared with the lax.scan reference used for validation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .binning import BinnedScene
from .pallas_vjp import render_tiles_ad
from .tile_math import ACC_T, chunk_update


def _background_fix(acc, tile_counts):
    """Tiles that received no chunk keep undefined memory: reset to sky."""
    empty = tile_counts == 0
    background = jnp.zeros((8, 1), jnp.float32).at[ACC_T, :].set(1.0)
    return jnp.where(empty[:, None, None], background[None], acc)


def forward_tiles(binned: BinnedScene, rays_tiled: jnp.ndarray,
                  cfg: RenderConfig, interpret: bool = False) -> jnp.ndarray:
    """Run the fused kernel; differentiable via the custom VJP.

    Args:
      binned: output of binning.bin_gaussians.
      rays_tiled: (num_tiles, 24, R) from binning.tile_rays.
      interpret: run in Pallas interpreter mode (CPU testing).

    Returns (num_tiles, 8, R) accumulators (rgb, depth, T, hits rows).
    """
    num_tiles = rays_tiled.shape[0]
    acc = render_tiles_ad(cfg, interpret, binned.chunks, rays_tiled,
                          binned.chunk_tile)
    return _background_fix(acc[:num_tiles], binned.tile_counts)


def forward_dispatch(binned: BinnedScene, rays_tiled: jnp.ndarray,
                     cfg: RenderConfig, impl: str) -> jnp.ndarray:
    """Single impl -> kernel dispatch shared by every render path.

    (tiled/banded/sharded/combined all route through here; the ladder used
    to be copy-pasted four times and drifted — one helper, one behavior.)
    """
    if impl == "pallas":
        return forward_tiles(binned, rays_tiled, cfg, interpret=False)
    if impl == "interpret":
        return forward_tiles(binned, rays_tiled, cfg, interpret=True)
    if impl == "scan":
        return forward_tiles_reference(binned, rays_tiled, cfg)
    raise ValueError(f"unknown impl {impl!r}")


def forward_tiles_reference(binned: BinnedScene, rays_tiled: jnp.ndarray,
                            cfg: RenderConfig) -> jnp.ndarray:
    """lax.scan reference of the exact kernel computation (validation path).

    Serial over chunks; numerically identical to the Pallas kernel up to
    float associativity, and differentiable by plain autodiff — the ground
    truth for the hand-written backward kernel.
    """
    num_tiles, _, r = rays_tiled.shape
    background = jnp.zeros((8, r), jnp.float32).at[ACC_T, :].set(1.0)
    acc0 = jnp.tile(background[None], (num_tiles + 1, 1, 1))
    # inherit device-varying type under shard_map (scan carry must match body)
    acc0 = acc0 + 0.0 * rays_tiled[0, 0, 0]

    def step(acc, chunk):
        data, tile = chunk
        tile_acc = acc[tile]
        alive = ((tile < num_tiles)
                 & (jnp.max(tile_acc[ACC_T, :]) > cfg.min_transmittance))
        new = jax.lax.cond(
            alive,
            lambda: chunk_update(rays_tiled[jnp.minimum(tile, num_tiles - 1)],
                                 data, tile_acc, cfg),
            lambda: tile_acc)
        return acc.at[tile].set(new), None

    acc, _ = jax.lax.scan(step, acc0, (binned.chunks, binned.chunk_tile))
    return _background_fix(acc[:num_tiles], binned.tile_counts)
