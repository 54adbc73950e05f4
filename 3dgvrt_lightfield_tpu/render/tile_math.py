"""Per-chunk tile math shared by the Pallas kernel and the scan reference.

This is the fused device-side hot loop of the TPU design: for one image tile
(R rays) and one depth-ordered chunk of G Gaussians, evaluate every
(gaussian, ray) pair and advance the per-ray compositing state.  The math is
the same `processHit` chain as the brute-force renderer
(gaussianfunctions.glsl:153-229) but algebraically restructured for the
VPU/MXU in **gaussian-major** orientation (Gaussians on sublanes, rays on
lanes), with three exact identities that remove most per-pair work:

  * the world->unit-local frame is prefolded per Gaussian into ONE affine map
    ``M = diag(1/s) @ R^T`` and offset ``b = M @ mean`` at binning time, so the
    kernel's frame transform is 9 MACs per pair instead of scale+rotate,
  * the local origin is ``gro = M @ o - b`` and the direction transform is
    ``grdu = M @ d`` (both computed at full (G, R) width: a (G, 1) hoisted
    origin is algebraically cheaper for pinhole cameras but measured 40%
    SLOWER under Mosaic — see the note in `chunk_core`),
  * normalization is deferred: with ``n2 = |grdu|^2``,
    ``grayDist = |cross(grdu, gro)|^2 / n2`` and (because R is orthogonal and
    |d| = 1) the max-response depth collapses to ``t = -(grdu . gro) / n2``
    — no sqrt/rsqrt anywhere (gaussianfunctions.glsl:194-206 computes the
    same values through an explicit unit-local frame).

The front-to-back prefix transmittance inside a chunk is a log-space
exclusive cumsum over the G axis; SH radiance is an MXU matmul of
(G, 16) coefficients x (16, R) precomputed basis rows, clamped at 0 per pair
exactly like `radianceFromSpH` (clamped=true).

Data layouts:
  rays  (24, R): rows [ox oy oz dx dy dz tmin tmax | 16 SH basis rows]
                 — origins may vary per ray; the direction-only SH basis is
                 precomputed once per tile by binning.tile_rays (zero-padded
                 above (sh_degree+1)^2)
  acc   (8, R):  rows [r g b depth T hit_count pad pad]
  chunk (G, 64): cols [0:9 M row-major (world->unit-local, scale folded) |
                 9:12 b = M @ mean | 12 density | 13:16 pad |
                 16:32 sh_r | 32:48 sh_g | 48:64 sh_b]
Padding Gaussians have density == 0 (=> alpha 0, no contribution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops.kernels import particle_response

ACC_RGB = slice(0, 3)
ACC_DEPTH = 3
ACC_T = 4
ACC_HITS = 5

#: rows per tile ray block: 8 geometry rows + 16 precomputed SH basis rows
RAY_ROWS = 24
RAY_BASIS = slice(8, 24)

# fused chunk column layout (v2: prefolded affine frame)
CH_M = 0         # 9 cols, row-major M = diag(1/s) @ R^T
CH_B = 9         # 3 cols, b = M @ mean
CH_DENSITY = 12  # 1 col
CH_SH = 16       # 3 x 16 cols (r, g, b)


def init_acc(r: int, dtype=jnp.float32) -> jnp.ndarray:
    """Fresh accumulator for a tile: black radiance, unit transmittance."""
    acc = jnp.zeros((8, r), dtype)
    return acc.at[ACC_T, :].set(1.0)


def _exclusive_cumsum_g(la: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Exclusive prefix sum over the Gaussian (sublane) axis of (G, R)."""
    if cfg.prefix_matmul:
        # strict-lower-triangular ones matmul: one MXU pass per chunk
        g = la.shape[0]
        gi = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        l_strict = (gj < gi).astype(la.dtype)
        return jnp.dot(l_strict, la, preferred_element_type=la.dtype)
    # Hillis-Steele over sublanes: log2(G) shifted adds.  Hand-rolled with
    # concat+static-slice because lax.cumsum has no Mosaic TPU lowering.
    g, r = la.shape
    x = la
    shift = 1
    while shift < g:
        top = jnp.zeros((shift, r), la.dtype)
        x = x + jnp.concatenate([top, x[:g - shift]], axis=0)
        shift *= 2
    return x - la


def chunk_core(rays: jnp.ndarray, chunk: jnp.ndarray, t_in: jnp.ndarray,
               cfg: RenderConfig):
    """Evaluate one Gaussian chunk against a tile's rays.

    The accumulator enters only through the per-ray transmittance `t_in`
    (1, R); radiance/depth/hit-count are additive, so this is the exact
    sequential-composite step factored for a cheap backward residual.

    Returns (t_out (1, R), rgb_contrib (3, R), depth_contrib (1, R),
    hits (1, R)).
    """
    f32 = t_in.dtype
    # NOTE: origins are per-ray (G, R) work even though a pinhole camera
    # makes them tile-constant: the "hoisted" (G, 1) formulation measured
    # 21 ms vs 15 ms per frame on v5e — Mosaic handles (G, 1)-shaped
    # intermediates far worse than full-lane ops (scripts/tpu_kernel_ab2.py)
    o = [rays[j:j + 1, :] for j in range(3)]          # 3 x (1, R)
    d = [rays[3 + j:4 + j, :] for j in range(3)]      # 3 x (1, R)
    tmin = rays[6:7, :]
    tmax = rays[7:8, :]

    m = [chunk[:, CH_M + j:CH_M + j + 1] for j in range(9)]          # (G, 1)
    b = [chunk[:, CH_B + j:CH_B + j + 1] for j in range(3)]          # (G, 1)
    density = chunk[:, CH_DENSITY:CH_DENSITY + 1]                    # (G, 1)

    # local origin (per Gaussian, ray-independent) and local direction
    gro = []
    grdu = []
    for i in range(3):
        gro.append(m[3 * i] * o[0] + m[3 * i + 1] * o[1]
                   + m[3 * i + 2] * o[2] - b[i])                     # (G, 1)
        grdu.append(m[3 * i] * d[0] + m[3 * i + 1] * d[1]
                    + m[3 * i + 2] * d[2])                           # (G, R)

    # clamp well above f32-denormal: the reciprocal's VJP must stay finite
    # for degenerate (padding/dummy) pairs (inf * 0 = NaN)
    nrm2 = grdu[0] * grdu[0] + grdu[1] * grdu[1] + grdu[2] * grdu[2]
    inv_n2 = 1.0 / jnp.maximum(nrm2, 1e-20)

    # grayDist = |cross(grd, gro)|^2 with grd = grdu/|grdu| deferred
    # (gaussianfunctions.glsl:194-195)
    c0 = grdu[1] * gro[2] - grdu[2] * gro[1]
    c1 = grdu[2] * gro[0] - grdu[0] * gro[2]
    c2 = grdu[0] * gro[1] - grdu[1] * gro[0]
    gray_dist = (c0 * c0 + c1 * c1 + c2 * c2) * inv_n2

    resp = particle_response(gray_dist, cfg.kernel_degree)
    alpha = jnp.minimum(cfg.max_alpha, resp * density)

    # max-response depth: t = s_loc * sqrt(scale_sq) of the reference
    # (gaussianfunctions.glsl:205-206) reduces to -(grdu.gro)/|grdu|^2
    # because scale_sq = |R^T d|^2/|grdu|^2 = 1/|grdu|^2 for orthogonal R
    # and unit d
    dot_og = grdu[0] * gro[0] + grdu[1] * gro[1] + grdu[2] * gro[2]
    t = -dot_og * inv_n2

    accept = ((resp > cfg.hit_min_response) & (alpha > cfg.alpha_min)
              & (dot_og < 0.0) & (t >= tmin) & (t <= tmax))
    alpha_eff = jnp.where(accept, alpha, 0.0)

    # exclusive in-chunk prefix of log(1-alpha) over the G axis
    la = jnp.log1p(-alpha_eff)                         # (G, R)
    cums_excl = _exclusive_cumsum_g(la, cfg)

    t_before = t_in * jnp.exp(cums_excl)               # (G, R)
    active = t_before > cfg.min_transmittance
    w = alpha_eff * t_before * active

    # SH radiance per pair: rad_c = clamp(C_c @ basis + 0.5, 0); the basis
    # rows were precomputed per tile (binning.tile_rays), so this is pure MXU
    basis16 = rays[RAY_BASIS, :]
    out_rgb = []
    for c in range(3):
        sh_c = chunk[:, CH_SH + 16 * c:CH_SH + 16 * (c + 1)]       # (G, 16)
        rad = jnp.dot(sh_c, basis16, preferred_element_type=f32) + 0.5
        rad = jnp.maximum(rad, 0.0)
        out_rgb.append(jnp.sum(w * rad, axis=0, keepdims=True))    # (1, R)

    depth_contrib = jnp.sum(w * t, axis=0, keepdims=True)
    hits = jnp.sum((accept & active).astype(f32), axis=0, keepdims=True)
    la_active = jnp.where(active, la, 0.0)
    t_out = t_in * jnp.exp(jnp.sum(la_active, axis=0, keepdims=True))
    return t_out, jnp.concatenate(out_rgb, axis=0), depth_contrib, hits


def chunk_update(rays, chunk, acc, cfg: RenderConfig):
    """Composite one Gaussian chunk into the (8, R) tile accumulator."""
    t_in = acc[ACC_T:ACC_T + 1, :]
    t_out, rgb_c, depth_c, hits = chunk_core(rays, chunk, t_in, cfg)
    return jnp.concatenate(
        [acc[0:3, :] + rgb_c,
         acc[3:4, :] + depth_c,
         t_out,
         acc[5:6, :] + hits,
         acc[6:8, :]], axis=0)
