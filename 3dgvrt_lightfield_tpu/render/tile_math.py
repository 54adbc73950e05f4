"""Per-chunk tile math shared by the Pallas kernel and the scan reference.

This is the fused device-side hot loop of the TPU design: for one image tile
(R rays) and one depth-ordered chunk of G Gaussians, evaluate every
(gaussian, ray) pair and advance the per-ray compositing state.  The math is
the same `processHit` chain as the brute-force renderer
(gaussianfunctions.glsl:153-229) but laid out for the VPU/MXU in
**gaussian-major** orientation — Gaussians on sublanes, rays on lanes:

  * the chunk parameter block is ONE fused (G, 64) array sliced by column —
    exactly the layout the binning gather produces with no transpose anywhere
    between HBM and the kernel,
  * all (G, R) quantities are rank-2 broadcasts of (G, 1) x (1, R),
  * the front-to-back prefix transmittance inside a chunk is exp(L @ la) with
    L strictly-lower-triangular ones — an MXU matmul instead of a serial scan,
  * SH radiance is three (G,16)x(16,R) MXU matmuls (coefficients x basis),
    clamped at 0 per pair exactly like `radianceFromSpH` (clamped=true).

Data layouts:
  rays  (24, R): rows [ox oy oz dx dy dz tmin tmax | 16 SH basis rows]
                 — the direction-only SH basis is precomputed once per tile
                 by binning.tile_rays (zero-padded above (sh_degree+1)^2), so
                 neither the forward nor the backward kernel re-evaluates the
                 basis polynomials per chunk
  acc   (8, R):  rows [r g b depth T hit_count pad pad]
  chunk (G, 64): cols [0:3 mean | 3:6 inv_scale | 6:15 rot (row-major
                 local->world R) | 15 density | 16:32 sh_r | 32:48 sh_g |
                 48:64 sh_b]
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

# fused chunk column layout
CH_MEAN = 0      # 3 cols
CH_INV_S = 3     # 3 cols
CH_ROT = 6       # 9 cols, row-major local->world R
CH_DENSITY = 15  # 1 col
CH_SH = 16       # 3 x 16 cols (r, g, b)


def init_acc(r: int, dtype=jnp.float32) -> jnp.ndarray:
    """Fresh accumulator for a tile: black radiance, unit transmittance."""
    acc = jnp.zeros((8, r), dtype)
    return acc.at[ACC_T, :].set(1.0)


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
    o = [rays[j:j + 1, :] for j in range(3)]          # 3 x (1, R)
    d = [rays[3 + j:4 + j, :] for j in range(3)]      # 3 x (1, R)
    tmin = rays[6:7, :]
    tmax = rays[7:8, :]

    m = [chunk[:, CH_MEAN + j:CH_MEAN + j + 1] for j in range(3)]    # (G, 1)
    inv_s = [chunk[:, CH_INV_S + j:CH_INV_S + j + 1] for j in range(3)]
    rot = [chunk[:, CH_ROT + j:CH_ROT + j + 1] for j in range(9)]
    density = chunk[:, CH_DENSITY:CH_DENSITY + 1]                    # (G, 1)

    # world -> unit-local frame: v_local_i = sum_j R[j, i] * v_world_j
    # (R is local->world, so R^T maps world->local; gaussianfunctions.glsl:188)
    gro = []
    grdu = []
    for i in range(3):
        pos_i = sum(rot[3 * j + i] * (o[j] - m[j]) for j in range(3))
        dir_i = sum(rot[3 * j + i] * d[j] for j in range(3))
        gro.append(inv_s[i] * pos_i)     # (G, R)
        grdu.append(inv_s[i] * dir_i)    # (G, R)

    # clamp well above f32-denormal: rsqrt's VJP is ~x^-1.5 and must not
    # overflow to inf for degenerate (padding/dummy) pairs (inf * 0 = NaN)
    nrm2 = grdu[0] * grdu[0] + grdu[1] * grdu[1] + grdu[2] * grdu[2]
    inv_n = jax.lax.rsqrt(jnp.maximum(nrm2, 1e-20))
    grd = [g * inv_n for g in grdu]

    # grayDist = |cross(grd, gro)|^2 (gaussianfunctions.glsl:194-195)
    c0 = grd[1] * gro[2] - grd[2] * gro[1]
    c1 = grd[2] * gro[0] - grd[0] * gro[2]
    c2 = grd[0] * gro[1] - grd[1] * gro[0]
    gray_dist = c0 * c0 + c1 * c1 + c2 * c2

    resp = particle_response(gray_dist, cfg.kernel_degree)
    alpha = jnp.minimum(cfg.max_alpha, resp * density)

    # max-response depth along the ray (gaussianfunctions.glsl:205-206);
    # 1/inv_s hoisted to (G, 1) so no (G, R)-shaped division is issued
    s = [1.0 / inv_s[i] for i in range(3)]
    s_loc = -(grd[0] * gro[0] + grd[1] * gro[1] + grd[2] * gro[2])
    scale_sq = sum((grd[i] * s[i]) ** 2 for i in range(3))
    # clamp: keeps sqrt's VJP finite for degenerate (padding/dummy) pairs
    t = s_loc * jnp.sqrt(jnp.maximum(scale_sq, 1e-20))

    accept = ((resp > cfg.hit_min_response) & (alpha > cfg.alpha_min)
              & (s_loc > 0.0) & (t >= tmin) & (t <= tmax))
    alpha_eff = jnp.where(accept, alpha, 0.0)

    # exclusive in-chunk prefix of log(1-alpha) via strict-lower-tri matmul
    la = jnp.log1p(-alpha_eff)                         # (G, R)
    g = chunk.shape[0]
    gi = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    l_strict = (gj < gi).astype(f32)
    cums_excl = jnp.dot(l_strict, la, preferred_element_type=f32)

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
