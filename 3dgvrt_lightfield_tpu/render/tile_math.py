"""Per-chunk tile math shared by the Pallas kernel and the scan reference.

This is the fused device-side hot loop of the TPU design: for one image tile
(R rays) and one depth-ordered chunk of G Gaussians, evaluate every
(ray, gaussian) pair and advance the per-ray compositing state.  The math is
the same `processHit` chain as the brute-force renderer
(gaussianfunctions.glsl:153-229) but laid out for the VPU/MXU:

  * all (R, G) quantities are rank-2 broadcasts (rays on sublanes, Gaussians
    on lanes),
  * the front-to-back prefix transmittance inside a chunk is computed as
    exp(la @ U) with U strictly-upper-triangular ones — an MXU matmul instead
    of a serial scan,
  * SH radiance is three (R,16)x(16,G) MXU matmuls (basis x coefficients),
    clamped at 0 per pair exactly like `radianceFromSpH` (clamped=true).

Data layouts:
  rays  (R, 8):  [ox oy oz dx dy dz tmin tmax]
  acc   (R, 8):  [r g b depth T hit_count pad pad]
  geom  (16, G): [mx my mz  isx isy isz  r00 r01 r02 r10 r11 r12 r20 r21 r22
                  density]  (is* = 1/scale; r** = local->world rotation R)
  sh_c  (16, G): SH coefficients of channel c (16 coeffs per Gaussian)
Padding Gaussians have density == 0 (=> alpha 0, no contribution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops.kernels import particle_response
from ..ops.sh import sh_basis

ACC_RGB = slice(0, 3)
ACC_DEPTH = 3
ACC_T = 4
ACC_HITS = 5


def init_acc(r: int, dtype=jnp.float32) -> jnp.ndarray:
    """Fresh accumulator for a tile: black radiance, unit transmittance."""
    acc = jnp.zeros((r, 8), dtype)
    return acc.at[:, ACC_T].set(1.0)


def chunk_core(rays: jnp.ndarray, geom: jnp.ndarray, sh_r: jnp.ndarray,
               sh_g: jnp.ndarray, sh_b: jnp.ndarray, t_in: jnp.ndarray,
               cfg: RenderConfig):
    """Evaluate one Gaussian chunk against a tile's rays.

    The accumulator enters only through the per-ray transmittance `t_in`
    (R, 1); radiance/depth/hit-count are additive, so this is the exact
    sequential-composite step factored for a cheap backward residual.

    Returns (t_out (R, 1), rgb_contrib (R, 3), depth_contrib (R, 1),
    hits (R, 1)).
    """
    f32 = t_in.dtype
    o = [rays[:, j:j + 1] for j in range(3)]          # 3 x (R, 1)
    d = [rays[:, 3 + j:4 + j] for j in range(3)]      # 3 x (R, 1)
    tmin = rays[:, 6:7]
    tmax = rays[:, 7:8]

    m = [geom[j:j + 1, :] for j in range(3)]          # 3 x (1, G)
    inv_s = [geom[3 + j:4 + j, :] for j in range(3)]  # 3 x (1, G)
    rot = [geom[6 + j:7 + j, :] for j in range(9)]    # 9 x (1, G), row-major R
    density = geom[15:16, :]                          # (1, G)

    # world -> unit-local frame: v_local_i = sum_j R[j, i] * v_world_j
    # (R is local->world, so R^T maps world->local; gaussianfunctions.glsl:188)
    gro = []
    grdu = []
    for i in range(3):
        pos_i = sum(rot[3 * j + i] * (o[j] - m[j]) for j in range(3))
        dir_i = sum(rot[3 * j + i] * d[j] for j in range(3))
        gro.append(inv_s[i] * pos_i)     # (R, G)
        grdu.append(inv_s[i] * dir_i)    # (R, G)

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

    # max-response depth along the ray (gaussianfunctions.glsl:205-206)
    s_loc = -(grd[0] * gro[0] + grd[1] * gro[1] + grd[2] * gro[2])
    scale_sq = sum((grd[i] / inv_s[i]) ** 2 for i in range(3))
    # clamp: keeps sqrt's VJP finite for degenerate (padding/dummy) pairs
    t = s_loc * jnp.sqrt(jnp.maximum(scale_sq, 1e-20))

    accept = ((resp > cfg.hit_min_response) & (alpha > cfg.alpha_min)
              & (s_loc > 0.0) & (t >= tmin) & (t <= tmax))
    alpha_eff = jnp.where(accept, alpha, 0.0)

    # exclusive in-chunk prefix of log(1-alpha) via strict-upper-tri matmul
    la = jnp.log1p(-alpha_eff)
    g = geom.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    u_strict = (gi < gj).astype(f32)
    cums_excl = jnp.dot(la, u_strict, preferred_element_type=f32)

    t_before = t_in * jnp.exp(cums_excl)               # (R, G)
    active = t_before > cfg.min_transmittance
    w = alpha_eff * t_before * active

    # SH radiance per pair: rad_c = clamp(basis @ C_c + 0.5, 0)
    dirs = rays[:, 3:6]
    basis = sh_basis(dirs, cfg.sh_degree).astype(f32)  # (R, 16)
    num = (cfg.sh_degree + 1) ** 2
    basis16 = basis if num == 16 else jnp.concatenate(
        [basis, jnp.zeros((rays.shape[0], 16 - num), f32)], axis=1)
    out_rgb = []
    for sh_c in (sh_r, sh_g, sh_b):
        rad = jnp.dot(basis16, sh_c, preferred_element_type=f32) + 0.5
        rad = jnp.maximum(rad, 0.0)
        out_rgb.append(jnp.sum(w * rad, axis=1, keepdims=True))  # (R, 1)

    depth_contrib = jnp.sum(w * t, axis=1, keepdims=True)
    hits = jnp.sum((accept & active).astype(f32), axis=1, keepdims=True)
    la_active = jnp.where(active, la, 0.0)
    t_out = t_in * jnp.exp(jnp.sum(la_active, axis=1, keepdims=True))
    return t_out, jnp.concatenate(out_rgb, axis=1), depth_contrib, hits


def chunk_update(rays, geom, sh_r, sh_g, sh_b, acc, cfg: RenderConfig):
    """Composite one Gaussian chunk into the (R, 8) tile accumulator."""
    t_in = acc[:, ACC_T:ACC_T + 1]
    t_out, rgb_c, depth_c, hits = chunk_core(rays, geom, sh_r, sh_g, sh_b,
                                             t_in, cfg)
    return jnp.concatenate(
        [acc[:, 0:3] + rgb_c,
         acc[:, 3:4] + depth_c,
         t_out,
         acc[:, 5:6] + hits,
         acc[:, 6:8]], axis=1)
