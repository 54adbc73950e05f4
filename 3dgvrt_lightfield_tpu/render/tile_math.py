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
from ..ops.kernels import particle_response, particle_response_grad

#: SH radiance dots run at 1-pass bf16 (DEFAULT), opting out of the
#: package-wide f32 matmul default: coeffs/basis are O(1) and only feed
#: 8-bit color + its cotangent, so bf16 products cost ~2e-3 relative there
#: while f32 (HIGHEST) measured +39% per pair on the fused kernel (19.6 vs
#: 14.1 ps/pair-eval, v5e).  The r3 on-chip grad failures were caused by
#: bf16 in the DEPTH/cumsum/ray paths (now f32, TPU_TESTS_r03.md), not
#: here — the grad suites re-pass on-chip with DEFAULT SH dots.  Mosaic
#: lowers only DEFAULT/HIGHEST in Pallas, so bf16_3x is not an option.
_SH_PRECISION = jax.lax.Precision.DEFAULT

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
        return jnp.dot(l_strict, la, preferred_element_type=la.dtype,
                       precision=jax.lax.Precision.HIGHEST)
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


def _exclusive_cumprod_g(u: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix product over the Gaussian (sublane) axis of (G, R).

    Shift the sequence down by one (prepend 1) and run the same Hillis-
    Steele shift tree as `_exclusive_cumsum_g`, with multiply: the inclusive
    prefix of the shifted sequence IS the exclusive prefix of the original.
    """
    g, r = u.shape
    x = jnp.concatenate([jnp.ones((1, r), u.dtype), u[:g - 1]], axis=0)
    shift = 1
    while shift < g:
        top = jnp.ones((shift, r), u.dtype)
        x = x * jnp.concatenate([top, x[:g - shift]], axis=0)
        shift *= 2
    return x


def _prod_g(x: jnp.ndarray) -> jnp.ndarray:
    """Product over the Gaussian (sublane) axis: (G, R) -> (1, R).

    Static halving tree (pads to a power of two with ones): predictable
    Mosaic lowering everywhere, no dependence on mul-reduce support.
    """
    g, r = x.shape
    p = 1
    while p < g:
        p *= 2
    if p != g:
        x = jnp.concatenate([x, jnp.ones((p - g, r), x.dtype)], axis=0)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = x[:h] * x[h:]
    return x


def _sum_g(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the Gaussian (sublane) axis: (G, R) -> (1, R).

    Plain VPU sublane sum.  A ones-row MXU contraction was A/B-measured
    +10 ms/frame WORSE at bench scale (spool 014) and removed.
    """
    return jnp.sum(x, axis=0, keepdims=True)


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

    # exclusive in-chunk prefix transmittance over the G axis: direct
    # (1 - alpha) product (transmittance_prod, no transcendentals) or the
    # log-space cumsum formulation
    if cfg.transmittance_prod:
        u = 1.0 - alpha_eff                            # (G, R)
        t_before = t_in * _exclusive_cumprod_g(u)
    else:
        la = jnp.log1p(-alpha_eff)                     # (G, R)
        cums_excl = _exclusive_cumsum_g(la, cfg)
        t_before = t_in * jnp.exp(cums_excl)           # (G, R)
    active = t_before > cfg.min_transmittance
    w = alpha_eff * t_before * active

    # SH radiance per pair: rad_c = clamp(C_c @ basis + 0.5, 0); the basis
    # rows were precomputed per tile (binning.tile_rays), so this is pure MXU
    basis16 = rays[RAY_BASIS, :]
    out_rgb = []
    for c in range(3):
        sh_c = chunk[:, CH_SH + 16 * c:CH_SH + 16 * (c + 1)]       # (G, 16)
        rad = jnp.dot(sh_c, basis16, precision=_SH_PRECISION,
                      preferred_element_type=f32) + 0.5
        rad = jnp.maximum(rad, 0.0)
        out_rgb.append(_sum_g(w * rad))                       # (1, R)

    depth_contrib = _sum_g(w * t)
    hits = _sum_g((accept & active).astype(f32))
    if cfg.transmittance_prod:
        t_out = t_in * _prod_g(jnp.where(active, u, 1.0))
    else:
        la_active = jnp.where(active, la, 0.0)
        t_out = t_in * jnp.exp(_sum_g(la_active))
    return t_out, jnp.concatenate(out_rgb, axis=0), depth_contrib, hits


def chunk_core_bwd(rays: jnp.ndarray, chunk: jnp.ndarray, t_in: jnp.ndarray,
                   bar_tout: jnp.ndarray, bar_rgb: jnp.ndarray,
                   bar_dep: jnp.ndarray, cfg: RenderConfig):
    """Hand-derived VJP of `chunk_core` w.r.t. (chunk, t_in).

    Equivalent to
    ``jax.vjp(lambda ch, ti: chunk_core(rays, ch, ti, cfg))`` with cotangents
    (bar_tout, bar_rgb, bar_dep, 0) — validated element-wise in
    tests/test_backward.py — but written to share one forward recompute and
    keep every intermediate at full (G, R) width (the autodiff graph Mosaic
    builds from jax.vjp measured ~20%% slower).  Tie-breaking of min/max
    gates follows measure-zero conventions (<=, >=), not lax's split-the-tie.

    Returns (bar_chunk (G, 64), bar_tin (1, R)); with cfg.ray_gradients a
    third element bar_rays (24, R) — cotangents w.r.t. the tile's ray block
    (o, d, two zero gate rows, 16 SH basis rows).
    """
    f32 = t_in.dtype
    o = [rays[j:j + 1, :] for j in range(3)]
    d = [rays[3 + j:4 + j, :] for j in range(3)]
    tmin = rays[6:7, :]
    tmax = rays[7:8, :]
    m = [chunk[:, CH_M + j:CH_M + j + 1] for j in range(9)]
    b = [chunk[:, CH_B + j:CH_B + j + 1] for j in range(3)]
    density = chunk[:, CH_DENSITY:CH_DENSITY + 1]

    # ---- forward recompute (identical to chunk_core) ----
    gro, grdu = [], []
    for i in range(3):
        gro.append(m[3 * i] * o[0] + m[3 * i + 1] * o[1]
                   + m[3 * i + 2] * o[2] - b[i])
        grdu.append(m[3 * i] * d[0] + m[3 * i + 1] * d[1]
                    + m[3 * i + 2] * d[2])
    nrm2 = grdu[0] * grdu[0] + grdu[1] * grdu[1] + grdu[2] * grdu[2]
    inv_n2 = 1.0 / jnp.maximum(nrm2, 1e-20)
    c0 = grdu[1] * gro[2] - grdu[2] * gro[1]
    c1 = grdu[2] * gro[0] - grdu[0] * gro[2]
    c2 = grdu[0] * gro[1] - grdu[1] * gro[0]
    cc = c0 * c0 + c1 * c1 + c2 * c2
    gray_dist = cc * inv_n2
    resp = particle_response(gray_dist, cfg.kernel_degree)
    ra = resp * density
    alpha = jnp.minimum(cfg.max_alpha, ra)
    dot_og = grdu[0] * gro[0] + grdu[1] * gro[1] + grdu[2] * gro[2]
    t = -dot_og * inv_n2
    accept = ((resp > cfg.hit_min_response) & (alpha > cfg.alpha_min)
              & (dot_og < 0.0) & (t >= tmin) & (t <= tmax))
    alpha_eff = jnp.where(accept, alpha, 0.0)
    if cfg.transmittance_prod:
        u = 1.0 - alpha_eff
        prod_excl = _exclusive_cumprod_g(u)
        t_before = t_in * prod_excl
        active = t_before > cfg.min_transmittance
        m_tot = _prod_g(jnp.where(active, u, 1.0))               # (1, R)
    else:
        la = jnp.log1p(-alpha_eff)
        cums_excl = _exclusive_cumsum_g(la, cfg)
        ece = jnp.exp(cums_excl)
        t_before = t_in * ece
        active = t_before > cfg.min_transmittance
        la_active = jnp.where(active, la, 0.0)
        s_la = jnp.sum(la_active, axis=0, keepdims=True)
        e_s = jnp.exp(s_la)
    w = alpha_eff * t_before * active
    basis16 = rays[RAY_BASIS, :]

    # ---- reverse ----
    # t_out = t_in * m_tot (== t_in * e_s in the log formulation)
    if cfg.transmittance_prod:
        bar_tin = bar_tout * m_tot                               # (1, R)
        bar_m = bar_tout * t_in                                  # (1, R)
    else:
        bar_tin = bar_tout * e_s                                 # (1, R)
        bar_s = bar_tout * t_in * e_s                            # (1, R)

    # rgb_c = sum_g w * rad_c;  dep = sum_g w * t
    bar_w = bar_dep * t                                          # (G, R)
    bar_sh_cols = []
    bar_pres = []
    for c in range(3):
        sh_c = chunk[:, CH_SH + 16 * c:CH_SH + 16 * (c + 1)]
        rad_pre = jnp.dot(sh_c, basis16, precision=_SH_PRECISION,
                          preferred_element_type=f32) + 0.5
        rad = jnp.maximum(rad_pre, 0.0)
        bar_w = bar_w + bar_rgb[c:c + 1, :] * rad
        bar_pre = jnp.where(rad_pre > 0.0, bar_rgb[c:c + 1, :] * w, 0.0)
        if cfg.ray_gradients:
            bar_pres.append(bar_pre)
        # lane-contraction form: basis16 keeps its (16, R) layout, no
        # transpose relayout (same math as dot(bar_pre, basis16.T))
        bar_sh_cols.append(jax.lax.dot_general(
            bar_pre, basis16, (((1,), (1,)), ((), ())),
            precision=_SH_PRECISION,
            preferred_element_type=f32))                         # (G, 16)

    bar_t = bar_dep * w                                          # (G, R)
    bar_ae = bar_w * t_before * active
    bar_tb = bar_w * alpha_eff * active
    if cfg.transmittance_prod:
        # prod_excl_g = prod_{g'<g} u  =>  bar_u_g = (sum_{g''>g}
        # bar_p * prod_excl)_g / u_g; the masked total product adds
        # active * bar_m * m_tot / u_g.  u >= 1 - max_alpha > 0 always
        # (padding rows have u == 1), so the division is benign — the log
        # formulation divides by the same quantity.
        bar_p = bar_tb * t_in                                    # (G, R)
        bar_tin = bar_tin + _sum_g(bar_tb * prod_excl)
        pp = bar_p * prod_excl
        suffix_pp = _sum_g(pp) - _exclusive_cumsum_g(pp, cfg) - pp
        bar_u = (suffix_pp + jnp.where(active, bar_m * m_tot, 0.0)) / u
        bar_ae = bar_ae - bar_u
    else:
        bar_ce = bar_tb * t_in * ece
        bar_tin = bar_tin + _sum_g(bar_tb * ece)
        # ce_g = sum_{g'<g} la_{g'}  =>  bar_la_g += sum_{g''>g} bar_ce_{g''}
        total_ce = _sum_g(bar_ce)
        bar_la = (total_ce - _exclusive_cumsum_g(bar_ce, cfg) - bar_ce
                  + jnp.where(active, bar_s, 0.0))
        bar_ae = bar_ae - bar_la / (1.0 - alpha_eff)
    bar_alpha = jnp.where(accept, bar_ae, 0.0)
    notclamped = ra <= cfg.max_alpha
    bar_resp = jnp.where(notclamped, bar_alpha * density, 0.0)
    bar_density = jnp.where(notclamped, bar_alpha * resp, 0.0)
    bar_gd = bar_resp * particle_response_grad(gray_dist, resp,
                                               cfg.kernel_degree)
    bar_cc = bar_gd * inv_n2
    bar_u = bar_gd * cc - bar_t * dot_og
    bar_dog = -bar_t * inv_n2

    bar_c0 = 2.0 * c0 * bar_cc
    bar_c1 = 2.0 * c1 * bar_cc
    bar_c2 = 2.0 * c2 * bar_cc
    bar_grdu = [
        -bar_c1 * gro[2] + bar_c2 * gro[1] + bar_dog * gro[0],
        bar_c0 * gro[2] - bar_c2 * gro[0] + bar_dog * gro[1],
        -bar_c0 * gro[1] + bar_c1 * gro[0] + bar_dog * gro[2],
    ]
    bar_gro = [
        bar_c1 * grdu[2] - bar_c2 * grdu[1] + bar_dog * grdu[0],
        -bar_c0 * grdu[2] + bar_c2 * grdu[0] + bar_dog * grdu[1],
        bar_c0 * grdu[1] - bar_c1 * grdu[0] + bar_dog * grdu[2],
    ]
    bar_n2 = jnp.where(nrm2 >= 1e-20, -inv_n2 * inv_n2 * bar_u, 0.0)
    for i in range(3):
        bar_grdu[i] = bar_grdu[i] + 2.0 * grdu[i] * bar_n2

    # gro_i = sum_j m_{3i+j} o_j - b_i ; grdu_i = sum_j m_{3i+j} d_j.
    # VPU cross-lane sums on purpose: rewriting these 16 reductions as
    # (G, R) x (R, k) MXU lane contractions was A/B-measured +11 ms/frame
    # WORSE at bench scale (spool 014, driver round 4) — Mosaic's native
    # reduction lowering wins over small-N HIGHEST-precision matmuls.
    g = chunk.shape[0]
    bar_geom = []                                                # 16 x (G, 1)
    for i in range(3):
        for j in range(3):
            bar_geom.append(jnp.sum(bar_gro[i] * o[j]
                                    + bar_grdu[i] * d[j],
                                    axis=1, keepdims=True))
    for i in range(3):
        bar_geom.append(-jnp.sum(bar_gro[i], axis=1, keepdims=True))
    bar_geom.append(jnp.sum(bar_density, axis=1, keepdims=True))
    bar_geom.append(jnp.zeros((g, 3), f32))
    bar_chunk = jnp.concatenate(bar_geom + bar_sh_cols, axis=1)  # (G, 64)

    if not cfg.ray_gradients:
        return bar_chunk, bar_tin

    # ---- cotangents w.r.t. the (24, R) ray block ----
    # o enters only gro (shared over G), d only grdu, the SH basis rows only
    # the radiance matmuls; tmin/tmax are pure gates (zero a.e.).
    bar_o_rows, bar_d_rows = [], []
    for j in range(3):
        tmp_o = (m[j] * bar_gro[0] + m[3 + j] * bar_gro[1]
                 + m[6 + j] * bar_gro[2])
        tmp_d = (m[j] * bar_grdu[0] + m[3 + j] * bar_grdu[1]
                 + m[6 + j] * bar_grdu[2])
        bar_o_rows.append(_sum_g(tmp_o))
        bar_d_rows.append(_sum_g(tmp_d))
    bar_basis = jnp.zeros_like(basis16)                          # (16, R)
    for c in range(3):
        sh_c = chunk[:, CH_SH + 16 * c:CH_SH + 16 * (c + 1)]
        # (G, 16)^T x (G, R): contract the Gaussian axis on the MXU
        bar_basis = bar_basis + jax.lax.dot_general(
            sh_c, bar_pres[c], (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)
    r_lanes = o[0].shape[1]
    bar_rays = jnp.concatenate(
        bar_o_rows + bar_d_rows + [jnp.zeros((2, r_lanes), f32), bar_basis],
        axis=0)                                                  # (24, R)
    return bar_chunk, bar_tin, bar_rays


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
