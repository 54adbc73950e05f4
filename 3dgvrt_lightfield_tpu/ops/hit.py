"""Per-(ray, Gaussian) hit math and front-to-back compositing.

This is the JAX ground-truth port of `processHit`
(shaders/glsl/base/gaussianfunctions.glsl:153-229): transform the ray into the
particle's local (unit-sphere) frame, evaluate the generalized-Gaussian kernel
response at the ray's closest approach, derive alpha and the max-response
depth, and composite front-to-back.

Differences from the reference, by design (documented per SURVEY.md 2.4b):
  - Hits are ordered by the *exact* max-response depth `t` instead of the
    BVH proxy-triangle entry distance (`anyhit.rahit:45` gl_HitTEXT); both
    approximate the same front-to-back order.
  - There is no k=16 hit window: the reference's MAX_HIT_PER_TRACE=16
    (3dgs.glsl:15) only sizes the any-hit payload buffer — its march loop
    re-traces from the last hit until the transmittance floor
    (raygen.rgen:140-184), so all hits are composited there too.  We
    composite all depth-ordered hits directly; the semantics match.
  - Gaussians whose closest approach lies behind the ray origin (s <= 0) are
    rejected explicitly; the reference gets this for free from BVH tmin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kernels import particle_response
from .quaternion import safe_normalize


class HitData(NamedTuple):
    """Per-(ray, gaussian) quantities; all shaped (..., ) broadcast of inputs."""
    response: jnp.ndarray   # kernel response in [0, 1]
    alpha: jnp.ndarray      # min(max_alpha, response * density)
    t: jnp.ndarray          # world-space distance of max response along ray
    accept: jnp.ndarray     # bool hit-acceptance mask
    s_local: jnp.ndarray    # signed ray parameter in the unit local frame


def ray_gaussian_hit(ray_o, ray_d, mean, inv_scale, rot_t, density, *,
                     kernel_degree: int = 4,
                     hit_min_response: float = 0.0113,
                     alpha_min: float = 1.0 / 255.0,
                     max_alpha: float = 0.99) -> HitData:
    """Evaluate one ray against one Gaussian (batched over leading dims).

    Args:
      ray_o, ray_d: (..., 3) world ray origin / unit direction.
      mean: (..., 3) Gaussian center.
      inv_scale: (..., 3) reciprocal of the activated scale.
      rot_t: (..., 3, 3) world->local rotation (R^T of quat_to_rotmat).
      density: (...,) activated opacity.

    Math provenance: gaussianfunctions.glsl:186-206.
    """
    gposc = ray_o - mean
    gposcr = jnp.einsum("...ij,...j->...i", rot_t, gposc,
                        precision=jax.lax.Precision.HIGHEST)
    gro = inv_scale * gposcr
    ray_d_r = jnp.einsum("...ij,...j->...i", rot_t, ray_d,
                         precision=jax.lax.Precision.HIGHEST)
    grdu = inv_scale * ray_d_r
    grd = safe_normalize(grdu)

    gcrod = jnp.cross(grd, gro)
    gray_dist = jnp.sum(gcrod * gcrod, axis=-1)

    response = particle_response(gray_dist, kernel_degree)
    alpha = jnp.minimum(max_alpha, response * density)

    s_local = jnp.sum(grd * (-gro), axis=-1)
    # grds = scale * grd * s  (scale = 1/inv_scale); hitT = |grds|
    grds = (grd / inv_scale) * s_local[..., None]
    t = jnp.sqrt(jnp.sum(grds * grds, axis=-1))

    accept = (response > hit_min_response) & (alpha > alpha_min) & (s_local > 0.0)
    return HitData(response=response, alpha=alpha, t=t, accept=accept,
                   s_local=s_local)


def composite_sorted(alpha: jnp.ndarray, t: jnp.ndarray, rgb: jnp.ndarray,
                     accept: jnp.ndarray, *,
                     min_transmittance: float = 1e-3,
                     t_min=None, t_max=None):
    """Front-to-back composite of per-ray hit lists.

    Sorts hits by `t` along the last hit axis and accumulates
    ``radiance += rgb * alpha * T;  T *= (1 - alpha);  depth += t * alpha * T``
    exactly like gaussianfunctions.glsl:203-219, including the early-out when
    transmittance falls to <= min_transmittance (raygen.rgen:142,155).

    Args:
      alpha: (R, H) per-hit alpha;  t: (R, H) depth;  rgb: (R, H, 3);
      accept: (R, H) bool;  t_min/t_max: optional (R,) AABB clip range.

    Returns:
      dict with rgb (R, 3), depth (R,), transmittance (R,), hit_count (R,).
    """
    if t_min is not None:
        accept = accept & (t >= t_min[..., None])
    if t_max is not None:
        accept = accept & (t <= t_max[..., None])

    big = jnp.asarray(1e20, dtype=t.dtype)
    t_sort = jnp.where(accept, t, big)
    order = jnp.argsort(t_sort, axis=-1)
    alpha_s = jnp.take_along_axis(jnp.where(accept, alpha, 0.0), order, axis=-1)
    t_s = jnp.take_along_axis(t, order, axis=-1)
    rgb_s = jnp.take_along_axis(rgb, order[..., None], axis=-2)

    one_minus = 1.0 - alpha_s
    # exclusive cumulative product: transmittance *before* each hit
    trans_before = jnp.cumprod(one_minus, axis=-1) / jnp.where(one_minus > 0, one_minus, 1.0)
    # Reference semantics: a hit is only processed while T > min_transmittance.
    active = trans_before > min_transmittance
    weight = alpha_s * trans_before * active

    out_rgb = jnp.sum(weight[..., None] * rgb_s, axis=-2)
    out_depth = jnp.sum(weight * t_s, axis=-1)
    out_trans = jnp.prod(jnp.where(active, one_minus, 1.0), axis=-1)
    hit_count = jnp.sum((weight > 0).astype(jnp.int32), axis=-1)
    return {"rgb": out_rgb, "depth": out_depth, "transmittance": out_trans,
            "hit_count": hit_count}
