"""Brute-force pure-JAX renderer — the differentiable ground truth.

Evaluates every Gaussian against every ray (O(N * rays)), sorts hits by exact
max-response depth, and composites front-to-back with the reference's
termination criteria.  This is the "step 1" renderer of SURVEY.md section 7:
slower than the tiled/Pallas production path but trivially correct and
autodiff-differentiable, so it serves as the allclose target for both the
forward images and the hand-derived Pallas VJP.

Device-side algorithm provenance: raygen.rgen:113-189 + anyhit.rahit:40-71 +
gaussianfunctions.glsl:153-229, collapsed into one sorted composite (the k=16
segment re-trace loop of the reference enumerates the same hits in the same
order; see ops/hit.py for the documented ordering difference).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig, DEFAULT_CONFIG
from ..models.gaussians import ActivatedGaussians, GaussianModel
from ..ops.aabb import intersect_aabb
from ..ops.hit import composite_sorted, ray_gaussian_hit
from ..ops.sh import radiance_from_sh


def render_rays(gaussians: ActivatedGaussians, ray_o: jnp.ndarray,
                ray_d: jnp.ndarray, cfg: RenderConfig = DEFAULT_CONFIG):
    """Render a flat batch of rays against all Gaussians.

    Args:
      gaussians: activated scene (see GaussianModel.activate()).
      ray_o, ray_d: (R, 3) ray origins / unit directions.

    Returns dict of rgb (R, 3), depth (R,), transmittance (R,), hit_count (R,).
    """
    rot_t = jnp.swapaxes(gaussians.rotmats, -1, -2)  # world->local

    hit = ray_gaussian_hit(
        ray_o[:, None, :], ray_d[:, None, :],
        gaussians.means[None], gaussians.inv_scales[None], rot_t[None],
        gaussians.densities[None],
        kernel_degree=cfg.kernel_degree,
        hit_min_response=cfg.hit_min_response,
        alpha_min=cfg.alpha_min,
        max_alpha=cfg.max_alpha)

    # Radiance depends only on the ray direction -> evaluate once per pair.
    rgb = radiance_from_sh(gaussians.sh_coeffs[None], ray_d[:, None, :],
                           degree=cfg.sh_degree, clamped=True)

    tmin, tmax = intersect_aabb(cfg.aabb, ray_o, ray_d)
    return composite_sorted(hit.alpha, hit.t, rgb, hit.accept,
                            min_transmittance=cfg.min_transmittance,
                            t_min=tmin, t_max=tmax)


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def _render_chunked(gaussians: ActivatedGaussians, ray_o, ray_d,
                    cfg: RenderConfig, chunk: int):
    n_rays = ray_o.shape[0]
    n_chunks = n_rays // chunk
    o = ray_o[: n_chunks * chunk].reshape(n_chunks, chunk, 3)
    d = ray_d[: n_chunks * chunk].reshape(n_chunks, chunk, 3)
    out = jax.lax.map(lambda od: render_rays(gaussians, od[0], od[1], cfg),
                      (o, d))
    out = jax.tree.map(lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:]), out)
    rem = n_rays - n_chunks * chunk
    if rem:
        tail = render_rays(gaussians, ray_o[n_chunks * chunk:],
                           ray_d[n_chunks * chunk:], cfg)
        out = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), out, tail)
    return out


def render_image(model: GaussianModel, camera,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 chunk: Optional[int] = None):
    """Render a full camera image with the brute-force renderer.

    Returns dict with rgb (H, W, 3) etc.  Use only for validation/small scenes;
    the tiled renderer is the production path.
    """
    ray_o, ray_d = camera.rays()
    h, w = ray_o.shape[:2]
    chunk = chunk or cfg.ray_chunk
    gauss = model.activate()
    flat = _render_chunked(gauss, jnp.asarray(ray_o.reshape(-1, 3)),
                           jnp.asarray(ray_d.reshape(-1, 3)), cfg,
                           min(chunk, h * w))
    return jax.tree.map(lambda a: a.reshape((h, w) + a.shape[1:]), flat)
