"""Ray/AABB slab intersection.

Reference: shaders/glsl/base/gaussianfunctions.glsl:8-16 (`intersectAABB`).
The reference divides by ``max(rayDir, 1e-6)`` per component, which clamps
*negative* direction components — a bug for rays pointing towards -x/-y/-z
(SURVEY.md 2.4b).  We reproduce the *intent* (a standard robust slab test):
divide by the direction with its magnitude clamped away from zero, preserving
sign.
"""

from __future__ import annotations

import jax.numpy as jnp


def intersect_aabb(aabb, ray_o: jnp.ndarray, ray_d: jnp.ndarray):
    """Returns (tmin, tmax) of the ray/AABB overlap, with tmin clamped to >= 0.

    Args:
      aabb: sequence of 6 floats (minx, miny, minz, maxx, maxy, maxz).
      ray_o: (..., 3) ray origins.
      ray_d: (..., 3) ray directions (need not be normalized).
    """
    lo = jnp.asarray(aabb[:3], dtype=ray_o.dtype)
    hi = jnp.asarray(aabb[3:], dtype=ray_o.dtype)
    safe_d = jnp.where(jnp.abs(ray_d) < 1e-6, jnp.where(ray_d < 0, -1e-6, 1e-6), ray_d)
    inv = 1.0 / safe_d
    t0 = (lo - ray_o) * inv
    t1 = (hi - ray_o) * inv
    tmin = jnp.maximum(0.0, jnp.max(jnp.minimum(t0, t1), axis=-1))
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax


def gaussian_world_aabb(means: jnp.ndarray, scales: jnp.ndarray,
                        rotmats: jnp.ndarray, radius: jnp.ndarray):
    """Conservative world-space AABB of each Gaussian's iso-response ellipsoid.

    The ellipsoid is ``{mean + R @ (radius*scale * u) : |u|=1}``; its tight
    world AABB half-extent along axis i is ``radius * sqrt(sum_j (R[i,j]*scale[j])^2)``.
    This replaces the reference's icosahedron proxy mesh
    (particlePrimitives.comp:153-185) — TPUs have no RT cores, so Gaussians are
    bucketed into image tiles by AABB overlap instead of BVH traversal.

    Args:
      means: (N, 3); scales: (N, 3) activated; rotmats: (N, 3, 3) local->world;
      radius: (N,) or scalar kernel radius in scale units (see kernel_scale).
    Returns:
      (lo, hi): each (N, 3).
    """
    half = jnp.sqrt(jnp.sum((rotmats * scales[:, None, :]) ** 2, axis=-1))
    half = half * jnp.reshape(radius, (-1, 1))
    return means - half, means + half
