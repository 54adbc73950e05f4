"""Generalized-Gaussian kernel response, activations, and kernel radius.

Reference math:
  - particle_response: shaders/glsl/base/gaussianfunctions.glsl:18-57
  - kernel_scale:      shaders/glsl/VulkanFullRT/particlePrimitives.comp:81-105
  - activations (exp scale / sigmoid opacity): particlePrimitives.comp:149-151
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# s-coefficients per kernel degree (gaussianfunctions.glsl:18-57).  For the
# generalized Gaussian of degree b the scaling is a = -4.5 / 3**b
# (particlePrimitives.comp:98-101); degrees 0 and "default" are special-cased.
_RESPONSE_S = {
    8: -0.000685871056241,
    5: -0.0185185185185,
    4: -0.0555555555556,
    3: -0.166666666667,
    1: -1.5,
    0: -0.329630334487,
}


def particle_response(gray_dist: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Kernel response as a function of squared local-frame min distance.

    `gray_dist` is |cross(grd, gro)|^2 (gaussianfunctions.glsl:194-195); the
    response is exp(s * gray_dist**(b/2) ) with the degree table above.
    """
    if degree == 8:
        d2 = gray_dist * gray_dist
        return jnp.exp(_RESPONSE_S[8] * d2 * d2)
    if degree == 5:
        return jnp.exp(_RESPONSE_S[5] * gray_dist * gray_dist * jnp.sqrt(gray_dist))
    if degree == 4:
        return jnp.exp(_RESPONSE_S[4] * gray_dist * gray_dist)
    if degree == 3:
        return jnp.exp(_RESPONSE_S[3] * gray_dist * jnp.sqrt(gray_dist))
    if degree == 1:
        return jnp.exp(_RESPONSE_S[1] * jnp.sqrt(gray_dist))
    if degree == 0:
        return jnp.maximum(1.0 + _RESPONSE_S[0] * jnp.sqrt(gray_dist), 0.0)
    # default: quadratic (true Gaussian)
    return jnp.exp(-0.5 * gray_dist)


def kernel_scale(density: jnp.ndarray,
                 modulated_min_response: float,
                 kernel_degree: float = 4.0,
                 adaptive_clamping: bool = False) -> jnp.ndarray:
    """Iso-response radius r with response(r^2) == min_response.

    Used to size the per-Gaussian bounding volume (particlePrimitives.comp:81-105).
    Returns the radius in units of (activated) scale.
    """
    modulation = density if adaptive_clamping else jnp.ones_like(density)
    min_response = jnp.minimum(modulated_min_response / modulation, 0.97)

    if kernel_degree < 0:  # bump kernel
        k = abs(kernel_degree)
        s = 1.0 / (3.0 ** k)
        return ((1.0 / (jnp.log(min_response) - 1.0) + 1.0) / s) ** (1.0 / k)
    if kernel_degree == 0:  # linear kernel
        return ((1.0 - min_response) / 3.0) / 0.329630334487
    b = kernel_degree
    a = -4.5 / (3.0 ** b)
    return (jnp.log(min_response) / a) ** (1.0 / b)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Opacity activation (particlePrimitives.comp:107-110)."""
    return jax.nn.sigmoid(x)


def scale_activation(scale_log: jnp.ndarray) -> jnp.ndarray:
    """Scale activation (particlePrimitives.comp:149)."""
    return jnp.exp(scale_log)


def particle_response_grad(gray_dist: jnp.ndarray, resp: jnp.ndarray,
                           degree: int = 4) -> jnp.ndarray:
    """d(particle_response)/d(gray_dist), given the forward response.

    Used by the hand-written backward kernel (render/tile_math.chunk_core_bwd)
    so the transcendental is not recomputed.  Matches autodiff of
    `particle_response` for each degree branch.
    """
    s = _RESPONSE_S.get(degree)
    if degree == 8:
        d2 = gray_dist * gray_dist
        return resp * s * 4.0 * d2 * gray_dist
    if degree == 5:
        return resp * s * 2.5 * gray_dist * jnp.sqrt(gray_dist)
    if degree == 4:
        return resp * s * 2.0 * gray_dist
    if degree == 3:
        return resp * s * 1.5 * jnp.sqrt(gray_dist)
    if degree == 1:
        return resp * s * 0.5 / jnp.sqrt(jnp.maximum(gray_dist, 1e-20))
    if degree == 0:
        inner = 1.0 + s * jnp.sqrt(jnp.maximum(gray_dist, 1e-20))
        return jnp.where(inner > 0.0,
                         s * 0.5 / jnp.sqrt(jnp.maximum(gray_dist, 1e-20)),
                         0.0)
    return -0.5 * resp
