"""Spherical-harmonics radiance evaluation (degree <= 3).

Reference: shaders/glsl/base/gaussianfunctions.glsl:122-151 (`radianceFromSpH`)
with basis constants from 3dgs.glsl:34-49.  Radiance gets a +0.5 offset and an
optional clamp at 0, exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SH_C0, SH_C1, SH_C2, SH_C3


def sh_basis_components(x, y, z, degree: int):
    """List of (degree+1)**2 SH basis values from direction components.

    Shared by `sh_basis` (ray-major, stacks on the last axis) and the
    gaussian-major tile kernel (stacks rows); formulas match the reference's
    signed basis (3dgs.glsl:34-49, gaussianfunctions.glsl:122-151).
    """
    one = jnp.ones_like(x)
    basis = [SH_C0 * one]
    if degree > 0:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree > 2:
        basis += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return basis


def sh_basis(direction: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH basis values for a world-space view direction.

    Args:
      direction: (..., 3) unit view direction (the *ray* direction, not the
        direction to the camera — see raygen.rgen:215 passing `rayDirection`).
      degree: static SH degree in [0, 3].

    Returns:
      (..., (degree+1)**2) basis values matching the reference's signed basis.
    """
    num = (degree + 1) ** 2
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    out = jnp.stack(sh_basis_components(x, y, z, degree), axis=-1)
    assert out.shape[-1] == num
    return out


def radiance_from_sh(coeffs: jnp.ndarray,
                     direction: jnp.ndarray,
                     degree: int = 3,
                     clamped: bool = True) -> jnp.ndarray:
    """Evaluate RGB radiance from SH coefficients.

    Args:
      coeffs: (..., 16, 3) coefficients, coeff-major interleaved RGB
        (the layout produced by the PLY loader's f_rest reorder,
        base/Vulkan3DGRTModel.cpp:70-77).
      direction: (..., 3) world-space ray direction.
      degree: evaluation degree (uboStatic.sphEvalDegree, VulkanUtils.h:56).
      clamped: clamp radiance at 0 after the +0.5 offset
        (gaussianfunctions.glsl:149-150).
    """
    num = (degree + 1) ** 2
    basis = sh_basis(direction, degree)  # (..., num)
    rad = jnp.einsum("...k,...kc->...c", basis, coeffs[..., :num, :],
                     precision=jax.lax.Precision.HIGHEST) + 0.5
    if clamped:
        rad = jnp.maximum(rad, 0.0)
    return rad
