"""Quaternion and small vector-math ops (WXYZ convention).

Reference: shaders/glsl/base/utils.glsl:8-57.  The reference stores quaternions
as vec4 with **w in component 0** (WXYZ); its `quaternionWXYZToMatrix` returns
(in GLSL column-major layout) the *transpose* of the standard rotation matrix,
i.e. the world->local rotation used inside `processHit`
(gaussianfunctions.glsl:188-190), while `quaternionWXYZToMatrixTranspose`
returns the standard local->world rotation used by the proxy builder
(particlePrimitives.comp:148,163).

Here `quat_to_rotmat` returns the standard local->world matrix R such that
``v_world = R @ v_local``; world->local is ``R.T @ v``.  All functions are
batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Normalize, returning v unchanged when ||v|| == 0 (utils.glsl:8-11)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    inv = jnp.where(sq > 0.0, jnp.reciprocal(jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0))), 1.0)
    return v * inv


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize WXYZ quaternions, shape (..., 4)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """WXYZ quaternion(s) -> local->world rotation matrix, shape (..., 3, 3).

    Matches utils.glsl:36-57 (`quaternionWXYZToMatrixTranspose`, which in GLSL
    column-major storage is the standard R with rows
    [1-2(yy+zz), 2(xy-wz), 2(xz+wy)], ...).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack([1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)], axis=-1)
    r1 = jnp.stack([2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)], axis=-1)
    r2 = jnp.stack([2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def quat_to_rot9(q: jnp.ndarray) -> jnp.ndarray:
    """WXYZ quaternion(s) (N, 4) -> flat row-major rotation (N, 9).

    Same matrix as `quat_to_rotmat` but emitted as a 2D lane-dense array:
    (N, 3, 3) arrays force XLA into (8, 128)-tiled layouts that pad the
    3-wide minor dims up to 113x at 5M-gaussian scale (measured OOM,
    SCALE_r03.md) — the production pipeline keeps rotations flat and does
    column arithmetic instead (render/binning.py).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
        2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
        2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
    ], axis=-1)
