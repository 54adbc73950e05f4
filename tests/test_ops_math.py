"""Unit tests of kernel math against closed-form values.

Mirrors SURVEY.md section 4's test plan item (a): particleResponse, SH eval,
local-frame transform, kernelScale against tiny closed-form cases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3


def test_particle_response_degree4_closed_form():
    # exp(-4.5/81 * d^2) at d = 9 (i.e. |x| = 3 scale units) == kernel cutoff
    d = jnp.asarray(9.0)
    got = g3.ops.particle_response(d, degree=4)
    want = np.exp(-0.0555555555556 * 81.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # response at 0 is 1 for all degrees
    for deg in (0, 1, 3, 4, 5, 8, 2):
        np.testing.assert_allclose(
            g3.ops.particle_response(jnp.asarray(0.0), degree=deg), 1.0, rtol=1e-6)


def test_kernel_scale_is_iso_response_radius():
    # response(kernel_scale^2) == min_response for the generalized kernels
    for deg in (1, 3, 4, 5, 8):
        r = g3.ops.kernel_scale(jnp.asarray(1.0), 0.0113, kernel_degree=deg)
        resp = g3.ops.particle_response(r * r, degree=deg)
        # rtol covers TPU exp/log/pow ULP error (measured 6e-5 on v5e)
        np.testing.assert_allclose(resp, 0.0113, rtol=2e-4)


def test_kernel_scale_reference_value():
    # degree 4, minResponse 0.0113: r = (log(m)/a)^(1/4), a = -4.5/81
    r = float(g3.ops.kernel_scale(jnp.asarray(1.0), 0.0113, kernel_degree=4))
    want = (np.log(0.0113) / (-4.5 / 81.0)) ** 0.25
    # rtol covers TPU log/pow ULP error (measured 4.6e-6 on v5e)
    np.testing.assert_allclose(r, want, rtol=2e-5)


def test_quat_to_rotmat_identity_and_axis():
    ident = g3.ops.quat_to_rotmat(jnp.asarray([1.0, 0, 0, 0]))
    np.testing.assert_allclose(ident, np.eye(3), atol=1e-7)
    # 90 degrees about z: w = cos(45deg), z = sin(45deg)
    s = np.sqrt(0.5)
    rz = g3.ops.quat_to_rotmat(jnp.asarray([s, 0.0, 0.0, s]))
    want = np.array([[0.0, -1.0, 0], [1.0, 0.0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(rz, want, atol=1e-6)
    # rotation matrices are orthonormal with det +1 for random quats
    q = g3.ops.normalize_quat(jnp.asarray(np.random.default_rng(1).normal(size=(32, 4))))
    r = g3.ops.quat_to_rotmat(q)
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", r, r),
                               np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), np.ones(32), atol=1e-5)


def test_sh_degree0_is_constant():
    coeffs = jnp.zeros((16, 3)).at[0].set(jnp.asarray([1.0, 2.0, -0.5]))
    for d in ([0.0, 0, 1], [1, 0, 0], [0.577, 0.577, 0.577]):
        rad = g3.ops.radiance_from_sh(coeffs, jnp.asarray(d), degree=3,
                                      clamped=False)
        want = 0.28209479177387814 * np.array([1.0, 2.0, -0.5]) + 0.5
        np.testing.assert_allclose(rad, want, rtol=1e-5)


def test_sh_matches_reference_formula():
    """Full degree-3 eval vs a literal transcription of radianceFromSpH."""
    rng = np.random.default_rng(2)
    coeffs = rng.normal(size=(16, 3)).astype(np.float32)
    d = rng.normal(size=3)
    d = d / np.linalg.norm(d)
    x, y, z = d

    SH_C0 = 0.28209479177387814
    SH_C1 = 0.4886025119029199
    SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
             -1.0925484305920792, 0.5462742152960396]
    SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
             0.3731763325901154, -0.4570457994644658, 1.445305721320277,
             -0.5900435899266435]
    rad = SH_C0 * coeffs[0]
    rad = rad - SH_C1 * y * coeffs[1] + SH_C1 * z * coeffs[2] - SH_C1 * x * coeffs[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    rad = (rad + SH_C2[0] * xy * coeffs[4] + SH_C2[1] * yz * coeffs[5]
           + SH_C2[2] * (2 * zz - xx - yy) * coeffs[6]
           + SH_C2[3] * xz * coeffs[7] + SH_C2[4] * (xx - yy) * coeffs[8])
    rad = (rad + SH_C3[0] * y * (3 * xx - yy) * coeffs[9]
           + SH_C3[1] * xy * z * coeffs[10]
           + SH_C3[2] * y * (4 * zz - xx - yy) * coeffs[11]
           + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[12]
           + SH_C3[4] * x * (4 * zz - xx - yy) * coeffs[13]
           + SH_C3[5] * z * (xx - yy) * coeffs[14]
           + SH_C3[6] * x * (xx - 3 * yy) * coeffs[15])
    want = np.maximum(rad + 0.5, 0.0)

    got = g3.ops.radiance_from_sh(jnp.asarray(coeffs), jnp.asarray(d), degree=3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_intersect_aabb_negative_direction():
    """The reference's max(rayDir, 1e-6) bug must NOT be reproduced."""
    aabb = (-1.0, -1, -1, 1, 1, 1)
    o = jnp.asarray([[5.0, 0, 0]])
    d = jnp.asarray([[-1.0, 0, 0]])
    tmin, tmax = g3.ops.intersect_aabb(aabb, o, d)
    np.testing.assert_allclose(tmin, [4.0], atol=1e-5)
    np.testing.assert_allclose(tmax, [6.0], atol=1e-5)
    # ray starting inside
    tmin, tmax = g3.ops.intersect_aabb(aabb, jnp.zeros((1, 3)),
                                       jnp.asarray([[0.0, 1.0, 0]]))
    np.testing.assert_allclose(tmin, [0.0], atol=1e-6)
    np.testing.assert_allclose(tmax, [1.0], atol=1e-5)


def test_gaussian_world_aabb_contains_samples():
    rng = np.random.default_rng(3)
    n = 64
    q = g3.ops.normalize_quat(jnp.asarray(rng.normal(size=(n, 4))))
    rot = g3.ops.quat_to_rotmat(q)
    means = jnp.asarray(rng.normal(size=(n, 3)))
    scales = jnp.asarray(np.exp(rng.uniform(-3, 0, size=(n, 3))))
    radius = jnp.full((n,), 3.0)
    lo, hi = g3.ops.gaussian_world_aabb(means, scales, rot, radius)
    # sample points on the iso ellipsoid surface; all must be inside the AABB
    u = rng.normal(size=(n, 128, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pts = np.asarray(means)[:, None] + np.einsum(
        "nij,nkj->nki", np.asarray(rot), 3.0 * np.asarray(scales)[:, None] * u)
    assert (pts >= np.asarray(lo)[:, None] - 1e-5).all()
    assert (pts <= np.asarray(hi)[:, None] + 1e-5).all()


def test_hit_math_isotropic_closed_form():
    """Isotropic Gaussian on the z-axis: analytic response and depth."""
    cfg = g3.DEFAULT_CONFIG
    sigma = 0.5
    center = jnp.asarray([0.3, 0.0, 4.0])
    ray_o = jnp.zeros(3)
    ray_d = jnp.asarray([0.0, 0.0, 1.0])
    hit = g3.ops.ray_gaussian_hit(
        ray_o, ray_d, center, jnp.full(3, 1.0 / sigma), jnp.eye(3),
        jnp.asarray(0.9), kernel_degree=cfg.kernel_degree)
    # local frame: gro = (center in local units) * -1 ... closest approach
    # offset is 0.3/sigma = 0.6 scale units; grayDist = 0.36
    np.testing.assert_allclose(hit.response,
                               np.exp(-0.0555555555556 * 0.36 ** 2), rtol=1e-5)
    # depth of max response: z distance 4.0 (perpendicular offset preserved)
    np.testing.assert_allclose(hit.t, 4.0, rtol=1e-5)
    assert bool(hit.accept)
    # behind the camera -> rejected
    hit_b = g3.ops.ray_gaussian_hit(
        ray_o, ray_d, jnp.asarray([0.0, 0.0, -4.0]), jnp.full(3, 1.0 / sigma),
        jnp.eye(3), jnp.asarray(0.9))
    assert not bool(hit_b.accept)


def test_composite_sorted_two_hit_closed_form():
    alpha = jnp.asarray([[0.5, 0.25]])
    t = jnp.asarray([[2.0, 1.0]])  # second hit is nearer
    rgb = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0]]])
    accept = jnp.ones((1, 2), bool)
    out = g3.ops.composite_sorted(alpha, t, rgb, accept)
    # nearer (green, a=0.25) first: w=0.25; then red w=0.5*0.75
    np.testing.assert_allclose(out["rgb"][0], [0.375, 0.25, 0.0], rtol=1e-6)
    np.testing.assert_allclose(out["transmittance"][0], 0.375, rtol=1e-6)
    np.testing.assert_allclose(out["depth"][0], 0.25 * 1.0 + 0.375 * 2.0, rtol=1e-6)
    assert int(out["hit_count"][0]) == 2


def test_composite_early_termination():
    # 10 hits of alpha 0.9: T before hit i is 0.1^i; with min_transmittance
    # 0.05 only hits 0 and 1 are processed (0.01 < 0.05 stops the march).
    n = 10
    alpha = jnp.full((1, n), 0.9)
    t = jnp.arange(1.0, n + 1)[None]
    rgb = jnp.ones((1, n, 3))
    accept = jnp.ones((1, n), bool)
    out = g3.ops.composite_sorted(alpha, t, rgb, accept, min_transmittance=0.05)
    assert int(out["hit_count"][0]) == 2
    np.testing.assert_allclose(out["rgb"][0, 0], 0.9 * (1 + 0.1), rtol=1e-5)
