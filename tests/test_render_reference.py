"""Brute-force renderer: behavior + finite-difference gradient checks.

BASELINE.json config[0]: synthetic Gaussians, pinhole camera, CPU JAX forward
+ finite-diff grad check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3
from gvrt_tpu.render.reference import render_image, render_rays


def _scene(n=64, seed=0):
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.8)
    # push gaussians in front of the camera at z in [-3.5, -2.5]
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def _camera(res=32):
    return g3.Camera.from_fovy(res, res, 60.0, np.eye(4), znear=0.005, zfar=20.0)


def test_render_image_shapes_and_sanity():
    model = _scene(64)
    cam = _camera(24)
    out = render_image(model, cam)
    assert out["rgb"].shape == (24, 24, 3)
    assert out["depth"].shape == (24, 24)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    t = np.asarray(out["transmittance"])
    assert (t >= 0).all() and (t <= 1.0 + 1e-6).all()
    # something was hit
    assert np.asarray(out["hit_count"]).sum() > 0
    # radiance is nonnegative (SH clamped) and weights sum <= 1
    assert (np.asarray(out["rgb"]) >= 0).all()


def test_empty_scene_is_black():
    model = _scene(8)
    model.means = model.means + 1000.0  # outside default AABB
    cam = _camera(8)
    out = render_image(model, cam)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["transmittance"]), 1.0, atol=1e-7)


def test_opaque_wall_saturates_transmittance():
    """A dense slab of overlapping gaussians terminates the march."""
    model = _scene(256, seed=3)
    model.means = jnp.concatenate(
        [0.2 * jax.random.normal(jax.random.key(9), (256, 2)),
         -3.0 + 0.1 * jax.random.normal(jax.random.key(10), (256, 1))], axis=1)
    model.opacity_logit = jnp.full((256,), 8.0)  # density ~1
    model.scales_log = jnp.full((256, 3), -1.0)
    cam = _camera(8)
    out = render_image(model, cam)
    center_t = np.asarray(out["transmittance"])[3:5, 3:5]
    assert (center_t < 1e-2).all()


def test_chunking_invariance():
    model = _scene(32)
    cam = _camera(16)
    a = render_image(model, cam, chunk=256)
    b = render_image(model, cam, chunk=37)
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=5e-6)


def test_finite_difference_gradients():
    """Autodiff grads of the full render match central finite differences.

    This validates the composite's differentiability; the Pallas backward is
    later checked against these same autodiff grads.
    """
    model = _scene(12, seed=4)
    cam = _camera(8)
    ray_o, ray_d = cam.rays()
    ray_o = jnp.asarray(ray_o.reshape(-1, 3))
    ray_d = jnp.asarray(ray_d.reshape(-1, 3))
    cfg = g3.DEFAULT_CONFIG

    def loss(m):
        out = render_rays(m.activate(), ray_o, ray_d, cfg)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth"]) * 1e-2

    grads = jax.grad(loss)(model)

    rng = np.random.default_rng(11)
    f0 = float(loss(model))
    assert f0 > 0
    checked = 0
    for field in ("means", "scales_log", "quats", "opacity_logit", "sh_dc",
                  "sh_rest"):
        arr = np.asarray(getattr(model, field), np.float64)
        g_arr = np.asarray(getattr(grads, field), np.float64)
        # probe the two largest-|grad| coordinates per field
        flat_idx = np.argsort(-np.abs(g_arr).ravel())[:2]
        for fi in flat_idx:
            idx = np.unravel_index(fi, arr.shape)
            eps = 3e-4 * max(1.0, abs(arr[idx]))
            pert = arr.copy(); pert[idx] += eps
            m_p = _replace_field(model, field, pert)
            pert2 = arr.copy(); pert2[idx] -= eps
            m_m = _replace_field(model, field, pert2)
            fd = (float(loss(m_p)) - float(loss(m_m))) / (2 * eps)
            an = g_arr[idx]
            if abs(fd) < 1e-7 and abs(an) < 1e-7:
                continue
            np.testing.assert_allclose(
                an, fd, rtol=5e-2, atol=1e-5,
                err_msg=f"grad mismatch at {field}{idx}")
            checked += 1
    assert checked >= 6


def _replace_field(model, field, value):
    import dataclasses
    return dataclasses.replace(model, **{field: jnp.asarray(value, jnp.float32)})


def test_render_matches_manual_single_gaussian():
    """One isotropic Gaussian: compare against hand-computed compositing."""
    cfg = g3.DEFAULT_CONFIG
    model = g3.GaussianModel(
        means=jnp.asarray([[0.0, 0.0, -2.0]]),
        scales_log=jnp.asarray([[np.log(0.3)] * 3]),
        quats=jnp.asarray([[1.0, 0, 0, 0]]),
        opacity_logit=jnp.asarray([2.0]),
        sh_dc=jnp.asarray([[0.8, -0.2, 0.1]]),
        sh_rest=jnp.zeros((1, 15, 3)),
    )
    ray_o = jnp.zeros((1, 3))
    ray_d = jnp.asarray([[0.0, 0.0, -1.0]])
    out = render_rays(model.activate(), ray_o, ray_d, cfg)
    density = 1 / (1 + np.exp(-2.0))
    alpha = min(0.99, 1.0 * density)  # dead-center: response=1
    rgb_g = np.maximum(0.28209479177387814 * np.array([0.8, -0.2, 0.1]) + 0.5, 0)
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), alpha * rgb_g, rtol=1e-5)
    np.testing.assert_allclose(float(out["depth"][0]), alpha * 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(out["transmittance"][0]), 1 - alpha, rtol=1e-5)
