"""Camera-ray gradients (cfg.ray_gradients): correctness + pose recovery.

Closes the r3 verdict's "silent zero" hole: with the flag on, the backward
kernel emits per-tile ray cotangents (origins, directions, SH basis rows),
so `jax.grad` w.r.t. anything flowing through the rays — camera pose, per-
ray jitter — is exact instead of silently zero.  Ground truth is plain
autodiff through the lax.scan reference renderer, which differentiates
w.r.t. the rays array natively.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_forward import (forward_dispatch,
                                            forward_tiles_reference)
from gvrt_tpu.render.tiled import _camera_mats

IMPL_PL = "pallas" if os.environ.get("GVRT_TEST_TPU") else "interpret"

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128,
                                ray_gradients=True)


def _scene(n=64, seed=3):
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.7)
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def _binned(model, cam, cfg):
    w2c, proj = _camera_mats(cam)
    cap = binning.plan_capacity(model.activate(), w2c, proj, cam.width,
                                cam.height, cfg)
    b = binning.bin_gaussians(model.activate(), w2c, proj, cam.width,
                              cam.height, cfg, *cap)
    rays = binning.tile_rays(cam, cfg)
    return b, rays


def test_ray_grads_match_scan_autodiff():
    """Custom-VJP bar_rays == autodiff of the scan reference w.r.t. rays."""
    model = _scene()
    res = 16
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    b, rays = _binned(model, cam, CFG)

    def loss_pl(r):
        acc = forward_dispatch(b, r, CFG, IMPL_PL)
        return jnp.mean(acc[:, 0:3, :] ** 2) + 1e-2 * jnp.mean(acc[:, 3, :])

    def loss_scan(r):
        acc = forward_tiles_reference(b, r, CFG)
        return jnp.mean(acc[:, 0:3, :] ** 2) + 1e-2 * jnp.mean(acc[:, 3, :])

    g_pl = jax.grad(loss_pl)(rays)
    g_scan = jax.grad(loss_scan)(rays)
    a, h = np.asarray(g_scan), np.asarray(g_pl)
    assert np.abs(a).max() > 0, "degenerate: zero ray grads"
    scale = np.abs(a).max()
    # on-chip: hand-VJP vs autodiff hit accept-gate knife edges on a couple
    # of elements (measured 2/6144 at 5.9e-5, driver-round-4 suite run)
    atol = 1e-4 if os.environ.get("GVRT_TEST_TPU") else 3e-5
    np.testing.assert_allclose(h / scale, a / scale, atol=atol)
    # gate rows (tmin/tmax) carry no gradient in either formulation
    assert np.abs(h[:, 6:8, :]).max() == 0


def test_ray_grads_silent_zero_when_off():
    """Documented default: flag off -> ray cotangents are exactly zero."""
    model = _scene()
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    cfg0 = CFG.replace(ray_gradients=False)
    b, rays = _binned(model, cam, cfg0)
    g = jax.grad(lambda r: jnp.mean(
        forward_dispatch(b, r, cfg0, IMPL_PL)[:, 0:3, :] ** 2))(rays)
    assert np.abs(np.asarray(g)).max() == 0


def test_pose_recovery_smoke():
    """A translated camera recovers its pose by gradient descent through
    the rays: new capability beyond the reference (which has no gradients
    at all — SURVEY.md section 0)."""
    model = _scene(96, seed=5)
    res = 16
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    b, rays0 = _binned(model, cam, CFG)
    target = forward_dispatch(b, rays0, CFG, IMPL_PL)[:, 0:3, :]

    def render_offset(delta):
        # translate every ray origin by delta: the differentiable stand-in
        # for a camera-position parameter (tile_rays is plain jnp, so a full
        # pose chain differentiates the same way)
        r = rays0.at[:, 0:3, :].add(delta[None, :, None])
        acc = forward_dispatch(b, r, CFG, IMPL_PL)
        return jnp.mean((acc[:, 0:3, :] - target) ** 2)

    delta = jnp.asarray([0.03, -0.02, 0.04])
    loss0 = float(render_offset(delta))
    assert loss0 > 1e-8
    step = jax.jit(jax.value_and_grad(render_offset))
    lr, prev = 2.0, loss0
    for _ in range(40):
        val, g = step(delta)
        assert np.isfinite(float(val))
        if float(val) > prev:       # overshot: back off the step size
            lr *= 0.5
        prev = float(val)
        delta = delta - lr * g
    loss1 = float(render_offset(delta))
    assert loss1 < 0.2 * loss0, (loss0, loss1)
    assert float(jnp.linalg.norm(delta)) < 0.7 * float(
        jnp.linalg.norm(jnp.asarray([0.03, -0.02, 0.04])))


@pytest.mark.parametrize("variant", [
    {"transmittance_prod": False},
])
def test_ray_grads_variant_flags(variant):
    """Ray cotangents stay exact under the kernel implementation variants."""
    model = _scene()
    res = 16
    cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    cfg_v = CFG.replace(**variant)
    b, rays = _binned(model, cam, cfg_v)

    g_pl = jax.grad(lambda r: jnp.mean(
        forward_dispatch(b, r, cfg_v, IMPL_PL)[:, 0:3, :] ** 2))(rays)
    g_scan = jax.grad(lambda r: jnp.mean(
        forward_tiles_reference(b, r, cfg_v)[:, 0:3, :] ** 2))(rays)
    a, h = np.asarray(g_scan), np.asarray(g_pl)
    scale = np.abs(a).max() + 1e-12
    atol = 1e-4 if os.environ.get("GVRT_TEST_TPU") else 3e-5
    np.testing.assert_allclose(h / scale, a / scale, atol=atol)
