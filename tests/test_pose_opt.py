"""App-level pose optimization (train/pose.py, r4 verdict item 7).

The unit machinery (ray cotangents vs scan autodiff) lives in
tests/test_ray_grads.py; these tests cover the productized layer: in-graph
ray generation from 6-DOF deltas, pose baking, and end-to-end recovery of
perturbed dataset poses through `optimize_camera_poses`.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.render.binning import tile_rays
from gvrt_tpu.train.pose import (apply_pose_delta, optimize_camera_poses,
                                 perturb_cameras, rodrigues, tile_rays_pose)

IMPL = "pallas" if os.environ.get("GVRT_TEST_TPU") else "interpret"
CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)


def _scene(n=96, seed=5):
    model = g3.random_gaussians(jax.random.key(seed), n, extent=0.7)
    model.means = model.means.at[:, 2].add(-3.0)
    return model


def test_rodrigues_basics():
    np.testing.assert_allclose(np.asarray(rodrigues(jnp.zeros(3))),
                               np.eye(3), atol=1e-7)
    # quarter turn about z (host-side product: no TPU matmul rounding)
    r = np.asarray(rodrigues(jnp.asarray([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(r @ np.asarray([1.0, 0, 0]),
                               [0.0, 1.0, 0.0], atol=1e-6)
    # gradient at the identity is finite (small-angle series)
    g = jax.grad(lambda v: jnp.sum(rodrigues(v)))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_tile_rays_pose_zero_delta_matches_tile_rays():
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    base = tile_rays(cam, CFG)
    posed = tile_rays_pose(cam, CFG, jnp.zeros(3), jnp.zeros(3))
    # tile_rays computes in float64 then casts; the traced path is f32
    # (tmin/tmax reach ~100 from the scene AABB -> ~1e-5 absolute)
    np.testing.assert_allclose(np.asarray(posed), np.asarray(base),
                               rtol=1e-6, atol=2e-6)


def test_apply_pose_delta_roundtrip():
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    dt, dr = np.asarray([0.1, -0.2, 0.05]), np.asarray([0.02, 0.03, -0.01])
    moved = apply_pose_delta(cam, dt, dr)
    # rays of the baked camera == in-graph rays at the delta (rtol covers
    # f32 rounding of the AABB-scale tmin/tmax rows; worst on-chip element
    # 3e-7 relative)
    np.testing.assert_allclose(np.asarray(tile_rays(moved, CFG)),
                               np.asarray(tile_rays_pose(cam, CFG, dt, dr)),
                               rtol=1e-6, atol=2e-5)


def test_optimize_camera_poses_recovers_perturbation():
    """End-to-end: targets rendered at true poses; cameras perturbed; the
    optimizer must close most of the photometric gap."""
    from gvrt_tpu.render.tiled import render_image_tiled
    model = _scene()
    res = 16
    true_cam = g3.Camera.from_fovy(res, res, 60.0, np.eye(4))
    target = np.asarray(
        render_image_tiled(model, true_cam, CFG, impl=IMPL)["rgb"])
    bad_cams = perturb_cameras([true_cam], sigma_t=0.03, seed=3)
    fixed, reports = optimize_camera_poses(
        model, bad_cams, [target], CFG, steps=60, lr=5e-3, impl=IMPL,
        verbose=False)
    rep = reports[0]
    assert rep["loss1"] < 0.35 * rep["loss0"], rep
    # the recovered pose is closer to the true camera than the perturbed one
    err_bad = np.linalg.norm(bad_cams[0].view_inverse[:3, 3]
                             - true_cam.view_inverse[:3, 3])
    err_fix = np.linalg.norm(fixed[0].view_inverse[:3, 3]
                             - true_cam.view_inverse[:3, 3])
    assert err_fix < err_bad, (err_fix, err_bad)
