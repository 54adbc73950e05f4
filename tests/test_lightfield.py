"""Gaussian light-field precompute tests."""

import numpy as np
import jax
import pytest

import gvrt_tpu as g3
from gvrt_tpu.models.lightfield import (LightFieldConfig, compute_light_field,
                                        sampling_cameras, save_light_field)

LF = LightFieldConfig(width=40, height=40, tile_size=8)


def _scene(n=48):
    model = g3.random_gaussians(jax.random.key(0), n, extent=0.5)
    return model


def test_sampling_camera_placement():
    model = _scene()
    cams = sampling_cameras(model, LF)
    assert len(cams) == 4
    pos = np.asarray(model.means)
    lo, hi = pos.min(0), pos.max(0)
    center = (lo + hi) / 2
    max_r = (hi - lo).max() / 2
    eyes = np.stack([c.view_inverse[:3, 3] for c in cams])
    # +-X and +-Y placement at radius max_r (VulkanFullRT.cpp:1558)
    np.testing.assert_allclose(eyes[0], center + [max_r, 0, 0], atol=1e-6)
    np.testing.assert_allclose(eyes[1], center + [0, max_r, 0], atol=1e-6)
    np.testing.assert_allclose(eyes[2], center - [max_r, 0, 0], atol=1e-6)
    np.testing.assert_allclose(eyes[3], center - [0, max_r, 0], atol=1e-6)
    # every camera looks at the center
    for cam in cams:
        o, d = cam.rays()
        mid = d[LF.height // 2 - 1: LF.height // 2 + 1,
                LF.width // 2 - 1: LF.width // 2 + 1].mean((0, 1))
        to_center = center - cam.view_inverse[:3, 3]
        to_center /= np.linalg.norm(to_center)
        assert np.dot(mid / np.linalg.norm(mid), to_center) > 0.99


def test_compute_and_save_light_field(tmp_path):
    model = _scene()
    res = compute_light_field(model, LF, impl="scan")
    assert res["images"].shape == (4, 40, 40, 3)
    assert res["ray_dirs"].shape == (4, 40, 40, 3)
    assert np.isfinite(res["images"]).all()
    # ray dirs are unit length
    np.testing.assert_allclose(
        np.linalg.norm(res["ray_dirs"], axis=-1), 1.0, atol=1e-5)
    # the object is visible from at least one camera
    assert res["images"].max() > 0.01
    paths = save_light_field(str(tmp_path), res)
    assert len(paths) == 4
    img = g3.io.load_png(paths[0])
    assert img.shape == (40, 40, 3)
    rd = np.load(tmp_path / "ray_dirs.npy")
    assert rd.shape == (4, 40, 40, 3)


def test_light_field_sharded_matches_single(tmp_path):
    from gvrt_tpu.parallel import make_mesh
    model = _scene()
    mesh = make_mesh(4)
    res_s = compute_light_field(model, LF, impl="scan", mesh=mesh)
    res_1 = compute_light_field(model, LF, impl="scan")
    np.testing.assert_allclose(res_s["images"], res_1["images"], atol=1e-5)
