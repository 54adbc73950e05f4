"""PLY round-trip, camera model, and metrics tests."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import gvrt_tpu as g3


def _random_splats(rng, n=17):
    return g3.SplatSet(
        positions=rng.normal(size=(n, 3)).astype(np.float32),
        scale=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.normal(size=n).astype(np.float32),
        f_dc=rng.normal(size=(n, 3)).astype(np.float32),
        f_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
    )


def test_ply_roundtrip(tmp_path, rng):
    splats = _random_splats(rng)
    path = str(tmp_path / "test.ply")
    g3.save_splats(path, splats)
    loaded = g3.load_splats(path)
    for field in ("positions", "scale", "rotation", "opacity", "f_dc", "f_rest"):
        np.testing.assert_array_equal(getattr(loaded, field),
                                      getattr(splats, field), err_msg=field)


def test_ply_f_rest_reorder(tmp_path, rng):
    """f_rest_{c*15+i} (channel-major on disk) -> (N, 15, 3) coeff-major.

    Matches the loader reorder in base/Vulkan3DGRTModel.cpp:70-77.
    """
    splats = _random_splats(rng, n=3)
    path = str(tmp_path / "t.ply")
    g3.save_splats(path, splats)
    raw = g3.io.ply.read_ply_arrays(path)
    for i in range(15):
        for c in range(3):
            np.testing.assert_array_equal(raw[f"f_rest_{c * 15 + i}"],
                                          splats.f_rest[:, i, c])


def test_native_ply_parser_matches_numpy(tmp_path, rng):
    from gvrt_tpu.native import ply_native
    if not ply_native.available():
        if not ply_native.build():
            pytest.skip("native toolchain unavailable")
    splats = _random_splats(rng, n=101)
    path = str(tmp_path / "n.ply")
    g3.save_splats(path, splats)
    a = g3.io.ply.read_ply_arrays(path)
    b = ply_native.read_ply_arrays(path)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_perspective_vulkan_matrix():
    """Literal check against the glm patch (matrix_transform.inl:274-290)."""
    fovy, aspect, n, f = math.radians(40.0), 1.5, 0.005, 20.0
    t = math.tan(fovy / 2)
    p = g3.perspective_vulkan(fovy, aspect, n, f)
    assert p[0, 0] == pytest.approx(1 / (aspect * t))
    assert p[1, 1] == pytest.approx(-1 / t)
    assert p[2, 2] == pytest.approx(-f / (f - n))
    assert p[2, 3] == pytest.approx(-(f * n) / (f - n))
    assert p[3, 2] == -1.0


def test_camera_rays_center_and_corners():
    """Center ray looks along camera -Z; ray y flips with Vulkan NDC."""
    c2w = np.eye(4)
    cam = g3.Camera.from_fovy(64, 64, 90.0, c2w)
    o, d = cam.rays()
    assert o.shape == (64, 64, 3) and d.shape == (64, 64, 3)
    np.testing.assert_allclose(o, 0.0, atol=1e-7)
    center = d[31:33, 31:33].mean(axis=(0, 1))
    np.testing.assert_allclose(center / np.linalg.norm(center), [0, 0, -1],
                               atol=0.02)
    # Vulkan NDC y is down; proj flips it, so image row 0 (top) -> +y in world
    assert d[0, 32, 1] > 0.1
    assert d[63, 32, 1] < -0.1
    # image col 0 (left) -> -x? d.x = -1 at left, P0 inverse positive -> -x
    assert d[32, 0, 0] < -0.1
    assert d[32, 63, 0] > 0.1
    # 90 deg fovy: corner slopes ~1
    assert abs(d[0, 32, 1] / d[0, 32, 2]) == pytest.approx(
        math.tan(math.radians(45.0)) * (1 - 1 / 64), rel=0.05)


def test_nerf_camera_loader(tmp_path):
    import json
    c2w = np.eye(4)
    c2w[:3, 3] = [1, 2, 3]
    j = {"camera_angle_x": 0.6911112070083618,
         "frames": [{"file_path": "./val/r_0",
                     "transform_matrix": c2w.tolist()}]}
    path = tmp_path / "transforms_val.json"
    path.write_text(json.dumps(j))
    cams = g3.load_nerf_cameras(str(path), 800, 800)
    assert len(cams) == 1
    # square image: fovy == camera_angle_x
    fy = 0.5 * 800 / math.tan(0.5 * 0.6911112070083618)
    fovy = 2 * math.atan(800 / (2 * fy))
    np.testing.assert_allclose(cams[0].view_inverse, c2w)
    o, d = cams[0].rays()
    np.testing.assert_allclose(o[0, 0], [1, 2, 3], atol=1e-6)
    # fovy check through ray slope at vertical edge
    slope = abs(d[0, 400, 1] / d[0, 400, 2])
    assert slope == pytest.approx(math.tan(fovy / 2) * (1 - 1 / 800), rel=0.01)


def test_metrics_psnr_ssim():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    assert g3.utils.psnr(img, img) == float("inf")
    assert g3.utils.ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img.astype(np.int32)
                    + rng.integers(-10, 10, size=img.shape), 0, 255).astype(np.uint8)
    p = g3.utils.psnr(img, noisy)
    assert 25 < p < 40
    assert 0.5 < g3.utils.ssim(img, noisy) < 1.0
    try:
        from skimage.metrics import structural_similarity as sk_ssim
    except ImportError:
        return
    want = sk_ssim(img, noisy, channel_axis=-1, win_size=7)
    assert g3.utils.ssim(img, noisy) == pytest.approx(want, abs=2e-3)


def test_gaussian_model_roundtrip_and_filter(tmp_path, rng):
    splats = _random_splats(rng, n=32)
    model = g3.GaussianModel.from_splats(splats)
    act = model.activate()
    np.testing.assert_allclose(act.scales, np.exp(splats.scale), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(act.densities),
                               1 / (1 + np.exp(-splats.opacity)), rtol=1e-5)
    assert act.sh_coeffs.shape == (32, 16, 3)
    np.testing.assert_allclose(act.sh_coeffs[:, 0], splats.f_dc, rtol=1e-6)

    # filtering drops a particle with huge albedo
    splats.f_dc[3] = [10.0, 0, 0]
    model = g3.GaussianModel.from_splats(splats)
    filt = model.filtered()
    assert filt.num_gaussians <= 31

    path = str(tmp_path / "rt.ply")
    model.to_ply(path)
    back = g3.GaussianModel.from_ply(path)
    np.testing.assert_array_equal(np.asarray(back.means), np.asarray(model.means))
    np.testing.assert_array_equal(np.asarray(back.sh_rest),
                                  np.asarray(model.sh_rest))
