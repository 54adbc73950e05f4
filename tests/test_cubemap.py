"""Cubemap environment sampling: Vulkan samplerCube semantics.

Reference: the hybrid miss shader samples a KTX samplerCube
(VulkanHybrid raygen.rgen:67-74, loaded at base/VulkanRTBase.cpp:3656);
here 6 PNG faces in the Vulkan/KTX layer order stand in for KTX.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gvrt_tpu.hybrid.shade import sample_env_cube
from gvrt_tpu.io.image import load_cubemap, save_png


FACE_COLORS = np.array([
    [1.0, 0.0, 0.0],   # +X
    [0.0, 1.0, 0.0],   # -X
    [0.0, 0.0, 1.0],   # +Y
    [1.0, 1.0, 0.0],   # -Y
    [1.0, 0.0, 1.0],   # +Z
    [0.0, 1.0, 1.0],   # -Z
], np.float32)


def solid_cube(s=8):
    faces = np.zeros((6, s, s, 3), np.float32)
    faces[:] = FACE_COLORS[:, None, None, :]
    return jnp.asarray(faces)


def test_face_selection_major_axes():
    cube = solid_cube()
    dirs = jnp.asarray([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    ], jnp.float32)
    out = np.asarray(sample_env_cube(cube, dirs))
    np.testing.assert_allclose(out, FACE_COLORS, atol=1e-6)


def test_face_selection_off_axis():
    cube = solid_cube()
    # x dominates -> +X face regardless of the small y/z components
    d = jnp.asarray([[2.0, 0.3, -0.4], [-5.0, 1.0, 1.0]], jnp.float32)
    out = np.asarray(sample_env_cube(cube, d))
    np.testing.assert_allclose(out[0], FACE_COLORS[0], atol=1e-6)
    np.testing.assert_allclose(out[1], FACE_COLORS[1], atol=1e-6)


def test_gradient_face_uv_orientation():
    """+Z face with a horizontal gradient: Vulkan maps sc=+rx on +Z, so a
    direction leaning +x must read the right side of the face."""
    s = 32
    faces = np.zeros((6, s, s, 3), np.float32)
    ramp = np.linspace(0.0, 1.0, s, dtype=np.float32)
    faces[4, :, :, 0] = ramp[None, :]        # +Z face: red ramps left->right
    out = np.asarray(sample_env_cube(jnp.asarray(faces), jnp.asarray(
        [[0.9, 0.0, 1.0], [-0.9, 0.0, 1.0]], jnp.float32)))
    assert out[0, 0] > 0.9, out
    assert out[1, 0] < 0.1, out
    # tc = -ry on +Z: looking up (+y) must read the TOP rows (small v)
    faces[4] = 0.0
    faces[4, :, :, 1] = ramp[:, None]        # green ramps top->bottom
    out = np.asarray(sample_env_cube(jnp.asarray(faces), jnp.asarray(
        [[0.0, 0.9, 1.0], [0.0, -0.9, 1.0]], jnp.float32)))
    assert out[0, 1] < 0.1, out
    assert out[1, 1] > 0.9, out


def test_bilinear_continuity_across_center():
    """Sampling must vary smoothly as the direction sweeps inside a face."""
    s = 16
    rng = np.random.default_rng(0)
    faces = rng.random((6, s, s, 3)).astype(np.float32)
    cube = jnp.asarray(faces)
    ts = np.linspace(-0.5, 0.5, 201, dtype=np.float32)
    dirs = jnp.asarray(np.stack([ts, np.zeros_like(ts), np.ones_like(ts)],
                                axis=-1))
    out = np.asarray(sample_env_cube(cube, dirs))
    steps = np.abs(np.diff(out, axis=0)).max()
    assert steps < 0.5, f"discontinuous cube sampling (max step {steps})"


def test_load_cubemap_roundtrip(tmp_path):
    s = 8
    paths = []
    for i in range(6):
        img = np.zeros((s, s, 3), np.float32)
        img[:] = FACE_COLORS[i]
        p = tmp_path / f"face{i}.png"
        save_png(str(p), img)
        paths.append(str(p))
    cube = load_cubemap(paths)
    assert cube.shape == (6, s, s, 3)
    np.testing.assert_allclose(cube[:, 0, 0, :], FACE_COLORS, atol=1 / 255)


def test_hybrid_pipeline_uses_cubemap():
    """A miss-only render must return cubemap colors per pixel direction."""
    from gvrt_tpu.hybrid.mesh import MeshScene
    from gvrt_tpu.hybrid.pipeline import HybridConfig, _DeviceScene
    scene = MeshScene()
    scene.env_cube = np.asarray(solid_cube())
    dev = _DeviceScene(scene, HybridConfig())
    dirs = jnp.asarray([[0, 0, -1.0], [1.0, 0, 0]], jnp.float32)
    out = np.asarray(dev.background(dirs))
    np.testing.assert_allclose(out[0], FACE_COLORS[5], atol=1e-6)
    np.testing.assert_allclose(out[1], FACE_COLORS[0], atol=1e-6)
