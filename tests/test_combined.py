"""Combined gaussian+mesh render (render/combined.py): LOAD_GLTF parity.

Reference: VulkanFullRT LOAD_GLTF variant (VulkanFullRT.cpp:922-927,
1427-1441) — here completed: opaque surfaces terminate the gaussian march
and composite as the opaque tail.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import gvrt_tpu as g3
from gvrt_tpu.hybrid.mesh import Material, Light, MeshScene, _quad
from gvrt_tpu.hybrid.pipeline import HybridConfig
from gvrt_tpu.render.combined import render_combined
from gvrt_tpu.render.tiled import render_image_tiled

CFG = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=32)
HCFG = HybridConfig(reflection=False, refraction=False, shadow_rays=False)


def _wall_scene(z=-2.0):
    """A camera-facing white wall covering the LEFT half of the image."""
    s = MeshScene()
    white = Material(base_color=(1.0, 1.0, 1.0, 1.0), metallic=0.0,
                     roughness=1.0, emissive=(0.5, 0.5, 0.5))
    pos, idx = _quad([-5, -5, z], [-5, 5, z], [0, 5, z], [0, -5, z])
    s.add_object("wall", pos, idx, white)
    s.lights.append(Light(position=(0.0, 0.0, 0.0), color=(1, 1, 1),
                          radius=50.0))
    return s


def _gaussians(z=-3.0, n=60):
    model = g3.random_gaussians(jax.random.key(2), n, extent=0.8,
                                scale_range=(-3.5, -2.5))
    model.means = model.means.at[:, 2].add(z)
    return model


def test_mesh_occludes_gaussians_behind():
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    model = _gaussians(z=-3.0)          # gaussians BEHIND the wall (z=-2)
    out = render_combined(model, _wall_scene(z=-2.0), cam, CFG, HCFG,
                          impl="scan")
    hits = np.asarray(out["hit_count"])
    t = np.asarray(out["mesh_t"])
    # left half: wall present -> no gaussian hits (march clipped), mesh color
    left = t[:, :14] < np.inf
    assert left.mean() > 0.9
    assert hits[:, :14][left].max() == 0
    rgb = np.asarray(out["rgb"])
    assert rgb[:, :14][left].min() > 0.2      # shaded wall, not black
    # right half: no wall -> gaussians render normally
    gauss_only = render_image_tiled(model, cam, CFG, impl="scan")
    np.testing.assert_allclose(rgb[:, 20:], np.asarray(gauss_only["rgb"])
                               [:, 20:], atol=1e-5)


def test_gaussians_in_front_composite_over_mesh():
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    model = _gaussians(z=-1.0, n=200)   # gaussians IN FRONT of the wall
    out = render_combined(model, _wall_scene(z=-2.0), cam, CFG, HCFG,
                          impl="scan")
    hits = np.asarray(out["hit_count"])
    assert hits[:, :14].max() > 0       # march still runs in front of wall
    # compositing identity: rgb == gaussian_rgb + T * mesh_rgb
    lhs = np.asarray(out["rgb"])
    rhs = (np.asarray(out["gaussian_rgb"])
           + np.asarray(out["transmittance"])[..., None]
           * np.asarray(out["mesh_rgb"]))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_combined_differentiable():
    cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
    model = _gaussians(z=-1.0, n=50)
    scene = _wall_scene(z=-2.0)
    from gvrt_tpu.render.binning import plan_capacity
    from gvrt_tpu.render.tiled import _camera_mats
    w2c, proj = _camera_mats(cam)
    cap = plan_capacity(model.activate(), w2c, proj, 16, 16, CFG)

    def loss(m):
        out = render_combined(m, scene, cam, CFG, HCFG, impl="scan",
                              capacity=cap)
        return jnp.mean(out["rgb"])

    g = jax.grad(loss)(model)
    n = float(jnp.linalg.norm(g.means))
    assert np.isfinite(n) and n > 0
