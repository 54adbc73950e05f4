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


def test_gaussian_shadow_transmittance_semantics():
    """Transmittance along point->light shadow rays through the field:
    exact alpha gates, clear path -> 1, blocked path -> attenuated,
    monotone in opacity."""
    from gvrt_tpu.render.combined import gaussian_shadow_transmittance
    # one big opaque gaussian at the origin
    model = g3.GaussianModel(
        means=jnp.zeros((1, 3)),
        scales_log=jnp.full((1, 3), -1.2),
        quats=jnp.asarray([[1.0, 0, 0, 0]]),
        opacity_logit=jnp.asarray([4.0]),
        sh_dc=jnp.zeros((1, 3)),
        sh_rest=jnp.zeros((1, 15, 3)),
    )
    act = model.activate()
    light = jnp.asarray([0.0, 0.0, 3.0])
    pts = jnp.asarray([
        [0.0, 0.0, -2.0],   # behind the gaussian: segment crosses it
        [3.0, 0.0, 3.0],    # beside the light: segment misses it
        [0.0, 0.0, 1.0],    # between gaussian and light: clear path
    ])
    t = np.asarray(gaussian_shadow_transmittance(act, pts, light, CFG))
    assert t[0] < 0.1, t
    assert t[1] > 0.999 and t[2] > 0.999, t
    # lower opacity -> more transmittance
    weak = dataclasses.replace(model, opacity_logit=jnp.asarray([-1.0]))
    t2 = np.asarray(gaussian_shadow_transmittance(
        weak.activate(), pts, light, CFG))
    assert t2[0] > t[0]
    # chunked scan == single chunk (order-independent product)
    t3 = np.asarray(gaussian_shadow_transmittance(act, pts, light, CFG,
                                                  chunk=7))
    np.testing.assert_allclose(t3, t, rtol=1e-6)


def test_combined_gaussian_shadows_darken_mesh():
    """gaussian_shadows=True darkens exactly the mesh pixels whose light
    path crosses the gaussian cloud; unoccluded pixels are unchanged."""
    cam = g3.Camera.from_fovy(32, 32, 60.0, np.eye(4))
    # camera-facing wall with +z normal (winding matters: direct lighting
    # needs n.l > 0, unlike the emissive-only walls of the other tests)
    scene = MeshScene()
    white = Material(base_color=(1.0, 1.0, 1.0, 1.0), metallic=0.0,
                     roughness=1.0, emissive=(0.1, 0.1, 0.1))
    pos, idx = _quad([-5, -5, -4.0], [0, -5, -4.0], [0, 5, -4.0],
                     [-5, 5, -4.0])
    scene.add_object("wall", pos, idx, white)
    # light in front of the wall, off to the left
    scene.lights.append(Light(position=(-2.0, 0.0, -1.0), color=(1, 1, 1),
                              radius=50.0))
    # a dense gaussian blob between the light and the wall's center-left
    model = g3.GaussianModel(
        means=jnp.asarray([[-1.5, 0.0, -2.5]]),
        scales_log=jnp.full((1, 3), -1.6),
        quats=jnp.asarray([[1.0, 0, 0, 0]]),
        opacity_logit=jnp.asarray([6.0]),
        sh_dc=jnp.zeros((1, 3)),
        sh_rest=jnp.zeros((1, 15, 3)),
    )
    base = render_combined(model, scene, cam, CFG, HCFG, impl="scan")
    shad = render_combined(model, scene, cam, CFG, HCFG, impl="scan",
                           gaussian_shadows=True)
    on_wall = np.isfinite(np.asarray(base["mesh_t"]))
    assert on_wall.sum() > 50
    mb = np.asarray(base["mesh_rgb"])
    ms = np.asarray(shad["mesh_rgb"])
    diff = (mb - ms).sum(-1)
    # shadows only REMOVE light
    assert diff.min() >= -1e-6
    # some wall pixels are actually shadowed, and not all of them
    shadowed = (diff > 1e-3) & on_wall
    assert 0 < shadowed.sum() < on_wall.sum(), (shadowed.sum(),
                                                on_wall.sum())
