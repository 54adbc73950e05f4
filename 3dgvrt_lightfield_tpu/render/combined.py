"""Combined scene: Gaussian ray march + opaque glTF/mesh geometry, one render.

Parity target: the reference's `LOAD_GLTF` FullRT variant loads a glTF mesh
next to the Gaussian model and builds a second TLAS with shadow hit groups
(VulkanFullRT.cpp:922-927, 1427-1441; base/Define.h:42).  In the reference
that path ships disabled and half-finished (the shadow closest-hit shader,
shaders/glsl/VulkanFullRT/shadow.rchit, is entirely commented out); here the
capability is implemented to completion with TPU-native passes:

  1. mesh pass: per-pixel closest triangle hit (hybrid.trace) + GGX local
     shading with mesh-vs-mesh shadow rays (hybrid.pipeline machinery),
  2. gaussian pass: the standard tiled march with each ray's `tmax` clamped
     to its mesh hit distance (binning.tile_rays tmax_clip) — surfaces
     terminate the march exactly like the reference's payload tmax,
  3. composite: out = gaussian_radiance + T_at_surface * mesh_color —
     front-to-back alpha compositing with the mesh as the opaque tail
     (raygen.rgen:140-184's termination semantics).

Parity-plus (round 5): gaussians CAST SHADOWS onto the mesh.  The
reference shipped this commented out (shaders/glsl/VulkanFullRT/
shadow.rchit is entirely dead code); here `gaussian_shadows=True` casts a
transmittance-attenuated shadow ray from every mesh hit point to every
light through the gaussian field — exact processHit response math
(gaussianfunctions.glsl:153-206) scanned over gaussian chunks for bounded
memory — and multiplies each light's GGX contribution by the resulting
transmittance (soft, density-proportional shadows, not binary occlusion).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..hybrid.mesh import MeshScene
from ..hybrid.pipeline import (HybridConfig, _DeviceScene, _shade_local,
                               _surface_attributes)
from ..hybrid.trace import closest_hit
from ..models.gaussians import GaussianModel
from ..ops.kernels import particle_response
from .binning import bin_gaussians, plan_capacity, tile_rays, untile
from .pallas_forward import forward_dispatch
from .tile_math import ACC_DEPTH, ACC_HITS, ACC_T
from .tiled import _camera_mats, _resolve_impl


#: acceptance epsilon for shadow-segment endpoints (self/light bias)
_SHADOW_EPS_T = 1e-3


def gaussian_shadow_transmittance(act, points: jnp.ndarray,
                                  light_pos: jnp.ndarray,
                                  cfg: RenderConfig,
                                  chunk: int = 512) -> jnp.ndarray:
    """Gaussian-field transmittance along P shadow rays point -> light.

    Exact per-hit math of the renderer (prefolded frame M = diag(1/s) R^T,
    b = M mean; grayDist = |cross(grd, gro)|^2 / |grd|^2; the same
    degree-table response and alpha gates as processHit,
    gaussianfunctions.glsl:153-206) with one difference: no depth sorting —
    transmittance is an order-independent product prod(1 - alpha_g) over
    gaussians whose closest-approach t lies strictly inside the segment.
    `lax.scan` over gaussian chunks keeps memory at O(chunk x P).
    """
    pts = points.reshape(-1, 3)
    to_l = jnp.asarray(light_pos, jnp.float32)[None, :] - pts
    dist = jnp.linalg.norm(to_l, axis=-1)                    # (P,)
    d = to_l / jnp.maximum(dist, 1e-12)[:, None]             # (P, 3)

    n = act.means.shape[0]
    pad = (-n) % chunk
    pad0 = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
    inv_s = pad0(act.inv_scales)
    rot9 = pad0(act.rot9)
    means = pad0(act.means)
    dens = pad0(act.densities)                               # pad density 0
    # M rows m[3i+k] = inv_s[:, i] * R[k, i]; b = M @ mean (param_rows math)
    m = [inv_s[:, i] * rot9[:, 3 * k + i]
         for i in range(3) for k in range(3)]                # 9 x (N,)
    b = [inv_s[:, i] * (rot9[:, i] * means[:, 0]
                        + rot9[:, 3 + i] * means[:, 1]
                        + rot9[:, 6 + i] * means[:, 2]) for i in range(3)]
    tab = jnp.stack(m + b + [dens], axis=1).reshape(-1, chunk, 13)

    ox, oy, oz = pts[:, 0], pts[:, 1], pts[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def body(log_t, blk):                                    # blk (chunk, 13)
        gro = [blk[:, 3 * i, None] * ox + blk[:, 3 * i + 1, None] * oy
               + blk[:, 3 * i + 2, None] * oz - blk[:, 9 + i, None]
               for i in range(3)]                            # 3 x (G, P)
        grd = [blk[:, 3 * i, None] * dx + blk[:, 3 * i + 1, None] * dy
               + blk[:, 3 * i + 2, None] * dz for i in range(3)]
        n2 = grd[0] ** 2 + grd[1] ** 2 + grd[2] ** 2
        cx = gro[1] * grd[2] - gro[2] * grd[1]
        cy = gro[2] * grd[0] - gro[0] * grd[2]
        cz = gro[0] * grd[1] - gro[1] * grd[0]
        inv_n2 = 1.0 / jnp.maximum(n2, 1e-20)
        gray = (cx * cx + cy * cy + cz * cz) * inv_n2
        t = -(gro[0] * grd[0] + gro[1] * grd[1] + gro[2] * grd[2]) * inv_n2
        resp = particle_response(gray, cfg.kernel_degree)
        alpha = jnp.minimum(cfg.max_alpha, resp * blk[:, 12, None])
        accept = ((resp > cfg.hit_min_response)
                  & (alpha > cfg.alpha_min)
                  & (t > _SHADOW_EPS_T)
                  & (t < dist[None, :] - _SHADOW_EPS_T))
        log_t = log_t + jnp.sum(
            jnp.log1p(-jnp.where(accept, alpha, 0.0)), axis=0)
        return log_t, None

    log_t, _ = jax.lax.scan(body, jnp.zeros((pts.shape[0],)), tab)
    return jnp.exp(log_t)


def _mesh_pass(dev: _DeviceScene, hcfg: HybridConfig, camera,
               shadow_act=None, cfg: Optional[RenderConfig] = None):
    """Closest-hit + local shading for every pixel; inf t where missed.

    `shadow_act` (ActivatedGaussians, optional) turns on gaussian->mesh
    shadows: each light's contribution is scaled by the gaussian field's
    transmittance along the shadow ray from the hit point."""
    o, d = camera.rays()
    h, w = o.shape[:2]
    rays = jnp.concatenate([jnp.asarray(o).reshape(-1, 3),
                            jnp.asarray(d).reshape(-1, 3)], axis=1)
    hit = closest_hit(rays, dev.tris,
                      tmin=jnp.full((rays.shape[0],), 1e-3))
    missed = hit["tri"] < 0
    surf = _surface_attributes(dev, hit, rays)
    cam_pos = jnp.asarray(np.asarray(camera.view_inverse)[:3, 3], jnp.float32)
    view = cam_pos - surf["pos"]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True),
                              1e-12)
    light_atten = None
    if shadow_act is not None:
        atten = [gaussian_shadow_transmittance(
            shadow_act, surf["pos"], dev.lights[li, 0:3], cfg)
            for li in range(dev.lights.shape[0])]
        light_atten = jnp.stack(atten, axis=1)               # (P, L)
    color = _shade_local(dev, hcfg, surf, view, light_atten=light_atten)
    color = jnp.where(missed[:, None], 0.0, color)
    t_mesh = jnp.where(missed, jnp.inf, hit["t"])
    return color.reshape(h, w, 3), t_mesh.reshape(h, w)


def render_combined(model: GaussianModel, scene: MeshScene, camera,
                    cfg: RenderConfig = DEFAULT_CONFIG,
                    hcfg: HybridConfig = HybridConfig(),
                    impl: str = "auto",
                    capacity: Optional[tuple] = None,
                    gaussian_shadows: bool = False):
    """Render Gaussians and an opaque mesh scene in one frame.

    Returns the tiled-renderer output dict plus `mesh_t` (per-pixel surface
    distance, inf where no mesh).  Differentiable w.r.t. the Gaussian model
    (the mesh pass carries no gradient into the march's clip distances'
    values — tmax only gates accept tests).  `gaussian_shadows=True` makes
    the gaussian field attenuate the mesh's direct lighting (see module
    doc; the mesh pass stays gradient-free either way).
    """
    impl = _resolve_impl(impl)
    width, height = camera.width, camera.height
    dev = _DeviceScene(scene, hcfg)
    act = model.activate()
    shadow_act = jax.lax.stop_gradient(act) if gaussian_shadows else None
    mesh_rgb, t_mesh = _mesh_pass(dev, hcfg, camera, shadow_act=shadow_act,
                                  cfg=cfg)
    t_mesh = jax.lax.stop_gradient(t_mesh)
    w2c, proj = _camera_mats(camera)
    if capacity is None:
        capacity = plan_capacity(act, w2c, proj, width, height, cfg)
    rays = tile_rays(camera, cfg, tmax_clip=t_mesh)
    binned = bin_gaussians(act, w2c, proj, width, height, cfg, *capacity)
    acc = forward_dispatch(binned, rays, cfg, impl)
    img = untile(acc, width, height, cfg.tile_size)

    transmittance = img[..., ACC_T]
    rgb = img[..., 0:3] + transmittance[..., None] * mesh_rgb
    # depth composites the mesh as the opaque tail (alpha=1 surface at
    # mesh_t contributes T_at_surface * mesh_t, exactly like the radiance
    # composite above); pixels with neither gaussians nor mesh stay 0
    depth = img[..., ACC_DEPTH] + transmittance * jnp.where(
        jnp.isfinite(t_mesh), t_mesh, 0.0)
    return {
        "rgb": rgb,
        "gaussian_rgb": img[..., 0:3],
        "mesh_rgb": mesh_rgb,
        "mesh_t": t_mesh,
        "depth": depth,
        "transmittance": transmittance,
        "hit_count": img[..., ACC_HITS],
        "overflow": binned.overflow,
    }
