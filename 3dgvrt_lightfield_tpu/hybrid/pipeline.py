"""The hybrid frame pipeline: G-buffer -> lit image with RT shadows/bounces.

Rebuild of VulkanHybrid's two-pass frame (VulkanHybrid.cpp:1440-1470):
pass 0 rasterizes a G-buffer (here: primary-ray cast, same contents), pass 1
shades it with ray-traced shadows and an iterative reflection/refraction loop
(shaders/glsl/VulkanHybrid/raygen.rgen).  Everything is one jitted function
of flattened pixel rays; the bounce loop is a `lax.scan` with active masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import MeshScene
from .shade import (AMBIENT, SHADOW_EPS, LightAttenuation, base_f0,
                    direct_lighting, procedural_sky, reflect, refract,
                    sample_env_cube, sample_env_equirect,
                    sample_texture_bilinear)
from .trace import INF, TrianglePack, closest_hit, occluded, pack_triangles


@dataclasses.dataclass(frozen=True)
class HybridConfig:
    """RayOption push constants + ITERATIONS (define.glsl:18-29)."""
    shadow_rays: bool = True
    reflection: bool = True
    refraction: bool = True
    iterations: int = 6          # bounce loop runs iterations - 1
    attenuation: LightAttenuation = LightAttenuation()
    gamma_correct: bool = True
    tri_chunk: int = 512
    ray_block: int = 16384       # pixels shaded per lax.map block

    def replace(self, **kw) -> "HybridConfig":
        return dataclasses.replace(self, **kw)


class _DeviceScene:
    """Device-side packed arrays for one animated scene snapshot."""

    def __init__(self, scene: MeshScene, cfg: HybridConfig):
        self.tris = pack_triangles(scene.tri_pos, cfg.tri_chunk)
        self.tri_normal = jnp.asarray(scene.tri_normal)    # (T, 3, 3)
        self.tri_tangent = jnp.asarray(scene.tri_tangent)  # (T, 3, 4)
        self.tri_uv = jnp.asarray(scene.tri_uv)            # (T, 3, 2)
        self.tri_material = jnp.asarray(scene.tri_material)
        self.materials = jnp.asarray(scene.material_table())
        self.lights = jnp.asarray(scene.light_table())
        self.textures = [jnp.asarray(t) for t in scene.textures]
        self.env = (jnp.asarray(scene.env_map)
                    if scene.env_map is not None else None)
        self.env_cube = (jnp.asarray(scene.env_cube)
                         if getattr(scene, "env_cube", None) is not None
                         else None)

    def background(self, dirs):
        # cubemap first: the reference's miss path samples a KTX samplerCube
        # (VulkanHybrid raygen.rgen:67-74); equirect and procedural sky are
        # the fallbacks for scenes without one
        if self.env_cube is not None:
            return sample_env_cube(self.env_cube, dirs)
        if self.env is not None:
            return sample_env_equirect(self.env, dirs)
        return procedural_sky(dirs)


def _surface_attributes(dev: _DeviceScene, hit, rays):
    """Interpolate hit-point attributes (closesthit.rchit unpackTriangle)."""
    tri = jnp.maximum(hit["tri"], 0)
    w_u = hit["u"][:, None]
    w_v = hit["v"][:, None]
    w0 = 1.0 - w_u - w_v

    tn = dev.tri_normal[tri]                     # (R, 3, 3)
    n = w0 * tn[:, 0] + w_u * tn[:, 1] + w_v * tn[:, 2]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    uv = (w0 * dev.tri_uv[tri, 0] + w_u * dev.tri_uv[tri, 1]
          + w_v * dev.tri_uv[tri, 2])

    mat_id = dev.tri_material[tri]
    m = dev.materials[mat_id]                    # (R, 16)
    albedo = m[:, 0:3]
    metallic = m[:, 3]
    roughness = m[:, 4]
    emissive = m[:, 5:8]
    ior = m[:, 8]
    reflectance = m[:, 9]
    refractance = m[:, 10]

    # tangent frame for normal mapping (mrt.frag applies the normal map in
    # the reference's G-buffer pass; glTF tangent w carries handedness)
    tt = dev.tri_tangent[tri]                    # (R, 3, 4)
    tang = w0 * tt[:, 0, :3] + w_u * tt[:, 1, :3] + w_v * tt[:, 2, :3]
    t_norm = jnp.linalg.norm(tang, axis=-1, keepdims=True)
    has_tangent = t_norm[:, 0] > 1e-6
    tang = tang / jnp.maximum(t_norm, 1e-12)
    # Gram-Schmidt against the interpolated normal, bitangent via w sign
    tang = tang - jnp.sum(tang * n, axis=-1, keepdims=True) * n
    tang = tang / jnp.maximum(
        jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-12)
    bitan = jnp.cross(n, tang) * tt[:, 0, 3:4]

    # texture fetches: static unroll over the scene's texture table
    for k, tex in enumerate(dev.textures):
        texel = sample_texture_bilinear(tex, uv)
        albedo = jnp.where((m[:, 11:12] == k),
                           texel[:, :3] ** 2.2, albedo)   # sRGB -> linear
        mr = jnp.where((m[:, 12:13] == k), texel[:, :3], 0.0)
        metallic = jnp.where(m[:, 12] == k, mr[:, 2] * metallic, metallic)
        roughness = jnp.where(m[:, 12] == k, mr[:, 1] * roughness, roughness)
        emissive = jnp.where((m[:, 13:14] == k), texel[:, :3], emissive)
        tn = texel[:, :3] * 2.0 - 1.0            # tangent-space normal map
        n_mapped = (tn[:, 0:1] * tang + tn[:, 1:2] * bitan + tn[:, 2:3] * n)
        n_mapped = n_mapped / jnp.maximum(
            jnp.linalg.norm(n_mapped, axis=-1, keepdims=True), 1e-12)
        use = (m[:, 14] == k) & has_tangent
        n = jnp.where(use[:, None], n_mapped, n)

    pos = rays[:, 0:3] + hit["t"][:, None] * rays[:, 3:6]
    return {
        "pos": pos, "normal": n, "albedo": albedo, "metallic": metallic,
        "roughness": roughness, "emissive": emissive, "ior": ior,
        "reflectance": reflectance, "refractance": refractance,
        "object": mat_id,
    }


def _shade_local(dev: _DeviceScene, cfg: HybridConfig, surf, view,
                 light_atten=None):
    """Ambient + emissive + per-light GGX with shadow rays
    (raygen.rgen:97-145 == closesthit.rchit:100-145).

    `light_atten` (P, num_lights), optional: continuous per-pixel
    attenuation multiplying each light's contribution — the combined
    renderer passes the gaussian field's transmittance along the shadow
    ray here (render/combined.py gaussian shadows)."""
    albedo = surf["albedo"]
    bounce_surface = (((cfg.reflection) & (surf["reflectance"] > 0.0))
                      | ((cfg.refraction) & (surf["refractance"] > 0.0)))
    albedo = jnp.where(bounce_surface[:, None], 0.0, albedo)

    f0 = base_f0(surf["ior"], albedo, surf["metallic"])
    color = AMBIENT * albedo + surf["emissive"]

    pos = surf["pos"]
    for li in range(dev.lights.shape[0]):
        lrow = dev.lights[li]
        lpos = lrow[0:3]
        lradius = lrow[3]
        lcolor = lrow[4:7]
        to_l = lpos - pos
        dist = jnp.linalg.norm(to_l, axis=-1)
        in_range = dist <= lradius          # radius cull (raygen.rgen:113)
        lit = in_range
        if cfg.shadow_rays:
            sdir = to_l / jnp.maximum(dist, 1e-12)[:, None]
            tmax = jnp.where(dist >= 0.5, dist - 0.5, dist)
            origin = pos + sdir * SHADOW_EPS
            srays = jnp.concatenate([origin, sdir], axis=1)
            shadowed = occluded(srays, dev.tris,
                                jnp.full_like(dist, 0.1), tmax)
            lit = lit & ~shadowed
        contrib = direct_lighting(
            pos, surf["normal"], view, albedo, surf["metallic"],
            surf["roughness"], f0, lpos, lcolor, lradius, lit,
            cfg.attenuation)
        if light_atten is not None:
            contrib = contrib * light_atten[:, li][:, None]
        color = color + contrib
    return color


def _render_rays(dev: _DeviceScene, cfg: HybridConfig, rays, cam_pos):
    r = rays.shape[0]
    hit = closest_hit(rays, dev.tris, tmin=jnp.full((r,), 1e-3))
    miss = hit["tri"] < 0
    surf = _surface_attributes(dev, hit, rays)

    view = cam_pos - surf["pos"]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True),
                              1e-12)
    color = _shade_local(dev, cfg, surf, view)

    # reflection / refraction loop (raygen.rgen:147-190)
    if cfg.reflection or cfg.refraction:
        state = {
            "pos": surf["pos"],
            "n": surf["normal"],
            "v": -view,
            "product": jnp.ones((r,)),
            "ior_prev": jnp.ones((r,)),
            "ior": surf["ior"],
            "reflectance": jnp.where(cfg.reflection, surf["reflectance"], 0.0),
            "refractance": jnp.where(cfg.refraction, surf["refractance"], 0.0),
            "active": ~miss,
            "color": color,
        }
        for _ in range(cfg.iterations - 1):
            state = _bounce(dev, cfg, state)
        color = state["color"]

    bg = dev.background(rays[:, 3:6])
    color = jnp.where(miss[:, None], bg, color)
    if cfg.gamma_correct:
        color = jnp.where(miss[:, None], color,
                          jnp.maximum(color, 0.0) ** (1.0 / 2.2))
    return color, hit, surf


def _bounce(dev: _DeviceScene, cfg: HybridConfig, s):
    """One reflection/refraction iteration with per-pixel masks."""
    refr = s["active"] & (s["refractance"] > 0.0)
    refl = s["active"] & ~refr & (s["reflectance"] > 0.0)
    go = refr | refl

    # refraction: flip normal when exiting, swap IORs (raygen.rgen:156-166)
    inside = jnp.sum(s["v"] * s["n"], axis=-1) > 0.0
    n_eff = jnp.where((refr & inside)[:, None], -s["n"], s["n"])
    ior_from = jnp.where(refr & inside, s["ior"], s["ior_prev"])
    ior_to = jnp.where(refr & inside, 1.0, s["ior"])
    v_refr = refract(s["v"], n_eff, ior_from / jnp.maximum(ior_to, 1e-6))
    v_refl = reflect(s["v"], s["n"])

    v_new = jnp.where(refr[:, None], v_refr, v_refl)
    v_new = v_new / jnp.maximum(
        jnp.linalg.norm(v_new, axis=-1, keepdims=True), 1e-12)
    pos_new = jnp.where(refr[:, None], s["pos"] - n_eff * 0.01,
                        s["pos"] + s["n"] * 0.01)
    product = s["product"] * jnp.where(
        refr, s["refractance"], jnp.where(refl, s["reflectance"], 1.0))

    rays = jnp.concatenate([pos_new, v_new], axis=1)
    hit = closest_hit(rays, dev.tris,
                      tmin=jnp.full((rays.shape[0],), 1e-3))
    miss = hit["tri"] < 0
    surf = _surface_attributes(dev, hit, rays)
    hit_color = _shade_local(dev, cfg, surf, -v_new)
    env_color = dev.background(v_new)
    add = jnp.where(miss[:, None], env_color, hit_color)
    color = s["color"] + jnp.where(go[:, None], product[:, None] * add, 0.0)

    return {
        "pos": jnp.where(go[:, None], surf["pos"], s["pos"]),
        "n": jnp.where(go[:, None], surf["normal"], s["n"]),
        "v": jnp.where(go[:, None], v_new, s["v"]),
        "product": product,
        "ior_prev": jnp.where(refr, ior_from, s["ior_prev"]),
        "ior": jnp.where(go, surf["ior"], s["ior"]),
        "reflectance": jnp.where(go, surf["reflectance"], 0.0),
        "refractance": jnp.where(go, surf["refractance"], 0.0),
        "active": go & ~miss,
        "color": color,
    }


class HybridRenderer:
    """Prepared hybrid pipeline for one scene (animatable per frame)."""

    def __init__(self, width: int, height: int,
                 cfg: Optional[HybridConfig] = None):
        self.width = width
        self.height = height
        self.cfg = cfg or HybridConfig()

    def render(self, scene: MeshScene, camera, time: float = 0.0):
        """Render one frame; returns dict with rgb (H, W, 3), depth, object."""
        scene_t = scene.animated(time)
        dev = _DeviceScene(scene_t, self.cfg)
        o, d = camera.rays()
        rays = jnp.concatenate(
            [jnp.asarray(o), jnp.asarray(d)], axis=-1).reshape(-1, 6)
        cam_pos = jnp.asarray(
            np.asarray(camera.view_inverse[:3, 3], np.float32))
        color, hit, surf = _render_rays(dev, self.cfg, rays, cam_pos)
        h, w = self.height, self.width
        return {
            "rgb": jnp.clip(color, 0.0, 1.0).reshape(h, w, 3),
            "depth": jnp.where(hit["tri"] < 0, 0.0, hit["t"]).reshape(h, w),
            "object": jnp.where(hit["tri"] < 0, -1,
                                surf["object"]).reshape(h, w),
            # G-buffer planes (mrt.frag outputs) for parity/debugging
            "position": surf["pos"].reshape(h, w, 3),
            "normal": surf["normal"].reshape(h, w, 3),
            "albedo": surf["albedo"].reshape(h, w, 3),
        }


def render_hybrid(scene: MeshScene, camera, width: int, height: int,
                  cfg: Optional[HybridConfig] = None, time: float = 0.0):
    """One-shot convenience wrapper."""
    return HybridRenderer(width, height, cfg).render(scene, camera, time)
