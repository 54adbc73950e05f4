"""PBR shading math for the hybrid renderer.

jnp re-derivation of shaders/glsl/base/pbr.glsl (GGX distribution, Smith
geometry, Schlick Fresnel, the custom two-piece light attenuation curve) and
the env-map background of raygen.rgen:67-74 / miss.rmiss.  All functions are
batched over trailing ray dimensions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

PI = np.pi
#: shadow-ray origin offset (define.glsl SHADOW_RAY_ORIGIN_MOVEMENT_EPSILON)
SHADOW_EPS = 0.1
#: ambient term (raygen.rgen:97 `vec3(0.05) * albedo`)
AMBIENT = 0.05


@dataclasses.dataclass(frozen=True)
class LightAttenuation:
    """Two-piece attenuation curve constants (VulkanRTBase.h:243-247)."""
    alpha: float = 0.6
    beta: float = 0.8
    gamma: float = 0.2


def apply_attenuation(color, dist, radius, att: LightAttenuation):
    """pbr.glsl ApplyAttenuation: smooth falloff inside alpha*radius, then a
    quadratic tail pinned so intensity ~gamma at the radius."""
    a, b, g = att.alpha, att.beta, att.gamma
    # near branch
    m_near = dist / (a * radius)
    n_near = 1.0 - 1.0 / b
    f_near = 1.0 / (m_near * n_near * (m_near - 2.0) + 1.0)
    # far branch
    m = a * radius
    n = 1.0 / b
    intensity = jnp.max(color, axis=-1, keepdims=True)
    denom = (1.0 / jnp.maximum((radius - m) ** 2, 1e-12)
             * (intensity / g - n) * (dist[..., None] - m) ** 2 + n)
    f_far = 1.0 / denom
    near = (dist <= a * radius)[..., None]
    f = jnp.where(near, f_near[..., None], f_far)
    return jnp.clip(f, 0.001, 1.0) * color


def fresnel_schlick(cos_theta, f0):
    """pbr.glsl FresnelSchlick (explicit 5-factor product form)."""
    x = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * x ** 5


def distribution_ggx(n_dot_h, roughness):
    a2 = (roughness * roughness) ** 2
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(n_dot_x, roughness):
    r = roughness + 1.0
    k = r * r / 8.0
    return n_dot_x / (n_dot_x * (1.0 - k) + k)


def geometry_smith(n_dot_v, n_dot_l, roughness):
    return (geometry_schlick_ggx(n_dot_v, roughness)
            * geometry_schlick_ggx(n_dot_l, roughness))


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def direct_lighting(pos, normal, view, albedo, metallic, roughness, f0,
                    light_pos, light_color, light_radius, lit_mask,
                    att: LightAttenuation):
    """One light's GGX contribution per pixel (raygen.rgen:121-141).

    All inputs (..., 3) or (...,); `lit_mask` folds in shadowing and the
    radius cull.  Returns (..., 3) radiance to add.
    """
    l_vec = light_pos - pos
    dist = jnp.linalg.norm(l_vec, axis=-1)
    radiance = apply_attenuation(light_color, dist, light_radius, att)
    l = l_vec / jnp.maximum(dist, 1e-12)[..., None]
    h = view + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

    n_dot_l = jnp.maximum(_dot(normal, l), 0.0)
    n_dot_v = jnp.maximum(_dot(normal, view), 0.0)
    # NOTE: the reference feeds dot(H, V) into FresnelSchlick (raygen.rgen:129)
    h_dot_v = jnp.maximum(_dot(h, view), 0.0)

    f = fresnel_schlick(h_dot_v[..., None], f0)
    spec = (distribution_ggx(_dot(normal, h), roughness)
            * geometry_smith(n_dot_v, n_dot_l, roughness))[..., None] * f
    spec = spec / (4.0 * n_dot_v * n_dot_l + 1e-4)[..., None]

    kd = (1.0 - f) * (1.0 - metallic[..., None])
    out = (kd * albedo / PI + spec) * radiance * n_dot_l[..., None]
    return jnp.where(lit_mask[..., None], out, 0.0)


def base_f0(ior, albedo, metallic):
    """F0 = mix(((ior-1)/(ior+1))^2, albedo, metallic) (raygen.rgen:93-94)."""
    f0s = ((ior - 1.0) / (ior + 1.0)) ** 2
    return (f0s[..., None] * (1.0 - metallic[..., None])
            + albedo * metallic[..., None])


def reflect(v, n):
    return v - 2.0 * _dot(v, n)[..., None] * n


def refract(v, n, eta):
    """GLSL refract(); returns 0 on total internal reflection."""
    cos_i = -_dot(v, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    out = (eta[..., None] * v
           + (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n)
    return jnp.where((k > 0.0)[..., None], out, 0.0)


def sample_env_equirect(env: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular env lookup (the TPU stand-in for samplerCube;
    the reference loads KTX cubemaps, VulkanRTBase.cpp:3656)."""
    h, w = env.shape[:2]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-12)
    u = (jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * PI) + 0.5) * (w - 1)
    v = (jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / PI) * (h - 1)
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    return env[vi, ui]


def sample_env_cube(faces: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Cubemap env lookup with Vulkan `samplerCube` semantics.

    `faces` is (6, S, S, C) in the Vulkan/KTX layer order
    [+X, -X, +Y, -Y, +Z, -Z]; face selection and the per-face (sc, tc)
    coordinates follow the Vulkan spec's cube-map face table, so six PNG
    faces here look exactly like the reference's KTX cubemap in its miss
    shader (base/VulkanRTBase.cpp:3656, VulkanHybrid raygen.rgen:67-74).
    Bilinear filtering, clamp-to-edge within the face.
    """
    s = faces.shape[1]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-12)
    rx, ry, rz = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(rx), jnp.abs(ry), jnp.abs(rz)

    x_major = (ax >= ay) & (ax >= az)
    y_major = (ay > ax) & (ay >= az)
    face = jnp.where(
        x_major, jnp.where(rx >= 0, 0, 1),
        jnp.where(y_major, jnp.where(ry >= 0, 2, 3),
                  jnp.where(rz >= 0, 4, 5))).astype(jnp.int32)

    ma = jnp.where(x_major, ax, jnp.where(y_major, ay, az))
    # Vulkan cube face table: (sc, tc) per face
    sc = jnp.where(x_major, jnp.where(rx >= 0, -rz, rz),
                   jnp.where(y_major, rx, jnp.where(rz >= 0, rx, -rx)))
    tc = jnp.where(y_major, jnp.where(ry >= 0, rz, -rz), -ry)

    inv = 0.5 / jnp.maximum(ma, 1e-12)
    u = (sc * inv + 0.5) * s - 0.5
    v = (tc * inv + 0.5) * s - 0.5
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, s - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, s - 1)
    u1 = jnp.minimum(u0 + 1, s - 1)
    v1 = jnp.minimum(v0 + 1, s - 1)
    fu = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    fv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    return ((faces[face, v0, u0] * (1 - fu) + faces[face, v0, u1] * fu)
            * (1 - fv)
            + (faces[face, v1, u0] * (1 - fu) + faces[face, v1, u1] * fu)
            * fv)


def procedural_sky(dirs: jnp.ndarray) -> jnp.ndarray:
    """Fallback background when a scene ships no env map."""
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-12)
    t = jnp.clip(0.5 * (d[..., 1] + 1.0), 0.0, 1.0)[..., None]
    return (1.0 - t) * jnp.asarray([1.0, 1.0, 1.0]) \
        + t * jnp.asarray([0.5, 0.7, 0.9])


def sample_texture_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear REPEAT-wrap texture fetch; tex (H, W, C), uv (..., 2)."""
    h, w = tex.shape[:2]
    u = (uv[..., 0] % 1.0) * (w - 1)
    v = (uv[..., 1] % 1.0) * (h - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    return ((tex[v0, u0] * (1 - fu) + tex[v0, u1] * fu) * (1 - fv)
            + (tex[v1, u0] * (1 - fu) + tex[v1, u1] * fu) * fv)
