"""Batched ray-triangle intersection (the hybrid app's traversal layer).

Replaces the reference's Vulkan TLAS traversal + closest-hit dispatch
(VulkanHybrid.cpp AS build, closesthit.rchit `unpackTriangle`): TPUs have no
RT cores, so ray blocks are intersected against triangle chunks with
Möller-Trumbore and a masked argmin, scanning chunks with `lax.scan` to keep
VMEM bounded.  Layout: rays are rows (R, 6), triangles are packed on the lane
dimension (9, T) so every arithmetic op is a (R, T) VPU broadcast.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

#: back-face/parallel tolerance (Möller-Trumbore determinant cutoff)
EPS_DET = 1e-9
#: primary/secondary ray tmin (define.glsl RAY_TMIN is 0.1 for secondary
#: rays; primaries from the G-buffer cast use a tighter 1e-3)
RAY_TMIN = 0.1
INF = 1e30


class TrianglePack(NamedTuple):
    """Device-resident packed triangles, chunked for the scan."""
    v0: jnp.ndarray      # (C, 3, G) chunk, xyz, lane
    e1: jnp.ndarray      # (C, 3, G) v1 - v0
    e2: jnp.ndarray      # (C, 3, G) v2 - v0
    tri_id: jnp.ndarray  # (C, G) int32 global triangle id (or -1 pad)


def pack_triangles(tri_pos: np.ndarray, chunk: int = 512) -> TrianglePack:
    """(T, 3, 3) vertex triples -> lane-major chunks padded to `chunk`."""
    t = np.asarray(tri_pos, np.float32)
    n = len(t)
    c = max(1, -(-n // chunk))
    pad = c * chunk - n
    v0 = t[:, 0, :]
    e1 = t[:, 1, :] - t[:, 0, :]
    e2 = t[:, 2, :] - t[:, 0, :]

    def chunked(x):
        x = np.concatenate([x, np.zeros((pad, 3), np.float32)])
        return jnp.asarray(x.reshape(c, chunk, 3).transpose(0, 2, 1))

    ids = np.concatenate([np.arange(n, dtype=np.int32),
                          np.full((pad,), -1, np.int32)])
    return TrianglePack(chunked(v0), chunked(e1), chunked(e2),
                        jnp.asarray(ids.reshape(c, chunk)))


def _intersect_chunk(o, d, v0, e1, e2):
    """Möller-Trumbore for (R,) rays x (G,) triangles -> t, u, v, hit mask."""
    # pvec = d x e2 ; det = e1 . pvec
    p0 = d[1] * e2[2] - d[2] * e2[1]
    p1 = d[2] * e2[0] - d[0] * e2[2]
    p2 = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * p0 + e1[1] * p1 + e1[2] * p2
    inv_det = jnp.where(jnp.abs(det) > EPS_DET, 1.0 / det, 0.0)

    t0 = o[0] - v0[0]
    t1 = o[1] - v0[1]
    t2 = o[2] - v0[2]
    u = (t0 * p0 + t1 * p1 + t2 * p2) * inv_det

    # qvec = tvec x e1
    q0 = t1 * e1[2] - t2 * e1[1]
    q1 = t2 * e1[0] - t0 * e1[2]
    q2 = t0 * e1[1] - t1 * e1[0]
    v = (d[0] * q0 + d[1] * q1 + d[2] * q2) * inv_det
    t = (e2[0] * q0 + e2[1] * q1 + e2[2] * q2) * inv_det

    hit = ((jnp.abs(det) > EPS_DET) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0))
    return t, u, v, hit


def _split(rays):
    o = [rays[:, j:j + 1] for j in range(3)]
    d = [rays[:, 3 + j:4 + j] for j in range(3)]
    return o, d


@partial(jax.jit, static_argnames=())
def closest_hit(rays: jnp.ndarray, tris: TrianglePack,
                tmin: Optional[jnp.ndarray] = None,
                tmax: Optional[jnp.ndarray] = None):
    """Nearest intersection per ray.

    rays (R, 6) [o, d]; returns dict of (R,) arrays: t (INF on miss),
    tri (int32, -1 on miss), u, v barycentrics.
    """
    r = rays.shape[0]
    tmin = jnp.full((r,), RAY_TMIN) if tmin is None else tmin
    tmax = jnp.full((r,), INF) if tmax is None else tmax
    o, d = _split(rays)

    def step(carry, chunk):
        best_t, best_tri, best_u, best_v = carry
        v0, e1, e2, ids = chunk
        v0 = [v0[j:j + 1, :] for j in range(3)]
        e1 = [e1[j:j + 1, :] for j in range(3)]
        e2 = [e2[j:j + 1, :] for j in range(3)]
        t, u, v, hit = _intersect_chunk(o, d, v0, e1, e2)
        ok = hit & (ids[None, :] >= 0) & (t >= tmin[:, None]) \
            & (t <= tmax[:, None]) & (t < best_t[:, None])
        tbig = jnp.where(ok, t, INF)
        j = jnp.argmin(tbig, axis=1)
        rr = jnp.arange(r)
        better = tbig[rr, j] < best_t
        best_tri = jnp.where(better, ids[j], best_tri)
        best_u = jnp.where(better, u[rr, j], best_u)
        best_v = jnp.where(better, v[rr, j], best_v)
        best_t = jnp.where(better, tbig[rr, j], best_t)
        return (best_t, best_tri, best_u, best_v), None

    init = (jnp.full((r,), INF), jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r,)), jnp.zeros((r,)))
    (t, tri, u, v), _ = jax.lax.scan(step, init, tris)
    return {"t": t, "tri": tri, "u": u, "v": v}


@partial(jax.jit, static_argnames=())
def occluded(rays: jnp.ndarray, tris: TrianglePack, tmin: jnp.ndarray,
             tmax: jnp.ndarray) -> jnp.ndarray:
    """Any-hit test in (tmin, tmax): the shadow-ray trace
    (raygen.rgen traceRayEXT with TerminateOnFirstHit)."""
    o, d = _split(rays)

    def step(carry, chunk):
        v0, e1, e2, ids = chunk
        v0 = [v0[j:j + 1, :] for j in range(3)]
        e1 = [e1[j:j + 1, :] for j in range(3)]
        e2 = [e2[j:j + 1, :] for j in range(3)]
        t, _, _, hit = _intersect_chunk(o, d, v0, e1, e2)
        any_hit = jnp.any(hit & (ids[None, :] >= 0) & (t >= tmin[:, None])
                          & (t <= tmax[:, None]), axis=1)
        return carry | any_hit, None

    init = jnp.zeros((rays.shape[0],), bool)
    out, _ = jax.lax.scan(step, init, tris)
    return out
