"""Bisect the v1->v2 fwd-kernel regression: divide vs rsqrt, hoisted origin.

Monkeypatches tile_math.chunk_core with variants and times the fused forward
(chained K frames).  Variants:
  v2        : current code (divide for inv_n2)
  v2-rsqrt  : inv_n2 = rsqrt(nrm2)^2 (hardware rsqrt instead of divide)
  v2-perray : gro computed per-(G,R) like v1 (un-hoisted origin)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning, tile_math
from gvrt_tpu.render.tile_math import CH_M, CH_B, CH_DENSITY, CH_SH, RAY_BASIS
from gvrt_tpu.render.pallas_forward import forward_tiles
from gvrt_tpu.render.tiled import _camera_mats
from gvrt_tpu.ops.kernels import particle_response

N = 300_000
W, H = 1920, 1088
K = 8
cfg = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, W, H, cfg)
rays = jax.device_put(binning.tile_rays(cam, cfg))
binned = jax.jit(lambda a: binning.bin_gaussians(
    a, w2c, proj, W, H, cfg, cap, cap_pad))(act)
binned = jax.tree.map(lambda x: jax.device_put(np.asarray(x)), binned)

orig_core = tile_math.chunk_core


def make_core(inv_mode, hoist, materialize=False):
    def core(rays, chunk, t_in, cfg):
        f32 = t_in.dtype
        if hoist:
            o = [rays[j:j + 1, 0:1] for j in range(3)]
        else:
            o = [rays[j:j + 1, :] for j in range(3)]
        d = [rays[3 + j:4 + j, :] for j in range(3)]
        tmin = rays[6:7, :]
        tmax = rays[7:8, :]
        m = [chunk[:, CH_M + j:CH_M + j + 1] for j in range(9)]
        b = [chunk[:, CH_B + j:CH_B + j + 1] for j in range(3)]
        density = chunk[:, CH_DENSITY:CH_DENSITY + 1]
        gro, grdu = [], []
        for i in range(3):
            gro.append(m[3 * i] * o[0] + m[3 * i + 1] * o[1]
                       + m[3 * i + 2] * o[2] - b[i])
            grdu.append(m[3 * i] * d[0] + m[3 * i + 1] * d[1]
                        + m[3 * i + 2] * d[2])
        if materialize:
            one_r = jnp.ones_like(d[0])
            gro = [g * one_r for g in gro]
        nrm2 = grdu[0] * grdu[0] + grdu[1] * grdu[1] + grdu[2] * grdu[2]
        if inv_mode == "div":
            inv_n2 = 1.0 / jnp.maximum(nrm2, 1e-20)
        else:
            r = jax.lax.rsqrt(jnp.maximum(nrm2, 1e-20))
            inv_n2 = r * r
        c0 = grdu[1] * gro[2] - grdu[2] * gro[1]
        c1 = grdu[2] * gro[0] - grdu[0] * gro[2]
        c2 = grdu[0] * gro[1] - grdu[1] * gro[0]
        gray_dist = (c0 * c0 + c1 * c1 + c2 * c2) * inv_n2
        resp = particle_response(gray_dist, cfg.kernel_degree)
        alpha = jnp.minimum(cfg.max_alpha, resp * density)
        dot_og = grdu[0] * gro[0] + grdu[1] * gro[1] + grdu[2] * gro[2]
        t = -dot_og * inv_n2
        accept = ((resp > cfg.hit_min_response) & (alpha > cfg.alpha_min)
                  & (dot_og < 0.0) & (t >= tmin) & (t <= tmax))
        alpha_eff = jnp.where(accept, alpha, 0.0)
        la = jnp.log1p(-alpha_eff)
        cums_excl = tile_math._exclusive_cumsum_g(la, cfg)
        t_before = t_in * jnp.exp(cums_excl)
        active = t_before > cfg.min_transmittance
        w = alpha_eff * t_before * active
        basis16 = rays[RAY_BASIS, :]
        out_rgb = []
        for cch in range(3):
            sh_c = chunk[:, CH_SH + 16 * cch:CH_SH + 16 * (cch + 1)]
            rad = jnp.dot(sh_c, basis16, preferred_element_type=f32) + 0.5
            rad = jnp.maximum(rad, 0.0)
            out_rgb.append(jnp.sum(w * rad, axis=0, keepdims=True))
        depth_contrib = jnp.sum(w * t, axis=0, keepdims=True)
        hits = jnp.sum((accept & active).astype(f32), axis=0, keepdims=True)
        la_active = jnp.where(active, la, 0.0)
        t_out = t_in * jnp.exp(jnp.sum(la_active, axis=0, keepdims=True))
        return t_out, jnp.concatenate(out_rgb, axis=0), depth_contrib, hits
    return core


def sync(x):
    _ = np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])
    return x


def bench(core, label):
    tile_math.chunk_core = core

    @jax.jit
    def run(chunks):
        def body(i, carry):
            chunks, s = carry
            b2 = binned._replace(chunks=chunks)
            acc = forward_tiles(b2, rays, cfg)
            out = acc[:, 0, :].sum()
            return (chunks + 0.0 * out, s + out)
        return jax.lax.fori_loop(0, K, body, (chunks, jnp.float32(0.0)))
    t0 = time.time()
    sync(run(binned.chunks))
    tc = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(run(binned.chunks))
        best = min(best, time.time() - t0)
    per = (best - 0.033) / K * 1e3
    print(f"{label:24s}: compile {tc:6.1f}s  {per:7.2f} ms/frame "
          f"({W*H/per*1e3/1e6:.1f} Mrays/s)", flush=True)
    tile_math.chunk_core = orig_core


bench(make_core("div", True, True), "v2 div hoist+materialize")
bench(make_core("rsqrt", True, True), "v2 rsqrt hoist+material")
bench(make_core("div", False), "v2 div per-ray-origin")
print("done", flush=True)
