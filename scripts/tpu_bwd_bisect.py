"""Bisect the backward abort: trivial body vs vjp body under same specs."""
import sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.pallas_vjp import TIN_PACK, _forward_call
from gvrt_tpu.render.tile_math import ACC_T, chunk_core
from gvrt_tpu.render.tiled import _camera_mats

cfg = g3.DEFAULT_CONFIG.replace(tile_size=8, chunk_size=128)
model = g3.random_gaussians(jax.random.key(0), 256, extent=0.7)
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(16, 16, 60.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, 16, 16, cfg)
b = binning.bin_gaussians(act, w2c, proj, 16, 16, cfg, cap, cap_pad)
rays = binning.tile_rays(cam, cfg)
acc, tin = jax.jit(lambda *a: _forward_call(cfg, False, True, *a))(
    b.geom, b.sh_r, b.sh_g, b.sh_b, rays, b.chunk_tile, b.chunk_first)
jax.block_until_ready(tin)
print("fwd ok", flush=True)

num_chunks, _, g = b.geom.shape
num_tiles, r, _ = rays.shape
chunk_last = jnp.concatenate([
    (b.chunk_tile[1:] != b.chunk_tile[:-1]).astype(jnp.int32),
    jnp.ones((1,), jnp.int32)])
bar_acc = jnp.ones((num_tiles + 1, r, 8), jnp.float32)

MODE = sys.argv[1] if len(sys.argv) > 1 else "trivial"

def bwd_kernel(ct_ref, cl_ref, rays_ref, geom_ref, shr_ref, shg_ref, shb_ref,
               tin_ref, bar_acc_ref, bar_t_ref, bar_geom_ref, bar_shr_ref,
               bar_shg_ref, bar_shb_ref):
    c = pl.program_id(0)
    rc = num_chunks - 1 - c
    if MODE == "trivial":
        bar_t_ref[0, 0, :] = bar_acc_ref[0, :, ACC_T]
        bar_geom_ref[0] = geom_ref[0] * 2.0
        bar_shr_ref[0] = shr_ref[0]
        bar_shg_ref[0] = shg_ref[0]
        bar_shb_ref[0] = shb_ref[0]
        return

    @pl.when(cl_ref[rc] == 1)
    def _():
        bar_t_ref[0, 0, :] = bar_acc_ref[0, :, ACC_T]

    t_in = tin_ref[rc % TIN_PACK, :][:, None]
    alive = jnp.max(t_in) > cfg.min_transmittance

    if MODE == "novjp":
        t_out, rgb_c, depth_c, hits = chunk_core(
            rays_ref[0], geom_ref[0], shr_ref[0], shg_ref[0], shb_ref[0],
            t_in, cfg)
        bar_geom_ref[0] = geom_ref[0] * t_out[0, 0]
        bar_shr_ref[0] = shr_ref[0] * rgb_c[0, 0]
        bar_shg_ref[0] = shg_ref[0]
        bar_shb_ref[0] = shb_ref[0]
        bar_t_ref[0, 0, :] = t_out[:, 0]
        return

    @pl.when(alive)
    def _():
        def f(geom, sh_r, sh_g, sh_b, t_in):
            return chunk_core(rays_ref[0], geom, sh_r, sh_g, sh_b, t_in, cfg)
        _, vjp = jax.vjp(f, geom_ref[0], shr_ref[0], shg_ref[0], shb_ref[0],
                         t_in)
        cot = (bar_t_ref[0, 0, :][:, None], bar_acc_ref[0, :, 0:3],
               bar_acc_ref[0, :, 3:4], jnp.zeros((r, 1), jnp.float32))
        bg, bsr, bsg, bsb, bt = vjp(cot)
        bar_geom_ref[0] = bg
        bar_shr_ref[0] = bsr
        bar_shg_ref[0] = bsg
        bar_shb_ref[0] = bsb
        bar_t_ref[0, 0, :] = bt[:, 0]

    @pl.when(jnp.logical_not(alive))
    def _():
        bar_geom_ref[0] = jnp.zeros_like(bar_geom_ref[0])
        bar_shr_ref[0] = jnp.zeros_like(bar_shr_ref[0])
        bar_shg_ref[0] = jnp.zeros_like(bar_shg_ref[0])
        bar_shb_ref[0] = jnp.zeros_like(bar_shb_ref[0])

rev = lambda c: num_chunks - 1 - c
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2,
    grid=(num_chunks,),
    in_specs=[
        pl.BlockSpec((1, r, 8), lambda c, ct, cl: (ct[rev(c)], 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((TIN_PACK, r), lambda c, ct, cl: (rev(c) // TIN_PACK, 0)),
        pl.BlockSpec((1, r, 8), lambda c, ct, cl: (ct[rev(c)], 0, 0)),
    ],
    out_specs=(
        pl.BlockSpec((1, 8, r), lambda c, ct, cl: (ct[rev(c)], 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
        pl.BlockSpec((1, 16, g), lambda c, ct, cl: (rev(c), 0, 0)),
    ),
)
out = pl.pallas_call(
    bwd_kernel,
    grid_spec=grid_spec,
    out_shape=(
        jax.ShapeDtypeStruct((num_tiles + 1, 8, r), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, 16, g), jnp.float32),
    ),
)(b.chunk_tile, chunk_last, rays, b.geom, b.sh_r, b.sh_g, b.sh_b, tin,
  bar_acc)
jax.block_until_ready(out)
print(MODE, "backward OK:", float(out[1].sum()), flush=True)
