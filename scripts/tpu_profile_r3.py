"""Round-3 stage profile: chained on-device timing of the split pipeline.

Times each stage of the topology/gather-split protocol (bench.py round 3) by
chaining K iterations inside one jit with a real data dependency (the axon
tunnel costs ~33 ms/dispatch; per-call timing is meaningless below that —
PROFILE.md section 0).  Uses the EXACT bench scene so numbers line up with
BENCH_r03.json.

Usage: python scripts/tpu_profile_r3.py [stage ...]
Stages: topo gather fwd bwd reduce act untile full fwdonly  (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.binning import (bin_topology, binned_scene,
                                     gather_chunks, tile_rays, untile)
from gvrt_tpu.render.pallas_forward import forward_tiles
from gvrt_tpu.render.pallas_vjp import _forward_call, _render_bwd
from gvrt_tpu.render.tiled import TiledRenderer, _camera_mats

import bench as benchmod

stages = set(sys.argv[1:]) or {"topo", "gather", "fwd", "bwd", "reduce",
                               "act", "untile", "full", "fwdonly"}
K = int(os.environ.get("GVRT_CHAIN", 10))
W, H = 1920, 1088
N = int(os.environ.get("GVRT_BENCH_GAUSSIANS", 300_000))
cfg = g3.DEFAULT_CONFIG

model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=benchmod.SCALE_RANGE)
model.means = model.means.at[:, 2].add(-3.0)
model = dataclasses.replace(
    model, opacity_logit=jax.random.uniform(
        jax.random.key(7), model.opacity_logit.shape,
        minval=benchmod.OPACITY_RANGE[0], maxval=benchmod.OPACITY_RANGE[1]))
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)

r = TiledRenderer(W, H, cfg)
cap, cap_pad = r.plan(model, [cam],
                      slack=float(os.environ.get("GVRT_BENCH_SLACK", 1.05)))
print(f"bench scene: cap {cap} cap_pad {cap_pad} "
      f"reduce_rows {r.capacity_reduce} "
      f"chunks {cap_pad // cfg.chunk_size}", flush=True)
rays = jax.device_put(tile_rays(cam, cfg))


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    return x


def timeit(name, fn, reps=3):
    t0 = time.time()
    sync(fn())
    tc = time.time() - t0
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        best = min(best, (time.time() - t0) / K)
    print(f"{name:22s}: compile {tc:6.1f}s   {best * 1e3:8.2f} ms/iter",
          flush=True)
    return best


def chain(body):
    """K-iteration fori_loop with a scalar data dependency through `eps`.

    Big device arrays MUST come in through *ops (jit arguments), never as
    closure constants: axon's remote compile POSTs the serialized graph,
    and a captured 470 MB chunk array overflows it (HTTP 413, measured)."""
    def run(x0, *ops):
        def step(i, carry):
            eps, acc = carry
            out = body(eps, *ops)
            return (0.0 * out + eps, acc + out)
        return jax.lax.fori_loop(0, K, step, (x0, 0.0))
    return jax.jit(run)


topo = jax.jit(lambda a: bin_topology(a, w2c, proj, W, H, cfg, cap,
                                      cap_pad,
                                      capacity_reduce=r.capacity_reduce))(act)
sync(topo)
chunks = None

if "topo" in stages:
    def topo_body(eps):
        a2 = act._replace(densities=act.densities + eps)
        t = bin_topology(a2, w2c, proj, W, H, cfg, cap, cap_pad,
                         capacity_reduce=r.capacity_reduce)
        return jnp.sum(t.num_pairs).astype(jnp.float32)
    run_topo = chain(topo_body)
    timeit("topology", lambda: run_topo(0.0))

if stages & {"gather", "fwd", "bwd", "reduce", "reduce_sub"}:
    chunks = jax.jit(lambda a: gather_chunks(a, topo, cfg))(act)
    sync(chunks)

if "gather" in stages:
    def gather_body(eps):
        a2 = act._replace(densities=act.densities + eps)
        ch = gather_chunks(a2, topo, cfg)
        return ch[0, 0, 12]
    run_gather = chain(gather_body)
    timeit("param gather", lambda: run_gather(0.0))

if "act" in stages:
    def act_body(eps):
        m2 = dataclasses.replace(model, means=model.means + eps)
        a2 = m2.activate()
        return a2.densities[0]
    run_act = chain(act_body)
    timeit("activate", lambda: run_act(0.0))

if "fwd" in stages:
    def fwd_body(eps, ch, ry):
        sc = binned_scene(ch + eps, topo)
        acc = forward_tiles(sc, ry, cfg)
        return acc[0, 0, 0]
    run_fwd = chain(fwd_body)
    timeit("fwd kernel", lambda: run_fwd(0.0, chunks, rays))

if "untile" in stages:
    acc0 = jax.jit(lambda ch: forward_tiles(binned_scene(ch, topo), rays,
                                            cfg))(chunks)
    sync(acc0)
    target = jnp.zeros((H, W, 3)) + 0.3

    def untile_body(eps, a0):
        img = untile(a0 + eps, W, H, cfg.tile_size)
        return jnp.mean((img[..., 0:3] - target) ** 2)
    run_untile = chain(untile_body)
    timeit("untile+loss", lambda: run_untile(0.0, acc0))

if "bwd" in stages:
    accres, tin = jax.jit(lambda ch: _forward_call(
        cfg, False, True, ch, rays, topo.chunk_tile))(chunks)
    sync(tin)
    bar_acc = jnp.ones_like(accres)

    def bwd_body(eps, ch, ry, ti):
        outs = _render_bwd(cfg, False, (ch + eps, ry, topo.chunk_tile,
                                        ti), bar_acc)
        return outs[0][0, 0, 12]
    run_fres = chain(
        lambda eps, ch, ry: _forward_call(cfg, False, True, ch + eps, ry,
                                          topo.chunk_tile)[1][0, 0])
    timeit("fwd(resid)", lambda: run_fres(0.0, chunks, rays))
    run_bwd = chain(bwd_body)
    timeit("bwd kernel", lambda: run_bwd(0.0, chunks, rays, tin))

if "reduce" in stages:
    from gvrt_tpu.render.param_grads import _gather_bwd
    res = (N + 1, topo.pair_gauss, topo.pair_pos,
           topo.gauss_offsets, topo.gauss_counts, topo.red)
    res_fb = res[:5] + (None,)
    bar = jnp.ones_like(chunks)

    def red_body(eps, b):
        g = _gather_bwd(cfg.chunk_size, res, b + eps)
        return g[0][0, 0]
    run_red = chain(red_body)
    timeit("param-grad reduce", lambda: run_red(0.0, bar))

    def red_fb_body(eps, b):
        g = _gather_bwd(cfg.chunk_size, res_fb, b + eps)
        return g[0][0, 0]
    run_red_fb = chain(red_fb_body)
    timeit("reduce (XLA fallback)", lambda: run_red_fb(0.0, bar))

if "reduce_sub" in stages:
    from gvrt_tpu.render.param_grads import blocked_cumsum
    bar = jnp.ones_like(chunks)
    bar_flat0 = bar.reshape(-1, bar.shape[2])
    pair_pos0 = topo.pair_pos
    sync(pair_pos0)
    bar_pre0 = jax.jit(
        lambda bf, pp: jnp.concatenate(
            [bf, jnp.zeros((1, bf.shape[1]), bf.dtype)])[pp])(
        bar_flat0, pair_pos0)
    sync(bar_pre0)
    cum_c = jax.jit(blocked_cumsum)(bar_pre0)
    sync(cum_c)

    run_g = chain(lambda eps, bf, pp: jnp.concatenate(
        [bf + eps, jnp.zeros((1, bf.shape[1]), bf.dtype)])[pp][0, 0])
    timeit("reduce: row gather", lambda: run_g(0.0, bar_flat0, pair_pos0))
    run_c = chain(lambda eps, bp: blocked_cumsum(bp + eps)[-1, 0])
    timeit("reduce: cumsum", lambda: run_c(0.0, bar_pre0))

    def diff_body(eps, cm):
        cum0 = jnp.concatenate([jnp.zeros((1, cm.shape[1]), cm.dtype),
                                cm + eps])
        lo = jnp.clip(topo.gauss_offsets, 0, cm.shape[0])
        hi = jnp.clip(topo.gauss_offsets + topo.gauss_counts, 0, cm.shape[0])
        return (cum0[hi] - cum0[lo])[0, 0]
    run_d = chain(diff_body)
    timeit("reduce: seg diff", lambda: run_d(0.0, cum_c))

if "full" in stages:
    target = jnp.zeros((H, W, 3)) + 0.3

    def loss_fn(m, topo):
        a = m.activate()
        sc = binned_scene(gather_chunks(a, topo, cfg), topo)
        acc = forward_tiles(sc, rays, cfg)
        img = untile(acc, W, H, cfg.tile_size)
        return jnp.mean((img[..., 0:3] - target) ** 2)

    @jax.jit
    def train_k(m):
        t = bin_topology(m.activate(), w2c, proj, W, H, cfg, cap, cap_pad)

        def body(i, carry):
            m, acc = carry
            val, grads = jax.value_and_grad(loss_fn)(m, t)
            m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
            return (m, acc + val)
        return jax.lax.fori_loop(0, K, body, (m, 0.0))

    t0 = time.time()
    sync(train_k(model))
    tc = time.time() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        sync(train_k(model))
        best = min(best, (time.time() - t0) / K)
    print(f"{'full train step':22s}: compile {tc:6.1f}s   "
          f"{best * 1e3:8.2f} ms/iter  ({W * H / best / 1e6:.1f} Mrays/s)",
          flush=True)

if "fwdonly" in stages:
    target = jnp.zeros((H, W, 3)) + 0.3

    @jax.jit
    def fwd_k(m):
        t = bin_topology(m.activate(), w2c, proj, W, H, cfg, cap, cap_pad)
        sc = binned_scene(gather_chunks(m.activate(), t, cfg), t)

        def body(i, carry):
            rays_i, acc = carry
            a = forward_tiles(sc, rays_i, cfg)
            img = untile(a, W, H, cfg.tile_size)
            val = jnp.mean((img[..., 0:3] - target) ** 2)
            return (rays_i + 0.0 * val, acc + val)
        return jax.lax.fori_loop(0, K, body, (rays, 0.0))

    t0 = time.time()
    sync(fwd_k(model))
    tc = time.time() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        sync(fwd_k(model))
        best = min(best, (time.time() - t0) / K)
    print(f"{'fwd-only replay':22s}: compile {tc:6.1f}s   "
          f"{best * 1e3:8.2f} ms/iter  ({W * H / best / 1e6:.1f} Mrays/s)",
          flush=True)

print("done", flush=True)
