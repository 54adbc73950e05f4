"""BASELINE config[2]: garden-scale scene (5M Gaussians) at 1080p, one chip.

Runs the banded bounded-memory pipeline (render/banded.py) forward and
forward+backward, amortized over chained frames, and reports rays/s, pair
counts, band capacities, peak HBM (when the runtime exposes memory_stats),
and overflow.  Reference motivation: SplitBLAS exists exactly because
monolithic acceleration structures stop scaling (SplitBLAS.cpp:678-752).

Usage: python scripts/config2_scale.py [n_gauss] [n_bands] [W H]
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render.banded import (render_image_banded,
                                    plan_capacity_banded, resolve_bands)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
BANDS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
H = int(sys.argv[4]) if len(sys.argv) > 4 else 1088
K = int(os.environ.get("GVRT_CHAIN", 4))
#: span banding (round-5): contiguous tile-row bands over a y-sorted model
#: -> per-band live-id windows; GVRT_SPAN=0 reverts to round-robin banding
SPAN = bool(int(os.environ.get("GVRT_SPAN", "1")))
MODE = "contig" if SPAN else "stride"
#: pair-balanced variable bands (round-5): rows at the survivor-pair
#: quantiles, per-band capacities, unrolled band loop — applies to the
#: BOUND + Trainer sections (the headline numbers); the unbound probe
#: stays uniform for continuity with earlier rounds
BAL = SPAN and bool(int(os.environ.get("GVRT_BALANCE", "0")))
#: skip the unbound probe/train_k/fwd_k (several minutes of compiles) for
#: quick bound-path A/B runs
SKIP_UNBOUND = bool(int(os.environ.get("GVRT_SKIP_UNBOUND", "0")))

cfg = g3.DEFAULT_CONFIG
BANDS = resolve_bands(H, BANDS, cfg)
print(f"bands resolved to {BANDS} (tile rows {H // cfg.tile_size})", flush=True)
# garden-like: big scene extent, sub-pixel to few-pixel gaussians, low
# trained-scene-like opacities (the r4b >= 15 hits/ray honesty bar:
# measured 20.46 mean hits/ray at 5M with these ranges, SCALE_r04b.md)
model = g3.random_gaussians(jax.random.key(0), N, extent=2.0,
                            scale_range=(-7.3, -5.3))
model.opacity_logit = jax.random.uniform(jax.random.key(7), (N,),
                                         minval=-3.5, maxval=0.5)
model.means = model.means.at[:, 2].add(-4.0)
cam = g3.Camera.from_fovy(W, H, 60.0, np.eye(4))
if SPAN:
    t0 = time.time()
    model = model.sorted_for_camera(cam, cfg)   # one-time scene prep
    print(f"y-sort (span banding scene prep): {time.time()-t0:.1f}s",
          flush=True)

t0 = time.time()
cap, cap_pad, cap_live, cap_r, cap_range = plan_capacity_banded(
    model, cam, BANDS, cfg, with_reduce=True, mode=MODE)
print(f"plan: {time.time()-t0:.1f}s  band capacity {(cap, cap_pad)} "
      f"compact reduce (live {cap_live}, rows {cap_r}, id-window {cap_range} "
      f"of {N}) (pairs/band ~{cap}, x{BANDS} bands, mode {MODE})",
      flush=True)
print(f"per-band chunk array: {cap_pad * 64 * 4 / 1e9:.2f} GB "
      f"(unbanded would be ~{BANDS * cap_pad * 64 * 4 / 1e9:.1f} GB "
      f"fwd + the same again for backward cotangents)", flush=True)

target = jnp.zeros((H, W, 3)) + 0.3


def loss(m):
    out = render_image_banded(m, cam, BANDS, cfg,
                              capacity=(cap, cap_pad, cap_live, cap_r,
                                        cap_range), span=SPAN)
    return jnp.mean((out["rgb"] - target) ** 2), out


def sync(x):
    _ = np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])
    return x


@jax.jit
def probe(m):
    (val, out), grads = jax.value_and_grad(loss, has_aux=True)(m)
    return (val, jnp.mean(out["hit_count"]), out["overflow"],
            jnp.linalg.norm(grads.means))


hits, ovf = -1.0, 0.0
best = best_f = float("nan")
if not SKIP_UNBOUND:
    t0 = time.time()
    val, hits, ovf, gnorm = map(float, probe(model))
    print(f"compile+first fwd+bwd: {time.time()-t0:.1f}s  loss {val:.4f} "
          f"mean hits/ray {hits:.2f}  overflow {ovf:.0f}  "
          f"|g_means| {gnorm:.2e}", flush=True)
    assert np.isfinite(val) and gnorm > 0
dev = jax.local_devices()[0]
stats = getattr(dev, "memory_stats", lambda: None)()
if stats:
    print(f"peak HBM: {stats.get('peak_bytes_in_use', 0)/1e9:.2f} GB "
          f"(limit {stats.get('bytes_limit', 0)/1e9:.1f} GB)", flush=True)


@jax.jit
def train_k(m):
    def body(i, carry):
        m, acc = carry
        (val, _), grads = jax.value_and_grad(loss, has_aux=True)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return (m, acc + val)
    return jax.lax.fori_loop(0, K, body, (m, 0.0))


if not SKIP_UNBOUND:
    sync(train_k(model))
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        sync(train_k(model))
        best = min(best, (time.time() - t0) / K)
    print(f"fwd+bwd: {best*1e3:.1f} ms/frame  "
          f"({W*H/best/1e6:.1f} Mrays/s)", flush=True)

import dataclasses


@jax.jit
def fwd_k(m):
    def body(i, carry):
        m, acc = carry
        val, _ = loss(m)
        m = dataclasses.replace(m, means=m.means + 0.0 * val)
        return (m, acc + val)
    return jax.lax.fori_loop(0, K, body, (m, 0.0))


if not SKIP_UNBOUND:
    sync(fwd_k(model))
    best_f = 1e30
    for _ in range(2):
        t0 = time.time()
        sync(fwd_k(model))
        best_f = min(best_f, (time.time() - t0) / K)
    print(f"fwd-only: {best_f*1e3:.1f} ms/frame  "
          f"({W*H/best_f/1e6:.1f} Mrays/s)", flush=True)

# ---- topology-held protocol (round-4): bind per-band topologies once,
# render/train against them (the reference's AS-build-once shape; refresh
# every K steps in training exactly like the flagship bench) ----
from gvrt_tpu.render.banded import BandedRenderer, _render_banded_bound

# best measured round-4 config (SCALE_r04b.md): alignment-free compact
# reduce + the "gather" checkpoint policy (saves each band's gathered
# parameter rows, rematerializes only the kernel forward)
r = BandedRenderer(W, H, BANDS, cfg,
                   capacity=None if BAL else (cap, cap_pad),
                   remat="gather", span=SPAN, balance=BAL)
if BAL:
    t0 = time.time()
    r.plan(model, cam)
    print(f"balanced plan: {time.time()-t0:.1f}s  row split {r.band_specs} "
          f"per-band caps {r.band_caps}", flush=True)
else:
    r.capacity_live, r.capacity_reduce = cap_live, cap_r
    r.capacity_range = cap_range
t0 = time.time()
topos = r.bind(model, cam)
sync(topos[0].chunk_tile if BAL else topos.chunk_tile)
bind_s = time.time() - t0
print(f"bind (all {BANDS} bands' topologies): {bind_s:.1f}s", flush=True)
rays_bands = r._bound[1]


# NB: topologies/ray bands are ~0.5 GB of device arrays — they MUST be jit
# ARGUMENTS, not closure constants: axon's remote compile POSTs the graph
# and big captured constants break the transport (broken pipe, measured)
@jax.jit
def fwd_bound_k(m, topos, rays_bands):
    def body(i, carry):
        m, acc = carry
        img, _ = _render_banded_bound(m, topos, rays_bands, W, H,
                                      cfg, r.impl, mode=MODE)
        val = jnp.mean((img[..., 0:3] - target) ** 2)
        m = dataclasses.replace(m, means=m.means + 0.0 * val)
        return (m, acc + val)
    return jax.lax.fori_loop(0, K, body, (m, 0.0))


sync(fwd_bound_k(model, topos, rays_bands))
best_fb = 1e30
for _ in range(2):
    t0 = time.time()
    sync(fwd_bound_k(model, topos, rays_bands))
    best_fb = min(best_fb, (time.time() - t0) / K)
print(f"fwd-only (topology held): {best_fb*1e3:.1f} ms/frame  "
      f"({W*H/best_fb/1e6:.1f} Mrays/s)", flush=True)


@jax.jit
def train_bound_k(m, topos, rays_bands):
    def loss_b(m):
        img, _ = _render_banded_bound(m, topos, rays_bands, W, H,
                                      cfg, r.impl, mode=MODE)
        return jnp.mean((img[..., 0:3] - target) ** 2)

    def body(i, carry):
        m, acc = carry
        val, grads = jax.value_and_grad(loss_b)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return (m, acc + val)
    return jax.lax.fori_loop(0, K, body, (m, 0.0))


sync(train_bound_k(model, topos, rays_bands))
best_tb = 1e30
for _ in range(2):
    t0 = time.time()
    sync(train_bound_k(model, topos, rays_bands))
    best_tb = min(best_tb, (time.time() - t0) / K)
print(f"fwd+bwd (topology held): {best_tb*1e3:.1f} ms/frame  "
      f"({W*H/best_tb/1e6:.1f} Mrays/s)  "
      f"[+ bind {bind_s*1e3:.0f} ms per refresh window]", flush=True)

# Trainer-driven banded training step (r2 verdict: "Trainer only supports
# the unbanded path — config[2]-scale training can't use the Trainer").
# Free this script's copy of the held topologies first: the Trainer binds
# its own, and at 5M two copies + Adam moments (2x every param group,
# ~2.6 GB) exceeded HBM (ResourceExhausted, first 052 run).
import gc
r._bound = None
del topos, rays_bands
gc.collect()
from gvrt_tpu.train import TrainConfig, Trainer

tc = TrainConfig(total_steps=10, refresh_every=10,
                 optimizer="adafactor", banded_remat="gather",
                 span_bands=SPAN, balance_bands=BAL)
trainer = Trainer(W, H, cfg, tc,
                  capacity=(0, 0) if BAL else (cap, cap_pad),
                  n_bands=BANDS)
if not BAL:
    trainer._banded.capacity_live = cap_live
    trainer._banded.capacity_reduce = cap_r
    trainer._banded.capacity_range = cap_range
state = trainer.init(model)
t0 = time.time()
state, tloss = trainer.step(state, cam, target)
tloss = float(tloss)
print(f"Trainer banded step (incl bind+compile): {time.time()-t0:.1f}s  "
      f"loss {tloss:.5f}", flush=True)
t0 = time.time()
state, tloss2 = trainer.step(state, cam, target)
tloss2 = float(tloss2)
print(f"Trainer banded step (warm, topology held): "
      f"{(time.time()-t0)*1e3:.0f} ms  loss {tloss2:.5f}", flush=True)
assert np.isfinite(tloss2)

print(json.dumps({
    "config": 2, "n_gauss": N, "bands": BANDS, "res": [W, H],
    "span": SPAN, "balance": BAL, "cap_range": cap_range,
    "band_specs": list(r.band_specs) if BAL else None,
    "band_caps": list(r.band_caps) if BAL else None,
    "band_capacity": [cap, cap_pad],
    "fwd_bwd_ms": None if math.isnan(best) else best * 1e3,
    "fwd_ms": None if math.isnan(best_f) else best_f * 1e3,
    "fwd_bwd_bound_ms": best_tb * 1e3, "fwd_bound_ms": best_fb * 1e3,
    "bind_ms": bind_s * 1e3,
    "rays_per_s_fwd_bwd": None if math.isnan(best) else W * H / best,
    "rays_per_s_fwd_bwd_bound": W * H / best_tb,
    "mean_hits": hits, "overflow": ovf,
    "trainer_banded_loss": tloss2,
    "peak_hbm_gb": (stats or {}).get("peak_bytes_in_use", 0) / 1e9,
}), flush=True)
