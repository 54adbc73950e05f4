"""Sub-stage timing of bin_gaussians on the real chip (compile + run each).

Times the real helpers in isolation: tile-range pass, the pair sort,
searchsorted edges, the expansion gather, the rows64 gather, and the two
associative scans — to find where the ~84 ms binning frame cost goes.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import gvrt_tpu as g3
from gvrt_tpu.render import binning
from gvrt_tpu.render.tiled import _camera_mats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
W, H = 1920, 1088
cfg = g3.DEFAULT_CONFIG
model = g3.random_gaussians(jax.random.key(0), N, extent=1.0,
                            scale_range=(-7.0, -5.0))
model.means = model.means.at[:, 2].add(-3.0)
cam = g3.Camera.from_fovy(W, H, 50.0, np.eye(4))
act = model.activate()
w2c, proj = _camera_mats(cam)
cap, cap_pad = binning.plan_capacity(act, w2c, proj, W, H, cfg)
nt = (W // cfg.tile_size) * (H // cfg.tile_size)
print(f"cap {cap} cap_pad {cap_pad} tiles {nt}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    return out


def timeit(name, fn, reps=10):
    t0 = time.time()
    out = _sync(fn())
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = _sync(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:26s}: compile {tc:6.1f}s   run {dt * 1e3:8.2f} ms",
          flush=True)
    return out


# stage 1: per-gaussian tile ranges (N-sized elementwise)
tr_jit = jax.jit(lambda a: binning._tile_ranges(a, w2c, proj, W, H, cfg))
(tx0, ty0, tx1, ty1), valid, depth, (nx, ny), cs, r_s = timeit(
    "tile_ranges", lambda: tr_jit(act))

# synthetic capacity-sized pair arrays matching real distributions
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, nt << 20, size=cap, dtype=np.int64)
                  .astype(np.int32))
pair_g = jnp.asarray(rng.integers(0, N, size=cap, dtype=np.int64)
                     .astype(np.int32))
p_idx = jnp.arange(cap, dtype=jnp.int32)

sort3 = jax.jit(lambda k, g, p: jax.lax.sort((k, g, p), num_keys=1))
timeit("sort 3xcap", lambda: sort3(key, pair_g, p_idx))
sort2 = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1))
timeit("sort 2xcap", lambda: sort2(key, pair_g))

key_s = jnp.sort(key)
ss_jit = jax.jit(lambda ks: jnp.searchsorted(
    ks, jnp.arange(nt + 1, dtype=jnp.int32), side="left",
    method="scan_unrolled"))
timeit("searchsorted tiles", lambda: ss_jit(key_s))

# expansion gather: (N, 10) table -> (cap, 10)
tab = jnp.asarray(rng.standard_normal((N, 10), dtype=np.float32))
exp_jit = jax.jit(lambda t, g: t[g])
timeit("gather (cap,10)", lambda: exp_jit(tab, pair_g))

# rows64 gather: (N+1, 64) -> (cap_pad, 64)
rows = jnp.asarray(rng.standard_normal((N + 1, 64), dtype=np.float32))
pg_pad = jnp.asarray(rng.integers(0, N, size=cap_pad, dtype=np.int64)
                     .astype(np.int32))
g64_jit = jax.jit(lambda r, g: r[g])
timeit("gather (cap_pad,64)", lambda: g64_jit(rows, pg_pad))

# scatter of cap rows (padded slot placement)
dest = jnp.asarray(rng.permutation(cap_pad)[:cap].astype(np.int32))
sc_jit = jax.jit(lambda d, v: jnp.full((cap_pad,), N, jnp.int32)
                 .at[d].set(v, mode="drop"))
timeit("scatter cap int32", lambda: sc_jit(dest, pair_g))

# associative scans over capacity / chunks
asc_jit = jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x))
timeit("assoc_scan cap", lambda: asc_jit(pair_g))
nchunks = cap_pad // cfg.chunk_size
ch = jnp.asarray(rng.integers(0, nt, size=nchunks, dtype=np.int64)
                 .astype(np.int32))
timeit("assoc_scan chunks", lambda: asc_jit(ch))

cs_jit = jax.jit(lambda x: jnp.cumsum(x))
timeit("cumsum N", lambda: cs_jit(jnp.ones((N,), jnp.int32)))

# full bin for reference
bin_jit = jax.jit(lambda a: binning.bin_gaussians(a, w2c, proj, W, H, cfg,
                                                  cap, cap_pad))
timeit("bin (full)", lambda: bin_jit(act))
print("done", flush=True)
